"""Dissect DenseFCNResNet152 forward cost on the TPU (in-graph loops)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from rcvpose_tpu.config import Config
from rcvpose_tpu import train as train_mod

REPS = 8


def chain_loop(fn, x0):
    """Run fn REPS times inside one jit, chaining a scalar dependency."""
    @jax.jit
    def run(x):
        def body(i, carry):
            x, acc = carry
            out = fn(x)
            s = jnp.mean(out) * 0
            return (x + s, acc + jnp.mean(out))
        _, acc = jax.lax.fori_loop(0, REPS, body, (x, jnp.float32(0)))
        return acc
    # warm
    float(run(x0))
    t0 = time.perf_counter()
    float(run(x0))
    return (time.perf_counter() - t0) / REPS


def main():
    cfg = Config(compute_dtype="bfloat16")
    model = train_mod.build_model(cfg)
    x = jnp.zeros((1, 480, 640, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), False)

    dt = chain_loop(
        lambda im: model.apply(variables, im, False)[1].mean()[None, None,
                                                               None, None]
        * jnp.ones((1, 1, 1, 1)),
        x)
    print(f"full net fwd: {dt*1e3:.2f} ms")

    # encoder only
    from rcvpose_tpu.models.fcnresnet import _Encoder
    enc = _Encoder(dtype=jnp.bfloat16)
    ev = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)

    def enc_fn(im):
        outs = enc.apply(ev, im, False)
        return sum(o.astype(jnp.float32).mean() for o in outs)[None, None,
                                                               None, None] \
            * jnp.ones((1, 1, 1, 1))
    dt = chain_loop(enc_fn, x)
    print(f"encoder only: {dt*1e3:.2f} ms")

    # bilinear x2 resize chain at decoder sizes
    for shape in [(1, 15, 20, 1024), (1, 30, 40, 512), (1, 60, 80, 256),
                  (1, 120, 160, 128), (1, 240, 320, 64)]:
        y = jnp.zeros(shape, jnp.bfloat16)
        def res_fn(t):
            b, h, w, c = t.shape
            return jax.image.resize(t, (b, h * 2, w * 2, c), "bilinear")
        @jax.jit
        def run(t):
            def body(i, carry):
                t, acc = carry
                o = res_fn(t)
                return (t, acc + o.astype(jnp.float32).mean())
            _, acc = jax.lax.fori_loop(0, REPS, body, (t, jnp.float32(0)))
            return acc
        float(run(y))
        t0 = time.perf_counter()
        float(run(y))
        dt = (time.perf_counter() - t0) / REPS
        print(f"resize2x {shape}: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
