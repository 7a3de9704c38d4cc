"""Per-stage dissection of DenseFCNResNet152 forward cost at 480x640 bf16.

Times each encoder stage and each decoder conv/upsample standalone with
in-graph fori_loop chaining (amortizes dispatch/tunnel latency), and prints
achieved FLOP/s per stage so the roofline gap is attributable.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

REPS = 64


def timeit(fn, *args):
    """Device-true per-call seconds: REPS chained in-graph invocations.

    The last arg must be the tensor input; each iteration perturbs it by
    out.mean()*1e-12 so the body has a real carry dependence — without it
    XLA hoists the loop-invariant body and the 'loop' measures only the
    ~30 ms axon-tunnel dispatch round trip divided by REPS."""
    @jax.jit
    def run(*a):
        x0 = a[-1]

        def body(i, carry):
            x, acc = carry
            out = fn(*a[:-1], x)
            m = out.astype(jnp.float32).mean()
            return (x + (m * 1e-12).astype(x.dtype), acc + m)
        _, acc = jax.lax.fori_loop(0, REPS, body, (x0, jnp.float32(0)))
        return acc
    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / REPS


def conv_stage(name, h, w, cin, cout, ksize=3):
    x = jnp.zeros((1, h, w, cin), jnp.bfloat16)
    conv = nn.Conv(cout, (ksize, ksize), padding=ksize // 2,
                   dtype=jnp.bfloat16)
    v = conv.init(jax.random.PRNGKey(0), x)
    # weights as jit args, NOT closure constants: the axon remote-compile
    # service rejects HLO with large inline constants (HTTP 413)
    dt = timeit(lambda v, x: nn.relu(conv.apply(v, x)), v, x)
    flops = 2 * h * w * cin * cout * ksize * ksize
    print(f"{name:14s} ({h}x{w}x{cin}->{cout}): {dt*1e3:7.3f} ms  "
          f"{flops/dt/1e12:6.2f} TFLOP/s")
    return dt


def main():
    from rcvpose_tpu.config import Config
    from rcvpose_tpu import train as train_mod
    from rcvpose_tpu.models.fcnresnet import _Encoder, jax_resize2x

    cfg = Config(compute_dtype="bfloat16")
    model = train_mod.build_model(cfg)
    x = jnp.zeros((1, 480, 640, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), False)
    dt = timeit(lambda v, im: model.apply(v, im, False)[1].mean(),
                variables, x)
    print(f"full fwd: {dt*1e3:.2f} ms")

    enc = _Encoder(dtype=jnp.bfloat16)
    ev = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    dt = timeit(
        lambda v, im: sum(o.astype(jnp.float32).mean()
                          for o in enc.apply(v, im, False)), ev, x)
    print(f"encoder:  {dt*1e3:.2f} ms")

    # isolated representative convs (dominant encoder stage = H/16, 36 blocks)
    print("-- encoder representatives --")
    conv_stage("stem 7x7", 240, 320, 3, 64, 7)
    conv_stage("s2 3x3 conv2", 60, 80, 128, 128)
    conv_stage("s3 3x3 conv2", 30, 40, 256, 256)   # x36 blocks
    conv_stage("s3 1x1 in", 30, 40, 1024, 256, 1)
    conv_stage("s3 1x1 out", 30, 40, 256, 1024, 1)
    conv_stage("s4 3x3 conv2", 15, 20, 512, 512)

    print("-- decoder convs --")
    conv_stage("conv6", 15, 20, 2048, 1024)
    conv_stage("conv_up5", 15, 20, 3072, 1024)
    conv_stage("conv_up4", 30, 40, 1536, 512)
    conv_stage("conv_up3", 60, 80, 768, 256)
    conv_stage("conv_up2", 120, 160, 384, 128)
    conv_stage("conv_up1", 240, 320, 192, 64)
    conv_stage("conv7", 480, 640, 64, 32)
    conv_stage("conv8", 480, 640, 32, 2, 1)

    print("-- upsamples --")
    for (h, w, c) in [(15, 20, 1024), (30, 40, 512), (60, 80, 256),
                      (120, 160, 128), (240, 320, 64)]:
        y = jnp.zeros((1, h, w, c), jnp.bfloat16)
        dt = timeit(lambda t: jax_resize2x(t).astype(jnp.float32).mean(), y)
        gb = 2 * (h * w * c + 4 * h * w * c) / 1e9
        print(f"resize2x {h}x{w}x{c}: {dt*1e3:7.3f} ms  "
              f"{gb/dt:6.1f} GB/s")

    # batchnorm+relu fusions at full res
    y = jnp.zeros((1, 480, 640, 32), jnp.bfloat16)
    dt = timeit(lambda t: nn.relu(t * 1.1 + 0.3).astype(jnp.float32).mean(), y)
    print(f"elemwise 480x640x32: {dt*1e3:.3f} ms")


if __name__ == "__main__":
    main()
