"""Compare bilinear-x2 implementations on TPU at decoder scales.

Forms:
  shuffle — pad/slice/stack/reshape (current jax_resize2x)
  matmul  — dense (2n, n) interpolation matrix per axis via einsum (MXU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 64


def timeit(fn, x):
    @jax.jit
    def run(x):
        def body(i, carry):
            x, acc = carry
            out = fn(x)
            m = out.astype(jnp.float32).mean()
            return (x + (m * 1e-12).astype(x.dtype), acc + m)
        _, acc = jax.lax.fori_loop(0, REPS, body, (x, jnp.float32(0)))
        return acc
    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    return (time.perf_counter() - t0) / REPS


def up2x_matrix(n):
    m = np.zeros((2 * n, n), np.float32)
    for i in range(n):
        m[2 * i, max(i - 1, 0)] += 0.25
        m[2 * i, i] += 0.75
        m[2 * i + 1, i] += 0.75
        m[2 * i + 1, min(i + 1, n - 1)] += 0.25
    return m


def resize_mm(x):
    b, h, w, c = x.shape
    uh = jnp.asarray(up2x_matrix(h), x.dtype)
    uw = jnp.asarray(up2x_matrix(w), x.dtype)
    y = jnp.einsum("Hh,bhwc->bHwc", uh, x)
    return jnp.einsum("Ww,bhwc->bhWc", uw, y)


def main():
    from rcvpose_tpu.models.fcnresnet import jax_resize2x

    print("baseline floor (elemwise):",
          f"{timeit(lambda t: t * 1.0001, jnp.zeros((1, 8, 8, 8), jnp.bfloat16)) * 1e3:.3f} ms")
    for (h, w, c) in [(15, 20, 1024), (30, 40, 512), (60, 80, 256),
                      (120, 160, 128), (240, 320, 64)]:
        x = jnp.zeros((1, h, w, c), jnp.bfloat16)
        t_sh = timeit(jax_resize2x, x)
        t_mm = timeit(resize_mm, x)
        # correctness
        xr = jnp.asarray(np.random.default_rng(0).normal(
            size=(1, h, w, c)).astype(np.float32))
        a = np.asarray(jax_resize2x(xr))
        b = np.asarray(resize_mm(xr))
        err = np.abs(a - b).max()
        print(f"{h}x{w}x{c}: shuffle {t_sh*1e3:7.3f} ms  "
              f"matmul {t_mm*1e3:7.3f} ms  max|diff| {err:.2e}")


if __name__ == "__main__":
    main()
