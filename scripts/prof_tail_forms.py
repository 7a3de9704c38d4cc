"""Alternative formulations for the full-res decoder tail convs on TPU.

The device trace shows conv7 (480x640, 64->32, 3x3) at 2.9 ms (~4 TFLOP/s),
conv8 (1x1, 32->2) at 0.8 ms, conv_up1 (240x320, 192->64) at 1.3 ms —
shallow-channel wide-spatial convs that underutilize the MXU. Candidates:

  conv     — nn.Conv baseline
  matmul9  — 3x3 conv as 9 shifted (HW, Cin)x(Cin, Cout) matmuls, accumulated
  s2d      — space-to-depth: compute at H/2 x W/2 with 4x channels via an
             equivalent 2x2 conv on the phase layout (exact same math)
  dot1x1   — 1x1 conv as one (HW, Cin) x (Cin, Cout) matmul
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
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best


def conv3x3_matmul9(w, x):
    """w: (3, 3, Cin, Cout); x: (B, H, W, Cin), pad=1, NHWC."""
    b, h, wd, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (b, h, wd, cin))
            contrib = jnp.einsum("bhwc,cd->bhwd", xs, w[dy, dx])
            out = contrib if out is None else out + contrib
    return out


def space_to_depth(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x):
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


def conv3x3_s2d(k33, x):
    """Equivalent conv on the s2d layout: kernel (3,3,4Cin,4Cout) built by
    build_s2d_kernel from the full-res 3x3 kernel (block offsets -1..1)."""
    xs = space_to_depth(x)
    y = jax.lax.conv_general_dilated(
        xs, k33, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return depth_to_space(y)


def build_s2d_kernel(w):
    """Numeric construction: (3,3,Cin,Cout) -> (3,3,4Cin,4Cout) such that
    depth_to_space(conv(s2d(x), k)) == conv3x3(x) exactly."""
    cin, cout = w.shape[2], w.shape[3]
    k = np.zeros((3, 3, 4 * cin, 4 * cout), np.float32)
    for a in range(2):
        for b in range(2):
            po = a * 2 + b
            for ty in range(-1, 2):
                for tx in range(-1, 2):
                    sy = a + ty
                    sx = b + tx
                    qy, ry = sy // 2, sy % 2
                    qx, rx = sx // 2, sx % 2
                    pi = ry * 2 + rx
                    k[qy + 1, qx + 1,
                      pi * cin:(pi + 1) * cin,
                      po * cout:(po + 1) * cout] += w[ty + 1, tx + 1]
    return k


def main():
    rng = np.random.default_rng(0)

    for (h, w, cin, cout, tag) in [(480, 640, 64, 32, "conv7"),
                                   (240, 320, 192, 64, "conv_up1")]:
        x = jnp.asarray(rng.normal(size=(1, h, w, cin)), jnp.bfloat16)
        wt = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1,
                         jnp.bfloat16)

        def conv_ref(wt, x):
            return jax.lax.conv_general_dilated(
                x, wt, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        t0 = timeit(conv_ref, wt, x)

        t1 = timeit(conv3x3_matmul9, wt, x)

        k_s2d = jnp.asarray(build_s2d_kernel(np.asarray(wt, np.float32)),
                            jnp.bfloat16)
        t2 = timeit(conv3x3_s2d, k_s2d, x)

        # exactness of the s2d form (f32)
        xf = jnp.asarray(rng.normal(size=(1, 32, 32, cin)), jnp.float32)
        wf = jnp.asarray(rng.normal(size=(3, 3, cin, cout)), jnp.float32)
        ref = conv_ref(wf, xf)
        got = conv3x3_s2d(jnp.asarray(build_s2d_kernel(np.asarray(wf)),
                                      jnp.float32), xf)
        err = float(jnp.abs(ref - got).max())
        flops = 2 * h * w * cin * cout * 9
        print(f"{tag} {h}x{w}x{cin}->{cout}: conv {t0*1e3:6.3f} ms "
              f"({flops/t0/1e12:5.1f} TF/s)  matmul9 {t1*1e3:6.3f} ms  "
              f"s2d {t2*1e3:6.3f} ms ({flops/t2/1e12:5.1f} TF/s)  "
              f"s2d_err {err:.2e}")

    # conv8: 1x1 32->2 at 480x640
    x = jnp.asarray(rng.normal(size=(1, 480, 640, 32)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(1, 1, 32, 2)) * 0.1, jnp.bfloat16)

    def conv_ref1(w1, x):
        return jax.lax.conv_general_dilated(
            x, w1, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def dot1x1(w1, x):
        b, h, wd, c = x.shape
        y = x.reshape(-1, c) @ w1[0, 0]
        return y.reshape(b, h, wd, -1)

    def dot1x1_pad8(w1, x):
        b, h, wd, c = x.shape
        wp = jnp.pad(w1[0, 0], ((0, 0), (0, 6)))
        y = x.reshape(-1, c) @ wp
        return y.reshape(b, h, wd, -1)

    print(f"conv8 1x1 32->2: conv {timeit(conv_ref1, w1, x)*1e3:6.3f} ms  "
          f"dot {timeit(dot1x1, w1, x)*1e3:6.3f} ms  "
          f"dot_pad8 {timeit(dot1x1_pad8, w1, x)*1e3:6.3f} ms")


if __name__ == "__main__":
    main()
