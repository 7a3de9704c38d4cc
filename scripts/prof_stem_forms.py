"""Stem conv (7x7 s2 p3, 3->64 @480x640) alternative forms on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

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


def conv_ref(w, x):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def space_to_depth(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def build_s2d_stem_kernel(w):
    """(7,7,C,F) -> (4,4,4C,F) kernel on the s2d layout: output (i,j) =
    sum_{ty,tx} w[ty,tx] * x[2i+ty-3, 2j+tx-3]; source phase (ty+1)%2,
    block offset floor((ty-3)/2) in {-2,-1,0,1} -> kernel slot offset+2."""
    c, f = w.shape[2], w.shape[3]
    k = np.zeros((4, 4, 4 * c, f), np.float32)
    for ty in range(7):
        qy, ry = (ty - 3) // 2, (ty - 3) % 2
        for tx in range(7):
            qx, rx = (tx - 3) // 2, (tx - 3) % 2
            pi = ry * 2 + rx
            k[qy + 2, qx + 2, pi * c:(pi + 1) * c, :] += w[ty, tx]
    return k


def stem_s2d_conv(k, x):
    xs = space_to_depth(x)
    return jax.lax.conv_general_dilated(
        xs, k, (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def stem_s2d_im2col(k, x):
    """s2d + 16 unstrided slices + one matmul (k: (4,4,12,F))."""
    xs = space_to_depth(x)
    b, h, w, c = xs.shape
    xp = jnp.pad(xs, ((0, 0), (2, 1), (2, 1), (0, 0)))
    cols = [xp[:, dy:dy + h, dx:dx + w, :]
            for dy in range(4) for dx in range(4)]
    patches = jnp.concatenate(cols, axis=-1)
    kk = k.reshape(16 * c, k.shape[-1])
    return jnp.einsum("bhwk,kf->bhwf", patches, kk)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 480, 640, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(build_s2d_stem_kernel(np.asarray(w, np.float32)),
                    jnp.bfloat16)

    t0 = timeit(conv_ref, w, x)
    t1 = timeit(stem_s2d_conv, k, x)
    t2 = timeit(stem_s2d_im2col, k, x)

    # exactness in f32
    xf = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    wf = jnp.asarray(rng.normal(size=(7, 7, 3, 64)), jnp.float32)
    kf = jnp.asarray(build_s2d_stem_kernel(np.asarray(wf)), jnp.float32)
    ref = conv_ref(wf, xf)
    e1 = float(jnp.abs(ref - stem_s2d_conv(kf, xf)).max())
    e2 = float(jnp.abs(ref - stem_s2d_im2col(kf, xf)).max())
    print(f"stem: conv {t0*1e3:6.3f} ms  s2d-conv {t1*1e3:6.3f} ms "
          f"(err {e1:.1e})  s2d-im2col {t2*1e3:6.3f} ms (err {e2:.1e})")


if __name__ == "__main__":
    main()
