"""bf16-arithmetic vote kernel experiment.

Mosaic rejects bf16 comparisons on v5e, but the expensive part of the
pair evaluation is the distance arithmetic (3 sub + 3 mul + 2 add per
pair); a variant that computes d2 in bf16 and upcasts for the f32 band
compare tests whether the VPU's bf16 rate buys anything.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VOX_BLOCK = 1024
PT_CHUNK = 512
REPS = 32


def _kernel_f32(vox_ref, pts_ref, out_ref, acc_ref):
    nc = pl.program_id(1)
    ncb = pl.num_programs(1)

    @pl.when(nc == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    vx = vox_ref[:, 0:1]
    vy = vox_ref[:, 1:2]
    vz = vox_ref[:, 2:3]
    px = pts_ref[0:1, :]
    py = pts_ref[1:2, :]
    pz = pts_ref[2:3, :]
    lo = pts_ref[3:4, :]
    hi = pts_ref[4:5, :]
    dx = vx - px
    dy = vy - py
    dz = vz - pz
    d2 = dx * dx + dy * dy + dz * dz
    hit = jnp.logical_and(d2 > lo, d2 < hi)
    acc_ref[:, :] += hit.astype(jnp.float32)

    @pl.when(nc == ncb - 1)
    def _():
        out_ref[:, :] = jnp.sum(acc_ref[:, :], axis=1, keepdims=True)


def _kernel_bf16(vox_ref, pts_ref, band_ref, out_ref, acc_ref):
    nc = pl.program_id(1)
    ncb = pl.num_programs(1)

    @pl.when(nc == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    vx = vox_ref[:, 0:1]
    vy = vox_ref[:, 1:2]
    vz = vox_ref[:, 2:3]
    px = pts_ref[0:1, :]
    py = pts_ref[1:2, :]
    pz = pts_ref[2:3, :]
    dx = vx - px
    dy = vy - py
    dz = vz - pz
    d2 = (dx * dx + dy * dy + dz * dz).astype(jnp.float32)
    lo = band_ref[0:1, :]
    hi = band_ref[1:2, :]
    hit = jnp.logical_and(d2 > lo, d2 < hi)
    acc_ref[:, :] += hit.astype(jnp.float32)

    @pl.when(nc == ncb - 1)
    def _():
        out_ref[:, :] = jnp.sum(acc_ref[:, :], axis=1, keepdims=True)


def run_f32(voxels, points, lo, hi):
    v, n = voxels.shape[0], points.shape[0]
    vox = jnp.pad(voxels, ((0, (-v) % VOX_BLOCK), (0, 1)),
                  constant_values=-1e9)
    pts = jnp.concatenate(
        [points.T, lo[None, :], hi[None, :], jnp.zeros((3, n))], axis=0)
    pts = jnp.pad(pts, ((0, 0), (0, (-n) % PT_CHUNK)))
    nvb = vox.shape[0] // VOX_BLOCK
    ncb = pts.shape[1] // PT_CHUNK
    out = pl.pallas_call(
        _kernel_f32, grid=(nvb, ncb),
        in_specs=[pl.BlockSpec((VOX_BLOCK, 4), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, PT_CHUNK), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((VOX_BLOCK, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vox.shape[0], 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((VOX_BLOCK, PT_CHUNK), jnp.float32)],
    )(vox.astype(jnp.float32), pts.astype(jnp.float32))
    return out[:v, 0]


def run_bf16(voxels, points, lo, hi):
    v, n = voxels.shape[0], points.shape[0]
    vox = jnp.pad(voxels, ((0, (-v) % VOX_BLOCK), (0, 1)),
                  constant_values=-1e4)
    pts = jnp.concatenate([points.T, jnp.zeros((5, n))], axis=0)
    pts = jnp.pad(pts, ((0, 0), (0, (-n) % PT_CHUNK)))
    band = jnp.concatenate(
        [lo[None, :], hi[None, :], jnp.zeros((6, n))], axis=0)
    band = jnp.pad(band, ((0, 0), (0, (-n) % PT_CHUNK)))
    nvb = vox.shape[0] // VOX_BLOCK
    ncb = pts.shape[1] // PT_CHUNK
    out = pl.pallas_call(
        _kernel_bf16, grid=(nvb, ncb),
        in_specs=[pl.BlockSpec((VOX_BLOCK, 4), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, PT_CHUNK), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, PT_CHUNK), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((VOX_BLOCK, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vox.shape[0], 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((VOX_BLOCK, PT_CHUNK), jnp.float32)],
    )(vox.astype(jnp.bfloat16), pts.astype(jnp.bfloat16),
      band.astype(jnp.float32))
    return out[:v, 0]


def timeit(fn, *args):
    @jax.jit
    def run(*a):
        x0 = a[1]

        def body(i, carry):
            x, acc = carry
            out = fn(a[0], x, a[2], a[3])
            m = out.mean()
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


def main():
    rng = np.random.default_rng(0)
    n = 8192
    v = 32768  # coarse stage of grid 128
    voxels = jnp.asarray(
        rng.integers(0, 32, size=(v, 3)).astype(np.float32) * 4 + 1.5)
    points = jnp.asarray(rng.uniform(0, 128, size=(n, 3)).astype(np.float32))
    r = jnp.asarray(rng.uniform(10, 50, size=n).astype(np.float32))
    slack = 4.2
    lo = jnp.maximum(r - slack, 0.0) ** 2
    hi = (r + slack) ** 2

    t32 = timeit(run_f32, voxels, points, lo, hi)
    tbf = timeit(run_bf16, voxels, points, lo, hi)
    a = np.asarray(run_f32(voxels, points, lo, hi))
    b = np.asarray(run_bf16(voxels, points, lo, hi))
    rel = np.abs(a - b) / np.maximum(a, 1)
    print(f"f32 {t32*1e3:.3f} ms  bf16-arith {tbf*1e3:.3f} ms  "
          f"speedup {t32/tbf:.2f}x  count rel-err mean {rel.mean():.4f} "
          f"max {rel.max():.4f}")
    # does bf16 perturb the coarse RANKING? compare top-4 cells
    top_a = set(np.argsort(-a)[:4].tolist())
    top_b = set(np.argsort(-b)[:4].tolist())
    print(f"top-4 coarse cells overlap: {len(top_a & top_b)}/4")


if __name__ == "__main__":
    main()
