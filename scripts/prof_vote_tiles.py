"""Sweep Pallas vote-kernel tile sizes (VOX_BLOCK x PT_CHUNK) on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 32


def make_runner(vox_block, pt_chunk):
    def kernel(vox_ref, pts_ref, out_ref, acc_ref):
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

    def run(voxels, points, lo, hi):
        v, n = voxels.shape[0], points.shape[0]
        vox = jnp.pad(voxels, ((0, (-v) % vox_block), (0, 1)),
                      constant_values=-1e9)
        pts = jnp.concatenate(
            [points.T, lo[None, :], hi[None, :], jnp.zeros((3, n))], axis=0)
        pts = jnp.pad(pts, ((0, 0), (0, (-n) % pt_chunk)))
        out = pl.pallas_call(
            kernel, grid=(vox.shape[0] // vox_block,
                          pts.shape[1] // pt_chunk),
            in_specs=[pl.BlockSpec((vox_block, 4), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((8, pt_chunk), lambda i, j: (0, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((vox_block, 1), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((vox.shape[0], 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((vox_block, pt_chunk), jnp.float32)],
        )(vox.astype(jnp.float32), pts.astype(jnp.float32))
        return out[:v, 0]
    return run


def timeit(fn, voxels, points, lo, hi):
    @jax.jit
    def run(voxels, points, lo, hi):
        def body(i, carry):
            p, acc = carry
            out = fn(voxels, p, lo, hi)
            m = out.mean()
            return (p + (m * 1e-12).astype(p.dtype), acc + m)
        _, acc = jax.lax.fori_loop(0, REPS, body, (points, jnp.float32(0)))
        return acc
    float(run(voxels, points, lo, hi))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(voxels, points, lo, hi))
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best


def main():
    rng = np.random.default_rng(0)
    n = 8192 // 4  # coarse stage point count after stride-4
    v = 32768      # coarse voxels of grid 128
    voxels = jnp.asarray(
        rng.integers(0, 32, size=(v, 3)).astype(np.float32) * 4 + 1.5)
    points = jnp.asarray(rng.uniform(0, 128, size=(n, 3)).astype(np.float32))
    r = jnp.asarray(rng.uniform(10, 50, size=n).astype(np.float32))
    lo = jnp.maximum(r - 4.2, 0.0) ** 2
    hi = (r + 4.2) ** 2

    ref = None
    for vb, pc in [(1024, 512), (512, 512), (2048, 512), (1024, 1024),
                   (2048, 1024), (512, 2048), (4096, 512), (1024, 2048)]:
        fn = make_runner(vb, pc)
        dt = timeit(fn, voxels, points, lo, hi)
        out = np.asarray(fn(voxels, points, lo, hi))
        if ref is None:
            ref = out
        ok = np.array_equal(out, ref)
        print(f"VOX={vb:5d} PT={pc:5d}: {dt*1e3:7.3f} ms  "
              f"({'ok' if ok else 'MISMATCH'})", flush=True)


if __name__ == "__main__":
    main()

# Measured on v5e (coarse stage shapes, 2048 pts x 32768 vox):
#   VOX=1024 PT=512: 1.224 ms   VOX=512  PT=512:  1.185 ms
#   VOX=2048 PT=512: 1.204 ms   VOX=1024 PT=1024: 1.170 ms
#   VOX=2048 PT=1024: remote-compile HTTP 500 (VMEM scratch too large)
# All within ~5% — the kernel is VPU-compute-bound, not tiling-bound;
# the production (1024, 512) stays.
