"""Pallas TPU kernel for radial-vote counting.

This is the TPU-native replacement for the reference's Numba hot loop
(``/root/reference/AccumulatorSpace.py:325-341``, ``fast_for``) and its dead
CUDA port (``:344-371``). Design notes:

* The op is expressed as *pair evaluation*: for a list of voxel centers
  ``V x 3`` and a list of voting spheres (point, lo, hi) the kernel computes
  ``votes[v] = sum_n [ lo_n < d2(v, n) < hi_n ]``.
  One kernel serves every accumulator mode — the exact full grid, the
  hierarchical coarse grid, and per-peak refinement windows — because the
  voxel list is just data.
* Grid = (voxel blocks, point chunks); the hit matrix accumulates into a
  VMEM scratch across the point-chunk dimension and is lane-reduced to the
  per-voxel counts once per voxel block (on the last chunk). TPU grids run
  sequentially, so the accumulation is race-free by construction — the
  reference kernel's ``+=`` data race has no analogue here.
* The band test runs on squared distances (no sqrt, pure VPU) in the
  subtract-square form ``(vx-px)^2 + ...`` — no |v|^2 - 2vp + |p|^2
  cancellation — with per-point precomputed [lo, hi] bounds, so the same
  kernel body implements both the exact band
  ``(r - sqrt(3)/4)^2 < d2 < r^2`` and the widened coarse-stage band.
* Padding protocol: padded/masked points carry ``lo = hi = 0`` (can never
  vote, since d2 >= 0 fails ``d2 < 0``); padded voxels sit at -1e9 and are
  sliced away by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block sizes: the hit-accumulator scratch is (VOX_BLOCK, PT_CHUNK) f32 = 2 MB.
VOX_BLOCK = 1024
PT_CHUNK = 512


def _vote_kernel(vox_ref, pts_ref, out_ref, acc_ref):
    """One (voxel-block, point-chunk) tile of pair evaluations (VPU form).

    vox_ref: (VOX_BLOCK, 4) f32 — columns x, y, z, pad.
    pts_ref: (8, PT_CHUNK) f32 — rows x, y, z, lo, hi, pad...
    out_ref: (VOX_BLOCK, 1) f32 — per-voxel votes (written on last chunk).
    acc_ref: (VOX_BLOCK, PT_CHUNK) f32 scratch — running hit counts.

    The subtract-square distance form is kept exactly as the oracle computes
    it — this is the parity kernel for the 'exact' accumulator mode.
    """
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


def _vote_kernel_mxu(vox_ref, pts_ref, band_ref, out_ref, acc_ref):
    """MXU form: d2 = [vx,vy,vz,v2,1] . [-2px,-2py,-2pz,1,p2] in one matmul.

    vox_ref: (VOX_BLOCK, 8) f32 — columns x, y, z, |v|^2, 1, 0...
    pts_ref: (8, PT_CHUNK) f32 — rows -2x, -2y, -2z, 1, |p|^2, 0...
    band_ref: (8, PT_CHUNK) f32 — rows lo, hi, 0...
    The epilogue is 4 VPU ops/pair instead of 12; d2 carries ~1e-2 absolute
    error from the |v|^2 - 2vp + |p|^2 cancellation — negligible against the
    band widths of the hier mode, so this kernel serves hier only ('exact'
    keeps the subtract-square kernel).
    """
    nc = pl.program_id(1)
    ncb = pl.num_programs(1)

    @pl.when(nc == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    d2 = jax.lax.dot_general(
        vox_ref[:, :], pts_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    lo = band_ref[0:1, :]
    hi = band_ref[1:2, :]
    hit = jnp.logical_and(d2 > lo, d2 < hi)
    acc_ref[:, :] += hit.astype(jnp.float32)

    @pl.when(nc == ncb - 1)
    def _():
        out_ref[:, :] = jnp.sum(acc_ref[:, :], axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def vote_counts_pallas_mxu(voxels, points, lo, hi, interpret=False):
    """MXU-form pair evaluation (see ``_vote_kernel_mxu``); hier mode only."""
    v = voxels.shape[0]
    n = points.shape[0]
    v_pad = (-v) % VOX_BLOCK
    n_pad = (-n) % PT_CHUNK

    voxf = voxels.astype(jnp.float32)
    v2 = jnp.sum(voxf * voxf, axis=1, keepdims=True)
    vox = jnp.concatenate(
        [voxf, v2, jnp.ones((v, 1), jnp.float32),
         jnp.zeros((v, 3), jnp.float32)], axis=1)
    vox = jnp.pad(vox, ((0, v_pad), (0, 0)), constant_values=0.0)
    # padded voxels: all-zero rows give d2 = 0, which never satisfies
    # d2 > lo for the lo >= 0 bands; padded rows are sliced off anyway.

    ptsf = points.astype(jnp.float32)
    p2 = jnp.sum(ptsf * ptsf, axis=1)
    pts = jnp.concatenate(
        [-2.0 * ptsf.T, jnp.ones((1, n), jnp.float32), p2[None, :],
         jnp.zeros((3, n), jnp.float32)], axis=0)
    pts = jnp.pad(pts, ((0, 0), (0, n_pad)))
    band = jnp.concatenate(
        [lo.astype(jnp.float32)[None, :], hi.astype(jnp.float32)[None, :],
         jnp.zeros((6, n), jnp.float32)], axis=0)
    band = jnp.pad(band, ((0, 0), (0, n_pad)))

    nvb = (v + v_pad) // VOX_BLOCK
    ncb = (n + n_pad) // PT_CHUNK
    out = pl.pallas_call(
        _vote_kernel_mxu,
        grid=(nvb, ncb),
        in_specs=[
            pl.BlockSpec((VOX_BLOCK, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, PT_CHUNK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, PT_CHUNK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((VOX_BLOCK, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v + v_pad, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((VOX_BLOCK, PT_CHUNK), jnp.float32)],
        interpret=interpret,
    )(vox, pts, band)
    return out[:v, 0]


@functools.partial(jax.jit, static_argnames=("interpret", "compute_dtype"))
def vote_counts_pallas(voxels, points, lo, hi, interpret=False,
                       compute_dtype=jnp.float32):
    """Vote counts for each voxel center.

    Args:
      voxels: (V, 3) f32 voxel centers (voxel units).
      points: (N, 3) f32 voting-point coordinates.
      lo, hi: (N,) f32 squared-distance band bounds per point
        (masked-out points must have lo == hi == 0).
      interpret: run in the Pallas interpreter (for CPU tests).
      compute_dtype: pair-evaluation dtype. bfloat16 doubles VPU throughput;
        integer voxel centers stay exact in bf16 but point coordinates round
        by up to 0.5 ulp — only valid for bands with enough slack (the hier
        coarse stage widens its slack accordingly; the exact band must stay
        float32).

    Returns: (V,) f32 vote counts.
    """
    v = voxels.shape[0]
    n = points.shape[0]
    v_pad = (-v) % VOX_BLOCK
    n_pad = (-n) % PT_CHUNK

    vox = jnp.pad(voxels.astype(compute_dtype), ((0, v_pad), (0, 1)),
                  constant_values=-1e9)
    # points laid out as (8, N): rows x, y, z, lo, hi, 0, 0, 0.
    pts = jnp.concatenate(
        [points.astype(compute_dtype).T,
         lo.astype(compute_dtype)[None, :],
         hi.astype(compute_dtype)[None, :],
         jnp.zeros((3, n), compute_dtype)], axis=0)
    pts = jnp.pad(pts, ((0, 0), (0, n_pad)))

    nvb = (v + v_pad) // VOX_BLOCK
    ncb = (n + n_pad) // PT_CHUNK

    out = pl.pallas_call(
        _vote_kernel,
        grid=(nvb, ncb),
        in_specs=[
            pl.BlockSpec((VOX_BLOCK, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, PT_CHUNK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((VOX_BLOCK, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v + v_pad, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((VOX_BLOCK, PT_CHUNK), jnp.float32)],
        interpret=interpret,
    )(vox, pts)
    return out[:v, 0]
