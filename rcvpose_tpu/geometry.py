"""Pinhole-camera geometry primitives, pure jnp and fully vmappable.

Capability parity with the reference's NumPy geometry helpers
(``/root/reference/data_loader.py:13-43`` and
``/root/reference/AccumulatorSpace.py:59-120``), re-designed for TPU:

* back-projection is *dense* — every pixel maps to an (x, y, z) triple plus a
  validity flag, so downstream ops see static shapes instead of the
  reference's ``depth.nonzero()`` ragged gather.
* everything is jit-compatible and batched via ``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# LINEMOD camera intrinsics (reference: data_loader.py:9-11).
LINEMOD_K = np.array(
    [[572.4114, 0.0, 325.2611],
     [0.0, 573.57043, 242.04899],
     [0.0, 0.0, 1.0]],
    dtype=np.float64,
)


def _matmul_f32(a, b):
    """Small-matrix matmul at full f32 precision (TPU dot defaults to bf16)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def transform_points(xyz, rt):
    """Apply a rigid transform. ``xyz``: (N, 3); ``rt``: (3, 4) or (4, 4)."""
    rt = jnp.asarray(rt)
    return _matmul_f32(xyz, rt[:3, :3].T) + rt[:3, 3]


def project(xyz, k, rt):
    """World points -> (pixel xy, camera-frame xyz).

    Mirrors reference ``project`` (data_loader.py:13-33): returns both the
    2D pixel coordinates and the rigidly-transformed 3D points.
    """
    cam_xyz = transform_points(xyz, rt)
    uvw = _matmul_f32(cam_xyz, jnp.asarray(k).T)
    xy = uvw[..., :2] / uvw[..., 2:]
    return xy, cam_xyz


def backproject_dense(depth, k):
    """Dense depth-map back-projection.

    Args:
      depth: (H, W) depth image (any unit; zeros = invalid).
      k: (3, 3) intrinsics.

    Returns:
      xyz: (H, W, 3) camera-frame points in the same unit as ``depth``
        (garbage where invalid — gate on ``valid``).
      valid: (H, W) bool, True where ``depth > 0``.

    TPU-native replacement for reference ``rgbd_to_point_cloud``
    (data_loader.py:35-43): x = (u - cx) z / fx, y = (v - cy) z / fy over
    *all* pixels, no ragged ``nonzero`` gather.
    """
    depth = jnp.asarray(depth)
    h, w = depth.shape
    k = jnp.asarray(k, dtype=depth.dtype if depth.dtype.kind == "f" else jnp.float32)
    z = depth.astype(k.dtype)
    us = jnp.arange(w, dtype=k.dtype)[None, :]
    vs = jnp.arange(h, dtype=k.dtype)[:, None]
    xs = (us - k[0, 2]) * z / k[0, 0]
    ys = (vs - k[1, 2]) * z / k[1, 1]
    xyz = jnp.stack([xs, ys, z], axis=-1)
    return xyz, depth > 0


def pack_valid_indices(flat_valid, n_points):
    """Indices of the first ``n_points`` True entries (row-major), plus a
    validity mask.

    TPU-tuned: a min-k over (index if valid else BIG) via ``lax.top_k`` —
    the size-bounded ``jnp.nonzero`` lowers to a ~ms-scale flat cumsum on
    TPU, while TopK is a fast native custom-call. Returns (order, mask).
    """
    n = flat_valid.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    key = jnp.where(flat_valid, idx, jnp.int32(n))
    k = min(n_points, n)  # source may hold fewer pixels than the budget
    _, order = jax.lax.top_k(-key, k)  # smallest keys = first valid
    if k < n_points:
        order = jnp.pad(order, (0, n_points - k))
    count = jnp.sum(flat_valid.astype(jnp.int32))
    mask = jnp.arange(n_points) < jnp.minimum(count, n_points)
    return order, mask


def depth_hypothesis_clouds(pixel_mask, k, z_min_m, n_hyp, n_points,
                            step_m=1e-3):
    """Depth-hypothesis clouds for the RGB-only ablation.

    TPU re-expression of reference ``rgbd_to_point_cloud_no_depth``
    (AccumulatorSpace.py:100-120): hypothesize ``n_hyp`` constant-depth
    planes ``z_i = z_min_m + i * step_m`` (the reference sweeps 1 mm steps
    from zs.min() to zs.max(); pick ``n_hyp = int(z_max*1000) + 1 -
    int(z_min*1000)`` for the identical plane set) and back-project every
    masked pixel at each plane. Static shapes: ``n_hyp`` planes x
    ``n_points`` packed pixels.

    Args:
      pixel_mask: (H, W) bool — pixels that vote (the sem mask).
      k: (3, 3) intrinsics.
      z_min_m: scalar, first hypothesis depth in meters (may be traced).
      n_hyp: static number of depth planes.
      n_points: static packed pixel budget.
      step_m: plane spacing in meters (reference: 0.001).

    Returns:
      clouds_m: (n_hyp, n_points, 3) camera-frame points in meters.
      mask: (n_points,) bool — valid packed pixels (shared by every plane).
      order: (n_points,) int32 — flat row-major pixel index of each packed
        point, for aligning per-pixel data (e.g. radii) with the clouds.
      count: () int32 — number of masked pixels (pre-truncation).
    """
    mask2d = jnp.asarray(pixel_mask)
    h, w = mask2d.shape
    k = jnp.asarray(k, jnp.float32)
    us = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w))
    vs = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None], (h, w))
    xs_unit = (us - k[0, 2]) / k[0, 0]   # x at z = 1
    ys_unit = (vs - k[1, 2]) / k[1, 1]
    flat_valid = mask2d.reshape(-1)
    order, mask = pack_valid_indices(flat_valid, n_points)
    xu = jnp.where(mask, xs_unit.reshape(-1)[order], 0.0)
    yu = jnp.where(mask, ys_unit.reshape(-1)[order], 0.0)
    zs = (jnp.asarray(z_min_m, jnp.float32)
          + jnp.arange(n_hyp, dtype=jnp.float32) * step_m)   # (D,)
    clouds = jnp.stack(
        [xu[None, :] * zs[:, None],
         yu[None, :] * zs[:, None],
         jnp.broadcast_to(zs[:, None], (n_hyp, n_points))], axis=-1)
    count = jnp.sum(flat_valid.astype(jnp.int32))
    return clouds, mask, order, count


def depth_to_pointcloud(depth, k, n_points, fill_value=0.0):
    """Back-project and compact valid pixels into a fixed-size point set.

    Valid points are packed in the reference's row-major pixel order
    (``depth.nonzero()`` order, reference data_loader.py:36), truncated or
    padded to ``n_points``.

    Returns:
      pts: (n_points, 3), padded with ``fill_value``.
      mask: (n_points,) bool — True for real points.
      count: () int32 — number of valid pixels (pre-truncation).
    """
    xyz, valid = backproject_dense(depth, k)
    flat_xyz = xyz.reshape(-1, 3)
    flat_valid = valid.reshape(-1)
    count = jnp.sum(flat_valid.astype(jnp.int32))
    idx, mask = pack_valid_indices(flat_valid, n_points)
    pts = jnp.where(mask[:, None], flat_xyz[idx], fill_value)
    return pts, mask, count
