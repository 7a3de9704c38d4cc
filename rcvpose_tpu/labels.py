"""GT radial-map + semantic-map generation, fused into one jit-able op.

Replaces three things in the reference with a single dense elementwise
program (no scatter, no Numba, no offline pass):

* the per-sample on-the-fly transform (``/root/reference/data_loader.py:68-114``),
* the offline LINEMOD generator (``3DRadius_lm.py:126-234``),
* the offline YCB generator (``3DRadius_ycb.py:164-286``).

Semantics matched to the executed reference path:
  * depth is zeroed where mask == 0 (data_loader.py:73),
  * keypoint is moved into camera frame with the GT pose in mm
    (data_loader.py:78-85),
  * per-pixel label = Euclidean distance (m) from the back-projected pixel to
    the keypoint, x10 => decimeters (data_loader.py:91),
  * radii > max_radii_dm are zeroed (data_loader.py:92),
  * semantic label is +1 where radial > 0 else -1 (data_loader.py:104),
  * for non-LINEMOD ('ycb') data, radii >= 10 dm are zeroed (data_loader.py:107-108),
  * image is scaled to [0,1] and ImageNet-normalized (data_loader.py:57-58, 88-96).

The even-crop (data_loader.py:97-101) is applied to image *and* labels here
(the reference only crops the image — a latent shape-mismatch bug it never
hits because LINEMOD frames are 480x640; documented divergence).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rcvpose_tpu import geometry

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def normalize_image(img_u8):
    """uint8/float (H, W, 3) RGB -> float32 ImageNet-normalized, NHWC order."""
    img = jnp.asarray(img_u8, dtype=jnp.float32) / 255.0
    return (img - IMAGENET_MEAN) / IMAGENET_STD


@partial(jax.jit, static_argnames=("ycb_clip",))
def radial_labels(depth_mm, mask, pose, kpt_m, k, max_radii_dm, ycb_clip=False):
    """Dense radial + semantic GT labels for one frame.

    Args:
      depth_mm: (H, W) depth in millimeters (0 = no return).
      mask: (H, W) object mask; nonzero = object (reference zeroes depth where
        mask == 0).
      pose: (3, 4) GT pose, rotation + translation in meters.
      kpt_m: (3,) keypoint in model frame, meters.
      k: (3, 3) intrinsics.
      max_radii_dm: () max keypoint radius in decimeters; larger radii are
        zeroed.
      ycb_clip: additionally zero radii >= 10 dm (reference's YCB noise filter).

    Returns:
      radial_dm: (H, W) float32 radial map in decimeters (0 = background).
      sem: (H, W) float32 semantic map, +1 object / -1 background.
    """
    depth_mm = jnp.asarray(depth_mm)
    valid = (jnp.asarray(mask) != 0) & (depth_mm > 0)
    xyz_mm, _ = geometry.backproject_dense(depth_mm.astype(jnp.float32), k)
    xyz_m = xyz_mm / 1000.0

    # Keypoint -> camera frame, via the reference's mm-unit route
    # (data_loader.py:78-85): pose translation x1000, kpt x1000, back to m.
    pose = jnp.asarray(pose, dtype=jnp.float32)
    kpt_cam_m = (pose[:, :3] @ (jnp.asarray(kpt_m, jnp.float32) * 1000.0)
                 + pose[:, 3] * 1000.0) / 1000.0

    dist_m = jnp.linalg.norm(xyz_m - kpt_cam_m, axis=-1)
    radial_dm = jnp.where(valid, dist_m * 10.0, 0.0)
    radial_dm = jnp.where(radial_dm > max_radii_dm, 0.0, radial_dm)
    if ycb_clip:
        radial_dm = jnp.where(radial_dm >= 10.0, 0.0, radial_dm)
    sem = jnp.where(radial_dm > 0, 1.0, -1.0).astype(jnp.float32)
    return radial_dm.astype(jnp.float32), sem


@partial(jax.jit, static_argnames=("hw",))
def radial_labels_from_cad(cad_m, pose, kpt_m, k, max_radii_dm, hw):
    """Z-buffered CAD-projection GT labels — no depth sensor required.

    TPU-native counterpart of the reference's abandoned hidden-surface
    label rasterizer (``/root/reference/3DRadius_lm.py:87-118``, unused by
    its ``__main__``): project the posed CAD cloud, keep the nearest
    (min-z) point per pixel, and write that point's keypoint distance.
    The reference's per-pixel scan gated visibility on ``z <= mean(z)``
    and, when that failed, re-used whichever point the *previous* pixel
    accepted (``pre_z_loc`` — an iteration-order-dependent carry, i.e. a
    bug); the z-buffer itself is the hidden-surface rule that code was
    reaching for, so the carry is deliberately not reproduced (documented
    divergence, same policy as ``vote_mode="surface"``). Expressed as two
    scatter-mins (z, then point index among z-winners — ties break to the
    lowest index, deterministically) + one gather: no data races, no
    host loop, vmappable over poses.

    Args:
      cad_m: (N, 3) CAD model points, model frame, meters.
      pose: (3, 4) GT pose, rotation + translation in meters.
      kpt_m: (3,) keypoint in model frame, meters.
      k: (3, 3) intrinsics.
      max_radii_dm: () max keypoint radius in decimeters (larger -> 0).
      hw: static (H, W) output size.

    Returns:
      radial_dm: (H, W) float32 radial map in decimeters (0 = background
        or occluded), sem: (H, W) float32, +1 object / -1 background.
    """
    h, w = hw
    pose = jnp.asarray(pose, jnp.float32)
    cam_m = jnp.asarray(cad_m, jnp.float32) @ pose[:, :3].T + pose[:, 3]
    # keypoint via the same mm-unit route as radial_labels (parity of
    # rounding behavior with data_loader.py:78-85)
    kpt_cam_m = (pose[:, :3] @ (jnp.asarray(kpt_m, jnp.float32) * 1000.0)
                 + pose[:, 3] * 1000.0) / 1000.0

    kj = jnp.asarray(k, jnp.float32)
    z = cam_m[:, 2]
    u = jnp.round(cam_m[:, 0] / z * kj[0, 0] + kj[0, 2]).astype(jnp.int32)
    v = jnp.round(cam_m[:, 1] / z * kj[1, 1] + kj[1, 2]).astype(jnp.int32)
    ok = (z > 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    flat = jnp.where(ok, v * w + u, 0)

    big = jnp.float32(jnp.inf)
    zbuf = jnp.full(h * w, big, jnp.float32).at[flat].min(
        jnp.where(ok, z, big))
    # among the min-z points of each pixel, the lowest index wins
    front = ok & (z <= zbuf[flat])
    n = cam_m.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    ibuf = jnp.full(h * w, n, jnp.int32).at[flat].min(
        jnp.where(front, idx, n))

    dist_dm = jnp.linalg.norm(cam_m - kpt_cam_m, axis=-1) * 10.0
    dist_dm = jnp.concatenate([dist_dm, jnp.zeros((1,), jnp.float32)])
    radial = dist_dm[jnp.minimum(ibuf, n)].reshape(h, w)
    radial = jnp.where(radial > max_radii_dm, 0.0, radial)
    sem = jnp.where(radial > 0, 1.0, -1.0).astype(jnp.float32)
    return radial.astype(jnp.float32), sem


def even_crop(*arrays):
    """Crop leading two (H, W) dims to even sizes (reference data_loader.py:97-101)."""
    out = []
    for a in arrays:
        h, w = a.shape[:2]
        out.append(a[: h - h % 2, : w - w % 2])
    return tuple(out)


def make_sample(img_u8, depth_mm, mask, pose, kpt_m, k, max_radii_dm,
                ycb_clip=False):
    """Full training-sample transform: normalized image + radial + sem labels.

    Equivalent of ``RData.transform`` (reference data_loader.py:68-114) as one
    jit-able function. Image layout is NHWC (TPU-native) rather than torch's
    NCHW.
    """
    img = normalize_image(img_u8)
    radial, sem = radial_labels(depth_mm, mask, pose, kpt_m, k, max_radii_dm,
                                ycb_clip=ycb_clip)
    img, radial, sem = even_crop(img, radial, sem)
    return img, radial, sem
