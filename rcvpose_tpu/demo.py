"""Demo-mode visualization (reference AccumulatorSpace.py:670-683, 716-717).

The reference paints projected CAD points into the RGB frame and opens
blocking matplotlib/Open3D windows. Headless-friendly version: renders the
overlay with PIL and writes a PNG per frame.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from rcvpose_tpu import geometry


def project_points_to_pixels(cad_mm, rt_mm, k):
    xy, _ = geometry.project(np.asarray(cad_mm), np.asarray(k),
                             np.asarray(rt_mm)[:3, :])
    return np.asarray(xy)


def draw_overlay(image_u8, cad_mm, rt_mm, k, color=(255, 0, 0)):
    """Paint the model (under pose rt, mm) into a copy of the image."""
    img = np.asarray(image_u8).copy()
    h, w = img.shape[:2]
    xy = project_points_to_pixels(cad_mm, rt_mm, k)
    us = np.round(xy[:, 0]).astype(int)
    vs = np.round(xy[:, 1]).astype(int)
    ok = (us >= 0) & (us < w) & (vs >= 0) & (vs < h)
    img[vs[ok], us[ok]] = color
    return img


def save_demo_frame(out_dir, frame_id, image_u8, cad_mm, rt_est_mm, k,
                    rt_gt_mm=None, depth_mm=None, scene_ply=False):
    """Write <frame_id>_overlay.png with estimate (red) and GT (blue).

    ``scene_ply`` (with ``depth_mm``) additionally dumps the frame's
    colored scene cloud as <frame_id>_scene.ply (``--demo_scene_ply``)."""
    os.makedirs(out_dir, exist_ok=True)
    img = draw_overlay(image_u8, cad_mm, rt_est_mm, k, color=(255, 0, 0))
    if rt_gt_mm is not None:
        img = draw_overlay(img, cad_mm, rt_gt_mm, k, color=(0, 0, 255))
    path = os.path.join(out_dir, f"{frame_id}_overlay.png")
    Image.fromarray(img).save(path)
    if scene_ply and depth_mm is not None:
        save_scene_ply(os.path.join(out_dir, f"{frame_id}_scene.ply"),
                       image_u8, depth_mm, k)
    return path


def rgbd_to_color_point_cloud(k, depth, rgb):
    """(N, 6) [x, y, z, r, g, b] back-projection of every nonzero-depth
    pixel, in the depth's units (the reference's unused debug helper,
    AccumulatorSpace.py:87-98) — the pinhole math lives once, in
    ``geometry.backproject_dense``; this just gathers the valid pixels
    and joins the colors.

    Two deliberate deviations from the reference helper: the
    back-projection computes in float32 (not float64 — device math), and
    the valid set is ``depth > 0`` rather than ``depth.nonzero()``, so
    negative-depth pixels are excluded. Both are invisible for real
    mm depth maps (non-negative, and f32 resolves mm exactly at scene
    scale)."""
    from rcvpose_tpu import geometry
    depth = np.asarray(depth)
    xyz, valid = geometry.backproject_dense(depth.astype(np.float32), k)
    vs, us = np.asarray(valid).nonzero()
    rgb = np.asarray(rgb)
    return np.concatenate(
        [np.asarray(xyz)[vs, us].astype(np.float64),
         rgb[vs, us, :3].astype(np.float64)], axis=1)


def save_scene_ply(path, image_u8, depth_mm, k):
    """Write the frame's colored scene cloud (mm) as a binary-LE PLY —
    eval failures become inspectable in any point-cloud viewer. Readable
    back by ``readers.read_ply_points`` (positions)."""
    pts = rgbd_to_color_point_cloud(k, depth_mm, np.asarray(image_u8))
    rec = np.empty(len(pts), dtype=np.dtype(
        [("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
         ("red", "u1"), ("green", "u1"), ("blue", "u1")]))
    for i, name in enumerate(("x", "y", "z")):
        rec[name] = pts[:, i]
    for i, name in enumerate(("red", "green", "blue")):
        rec[name] = pts[:, 3 + i].astype(np.uint8)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(rec)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n")
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())
    return path
