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
                    rt_gt_mm=None):
    """Write <frame_id>_overlay.png with estimate (red) and GT (blue)."""
    os.makedirs(out_dir, exist_ok=True)
    img = draw_overlay(image_u8, cad_mm, rt_est_mm, k, color=(255, 0, 0))
    if rt_gt_mm is not None:
        img = draw_overlay(img, cad_mm, rt_gt_mm, k, color=(0, 0, 255))
    path = os.path.join(out_dir, f"{frame_id}_overlay.png")
    Image.fromarray(img).save(path)
    return path
