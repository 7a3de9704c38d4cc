import os

import numpy as np

from rcvpose_tpu import demo, geometry
from tests.test_geometry import random_pose


def test_draw_overlay_paints_pixels(rng, tmp_path):
    img = np.zeros((120, 160, 3), np.uint8)
    cad_mm = rng.normal(size=(200, 3)) * 30
    rt = np.asarray(random_pose(rng))
    rt_mm = rt.copy()
    rt_mm[:, 3] *= 1000.0
    k = np.array([[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1]])
    out = demo.draw_overlay(img, cad_mm, rt_mm, k)
    assert (out == [255, 0, 0]).all(axis=-1).any()

    path = demo.save_demo_frame(str(tmp_path), "000001", img, cad_mm, rt_mm,
                                k, rt_gt_mm=rt_mm)
    assert os.path.exists(path)
