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


def test_scene_ply_roundtrip(rng, tmp_path):
    """save_scene_ply (the reference's unused rgbd_to_color_point_cloud,
    AccumulatorSpace.py:87-98) writes a binary PLY whose positions read
    back exactly through readers.read_ply_points."""
    from rcvpose_tpu.data import readers

    h, w = 24, 32
    img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
    depth = np.zeros((h, w), np.float32)
    depth[4:20, 6:28] = rng.uniform(500, 900, size=(16, 22))
    k = np.array([[200.0, 0, 16], [0, 200.0, 12], [0, 0, 1]])

    pts = demo.rgbd_to_color_point_cloud(k, depth, img)
    assert pts.shape == (16 * 22, 6)
    # color columns are the pixel values at the nonzero-depth pixels
    vs, us = depth.nonzero()
    np.testing.assert_array_equal(pts[:, 3:].astype(np.uint8),
                                  img[vs, us])
    # backprojection matches the shared geometry helper
    xyz_map, valid = geometry.backproject_dense(depth, k)
    np.testing.assert_allclose(pts[:, :3], np.asarray(xyz_map)[vs, us],
                               rtol=1e-5)

    path = demo.save_scene_ply(str(tmp_path / "scene.ply"), img, depth, k)
    back = readers.read_ply_points(path)
    np.testing.assert_allclose(back, pts[:, :3], rtol=1e-6)


def test_save_demo_frame_scene_ply(rng, tmp_path):
    img = np.zeros((32, 32, 3), np.uint8)
    depth = np.full((32, 32), 700.0, np.float32)
    cad_mm = rng.normal(size=(50, 3)) * 30
    rt_mm = np.asarray(random_pose(rng))
    rt_mm[:, 3] *= 1000.0
    k = np.array([[100.0, 0, 16], [0, 100.0, 16], [0, 0, 1]])
    demo.save_demo_frame(str(tmp_path), "f1", img, cad_mm, rt_mm, k,
                         depth_mm=depth, scene_ply=True)
    assert os.path.exists(tmp_path / "f1_scene.ply")
    # scene_ply=False (the default) writes no cloud
    demo.save_demo_frame(str(tmp_path), "f2", img, cad_mm, rt_mm, k,
                         depth_mm=depth)
    assert not os.path.exists(tmp_path / "f2_scene.ply")
