import numpy as np

from rcvpose_tpu import geometry
from tests import oracles


def random_pose(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    r = np.array([
        [1 - 2*(y*y + z*z), 2*(x*y - w*z), 2*(x*z + w*y)],
        [2*(x*y + w*z), 1 - 2*(x*x + z*z), 2*(y*z - w*x)],
        [2*(x*z - w*y), 2*(y*z + w*x), 1 - 2*(x*x + y*y)],
    ])
    t = rng.normal(size=3) * 0.1 + np.array([0, 0, 0.8])
    return np.concatenate([r, t[:, None]], axis=1)


def test_project_matches_oracle(rng):
    pts = rng.normal(size=(50, 3)) * 0.05
    rt = random_pose(rng)
    xy, cam = geometry.project(pts, geometry.LINEMOD_K, rt)
    xy_np, cam_np = oracles.project_np(pts, geometry.LINEMOD_K, rt)
    np.testing.assert_allclose(np.asarray(xy), xy_np, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cam), cam_np, rtol=1e-5)


def test_backproject_roundtrip(rng):
    # project camera-frame points to pixels, splat to a depth map, backproject
    depth = np.zeros((48, 64), np.float32)
    k = np.array([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1]])
    zs = rng.uniform(500, 900, size=20)
    us = rng.integers(0, 64, size=20)
    vs = rng.integers(0, 48, size=20)
    depth[vs, us] = zs
    xyz, valid = geometry.backproject_dense(depth, k)
    xyz, valid = np.asarray(xyz), np.asarray(valid)
    pts_np, vs_np, us_np = oracles.backproject_np(depth, k)
    np.testing.assert_allclose(xyz[vs_np, us_np], pts_np, rtol=1e-4)
    assert valid.sum() == (depth > 0).sum()


def test_depth_to_pointcloud_packing_order(rng):
    depth = np.zeros((8, 10), np.float32)
    depth[1, 3] = 100.0
    depth[1, 7] = 200.0
    depth[5, 2] = 300.0
    k = np.array([[50.0, 0, 5.0], [0, 50.0, 4.0], [0, 0, 1]])
    pts, mask, count = geometry.depth_to_pointcloud(depth, k, n_points=6)
    pts, mask = np.asarray(pts), np.asarray(mask)
    assert int(count) == 3
    assert mask.tolist() == [True, True, True, False, False, False]
    ref, _, _ = oracles.backproject_np(depth, k)
    np.testing.assert_allclose(pts[:3], ref, rtol=1e-4)
    np.testing.assert_array_equal(pts[3:], 0.0)


def test_depth_to_pointcloud_truncates(rng):
    depth = rng.uniform(1, 2, size=(6, 6)).astype(np.float32)
    k = np.eye(3)
    pts, mask, count = geometry.depth_to_pointcloud(depth, k, n_points=10)
    assert int(count) == 36
    assert np.asarray(mask).all()


def test_transform_points_accepts_4x4(rng):
    rt = random_pose(rng)
    rt44 = np.eye(4)
    rt44[:3] = rt
    pts = rng.normal(size=(7, 3))
    a = geometry.transform_points(pts, rt)
    b = geometry.transform_points(pts, rt44)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
