"""RGB-only (no-depth) ablation path: hypothesis clouds -> accumulator.

Covers the loop the reference left dead: ``rgbd_to_point_cloud_no_depth``
(AccumulatorSpace.py:100-120) producing (D, N, 3) hypothesis clouds consumed
by ``Accumulator_3D_no_depth`` (:421-479).
"""

import numpy as np
import jax.numpy as jnp

from rcvpose_tpu import eval as eval_mod
from rcvpose_tpu import geometry


def reference_no_depth_clouds(k, depth):
    """Vectorized NumPy oracle of rgbd_to_point_cloud_no_depth
    (AccumulatorSpace.py:100-120): nonzero pixels, z planes at 1 mm steps
    from zs.min(), one constant-z backprojection per plane."""
    vs, us = depth.nonzero()
    zs = depth[vs, us]
    z_min, z_max = zs.min(), zs.max()
    n_hyp = int(z_max * 1000) + 1 - int(z_min * 1000)
    out = np.empty((n_hyp, len(us), 3))
    for i in range(n_hyp):
        z = z_min + i * 0.001
        out[i, :, 0] = (us - k[0, 2]) * z / k[0, 0]
        out[i, :, 1] = (vs - k[1, 2]) * z / k[1, 1]
        out[i, :, 2] = z
    return out


def test_depth_hypothesis_clouds_match_reference_oracle(rng):
    h, w = 24, 32
    k = np.array([[60.0, 0, 16], [0, 60.0, 12], [0, 0, 1]])
    depth = np.zeros((h, w))
    depth[5:15, 8:20] = rng.uniform(0.7, 0.705, size=(10, 12))
    ref = reference_no_depth_clouds(k, depth)
    n_hyp, n_ref = ref.shape[:2]

    clouds, mask, order, count = geometry.depth_hypothesis_clouds(
        jnp.asarray(depth > 0), jnp.asarray(k, jnp.float32),
        jnp.float32(depth[depth > 0].min()), n_hyp, n_points=256)
    assert int(count) == n_ref
    assert int(mask.sum()) == n_ref
    # same row-major pixel order as depth.nonzero()
    np.testing.assert_allclose(np.asarray(clouds)[:, :n_ref, :], ref,
                               rtol=1e-5, atol=1e-6)
    # padded entries carry the plane z but masked-out x=y=0
    assert (np.asarray(clouds)[:, n_ref:, :2] == 0).all()


def test_no_depth_keypoint_recovers_planar_scene(rng):
    """Constant-z scene: the correct hypothesis plane reproduces the true
    cloud, so its votes dominate and the keypoint is recovered without any
    depth input."""
    h, w = 96, 128
    k = np.array([[150.0, 0, w / 2], [0, 150.0, h / 2], [0, 0, 1]])
    z0 = 0.72
    mask = np.zeros((h, w), bool)
    mask[35:65, 45:85] = True
    vs, us = mask.nonzero()
    xs = (us - k[0, 2]) * z0 / k[0, 0]
    ys = (vs - k[1, 2]) * z0 / k[1, 1]
    pts = np.stack([xs, ys, np.full_like(xs, z0)], axis=1)  # true scene (m)
    kpt = np.array([0.02, -0.01, 0.75])                     # keypoint (m)
    radial_dm = np.zeros((h, w), np.float32)
    radial_dm[mask] = np.linalg.norm(pts - kpt, axis=1) * 10.0
    sem = mask.astype(np.float32)

    center, overflow, count = eval_mod.keypoint_from_maps_no_depth(
        jnp.asarray(sem), jnp.asarray(radial_dm),
        jnp.asarray(k, jnp.float32), jnp.float32(z0 - 0.004),
        jnp.float32(100.0), jnp.float32(0.5),
        n_points=2048, n_hyp=9, grid_l=128, mode="hier")
    assert int(count) == mask.sum()
    assert not bool(overflow)
    err = np.linalg.norm(np.asarray(center) - kpt * 1000.0)
    assert err < 10.0, (np.asarray(center), kpt * 1000.0)
