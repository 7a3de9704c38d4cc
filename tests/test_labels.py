import numpy as np

from rcvpose_tpu import geometry, labels
from tests import oracles
from tests.test_geometry import random_pose


def synth_frame(rng, h=48, w=64):
    k = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]])
    depth = rng.uniform(600, 900, size=(h, w)).astype(np.float64)
    depth[rng.uniform(size=(h, w)) < 0.3] = 0  # depth holes
    mask = (rng.uniform(size=(h, w)) < 0.5).astype(np.int32) * 255
    pose = random_pose(rng)
    kpt = rng.normal(size=3) * 0.05
    return k, depth, mask, pose, kpt


def test_radial_labels_match_reference_math(rng):
    k, depth, mask, pose, kpt = synth_frame(rng)
    max_radii_dm = 8.0
    radial, sem = labels.radial_labels(depth, mask, pose, kpt, k, max_radii_dm)
    lbl_np, sem_np = oracles.radial_map_np(depth, mask, pose, kpt, k,
                                           max_radii_dm)
    np.testing.assert_allclose(np.asarray(radial), lbl_np, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(sem), sem_np)


def test_radial_labels_ycb_clip(rng):
    k, depth, mask, pose, kpt = synth_frame(rng)
    # huge max radius so only the >= 10 dm clip is active
    radial, sem = labels.radial_labels(depth, mask, pose, kpt, k, 1e9,
                                       ycb_clip=True)
    lbl_np, sem_np = oracles.radial_map_np(depth, mask, pose, kpt, k, 1e9,
                                           ycb_clip=True)
    np.testing.assert_allclose(np.asarray(radial), lbl_np, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(sem), sem_np)
    assert (np.asarray(radial) < 10.0).all()


def test_normalize_image():
    img = np.full((4, 6, 3), 127.5, np.float32)
    out = np.asarray(labels.normalize_image(img))
    expect = (0.5 - labels.IMAGENET_MEAN) / labels.IMAGENET_STD
    np.testing.assert_allclose(out, np.broadcast_to(expect, out.shape),
                               rtol=1e-5)


def test_even_crop():
    a = np.zeros((5, 7, 3))
    b = np.zeros((5, 7))
    ac, bc = labels.even_crop(a, b)
    assert ac.shape == (4, 6, 3)
    assert bc.shape == (4, 6)


def test_make_sample_shapes(rng):
    k, depth, mask, pose, kpt = synth_frame(rng, h=47, w=63)
    img = rng.integers(0, 255, size=(47, 63, 3)).astype(np.uint8)
    im, radial, sem = labels.make_sample(img, depth, mask, pose, kpt, k, 8.0)
    assert im.shape == (46, 62, 3)
    assert radial.shape == (46, 62)
    assert sem.shape == (46, 62)
    assert set(np.unique(np.asarray(sem))) <= {-1.0, 1.0}
