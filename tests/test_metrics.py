import numpy as np
import jax.numpy as jnp

from rcvpose_tpu import metrics
from tests.test_geometry import random_pose


def test_nn_distances_simple():
    a = jnp.asarray([[0.0, 0, 0], [1, 0, 0]])
    b = jnp.asarray([[0.0, 0, 0.5], [5, 5, 5]])
    d = np.asarray(metrics.nn_distances(a, b))
    np.testing.assert_allclose(d, [0.5, np.sqrt(1 + 0.25)], rtol=1e-5)


def test_nn_distances_masked():
    a = jnp.asarray([[0.0, 0, 0]])
    b = jnp.asarray([[0.0, 0, 0.5], [0, 0, 0.1]])
    mask = jnp.asarray([True, False])
    d = np.asarray(metrics.nn_distances(a, b, mask))
    np.testing.assert_allclose(d, [0.5], rtol=1e-5)


def test_add_score_identity(rng):
    model = rng.normal(size=(100, 3)).astype(np.float32)
    rt = np.asarray(random_pose(rng), np.float32)
    rt44 = np.eye(4, dtype=np.float32)
    rt44[:3] = rt
    mean_d, min_d = metrics.add_score(jnp.asarray(model), rt44, rt44)
    # f32 cancellation in the |a|^2 - 2ab + |b|^2 distance form bounds the
    # achievable zero here at ~1e-4 of the cloud scale — fine at mm scale.
    assert float(mean_d) < 1e-3
    assert float(min_d) < 1e-3


def test_add_score_translation(rng):
    model = rng.normal(size=(50, 3)).astype(np.float32) * 0.01
    rt = np.eye(4, dtype=np.float32)
    rt2 = rt.copy()
    rt2[:3, 3] += np.array([10.0, 0, 0], np.float32)  # far offset
    mean_d, min_d = metrics.add_score(jnp.asarray(model), rt, rt2)
    assert 9.9 < float(mean_d) < 10.1
    assert float(min_d) > 9.9


def test_auc_add_extremes():
    assert metrics.auc_add(np.zeros(10)) > 0.999
    assert metrics.auc_add(np.full(10, 1e9)) == 0.0
    # half the frames always correct -> AUC ~= 0.5
    d = np.concatenate([np.zeros(5), np.full(5, 1.0)])
    assert abs(metrics.auc_add(d) - 0.5) < 0.01


def test_add_accuracy():
    scores = jnp.asarray([0.01, 0.02, 0.5])
    assert abs(float(metrics.add_accuracy(scores, 0.05)) - 2 / 3) < 1e-6
