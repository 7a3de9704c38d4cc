"""Pose-accuracy metrics: ADD / ADD-S, pass rates, and AUC — pure jnp.

The reference computes these through Open3D's native
``compute_point_cloud_distance`` (nearest-neighbor distances between the CAD
model under the GT transform and under the estimated transform,
AccumulatorSpace.py:687-695) and sklearn's ``auc`` (AccumulatorSpace.py:978,
1144-1152). Models are a few thousand points, so a brute-force pairwise
reduction is trivial MXU work on TPU and keeps the whole eval pipeline on
device.

Semantics matched to the reference:
* asymmetric objects: score = *mean* NN distance from the GT cloud to the
  estimated cloud (note: NN, not index-paired — this is the executed
  reference behavior, slightly more lenient than textbook ADD);
* symmetric objects (ADD-S): score = *min* NN distance
  (AccumulatorSpace.py:687-688) — again the reference's executed behavior,
  not the textbook mean-of-NN ADD-S;
* a pose counts as correct when score <= threshold (0.1 x model diameter for
  LINEMOD; 1% of bbox diagonal for YCB);
* YCB reports AUC of the accuracy-vs-threshold curve over [0, 0.1 m],
  normalized by 0.1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def nn_distances(a, b, b_mask=None):
    """For each point in ``a``, distance to its nearest neighbor in ``b``."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    d2 = (jnp.sum(a * a, axis=1)[:, None]
          - 2.0 * jnp.matmul(a, b.T, precision=jax.lax.Precision.HIGHEST)
          + jnp.sum(b * b, axis=1)[None, :])
    if b_mask is not None:
        d2 = jnp.where(b_mask[None, :], d2, jnp.float32(1e30))
    return jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 0.0))


@jax.jit
def add_score(model_pts, rt_gt, rt_est):
    """(mean_nn, min_nn) distances between the model under GT and estimated
    transforms — the reference's ADD / ADD-S pair in one pass."""
    gt = model_pts @ rt_gt[:3, :3].T + rt_gt[:3, 3]
    est = model_pts @ rt_est[:3, :3].T + rt_est[:3, 3]
    d = nn_distances(gt, est)
    return jnp.mean(d), jnp.min(d)


def add_accuracy(scores, threshold):
    """Fraction of frames with score <= threshold."""
    scores = jnp.asarray(scores)
    return jnp.mean((scores <= threshold).astype(jnp.float32))


def auc_add(distances, max_threshold=0.1, steps=1000, thresholds=None):
    """AUC of accuracy over thresholds [0, max_threshold], normalized.

    NumPy implementation of the reference's sklearn-based computation
    (AccumulatorSpace.py:1144-1152, 1183-1195): accuracy(t) evaluated on a
    threshold sweep, trapezoid-integrated and divided by max_threshold. Pass
    ``thresholds=[0, 0.02, 0.04, 0.06, 0.08, 0.1]`` (meters) for the exact
    reference YCB grid (AccumulatorSpace.py:978).
    """
    d = np.asarray(distances, np.float64)
    if thresholds is not None:
        ts = np.asarray(thresholds, np.float64)
        max_threshold = ts[-1]
    else:
        ts = np.linspace(0.0, max_threshold, steps)
    acc = (d[None, :] <= ts[:, None]).mean(axis=1)
    return float(np.trapezoid(acc, ts) / max_threshold)
