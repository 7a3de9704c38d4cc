"""Synthetic end-to-end integration test: one frame with a known pose.

Builds a synthetic object (point blob), renders a depth map + perfect radial
GT maps for 3 keypoints, then drives the full on-device eval path —
keypoint_from_maps -> Horn -> ADD -> ICP — and checks the recovered pose.
This is the test the reference never had (SURVEY.md §4).
"""

import numpy as np
import jax.numpy as jnp

from rcvpose_tpu import eval as eval_mod
from rcvpose_tpu import geometry, labels
from tests.test_geometry import random_pose


def render_synthetic_frame(rng, h=192, w=256):
    # focal length chosen so pixel-quantization noise at z~0.8 m is ~1.3 mm,
    # comparable to real LINEMOD optics (f=572 at 480x640)
    k = np.array([[300.0, 0, w / 2], [0, 300.0, h / 2], [0, 0, 1]])
    pose = random_pose(rng)          # object -> camera, translation in m
    # object model: blob of points on a sphere surface (radius 4 cm)
    n_model = 4000
    dirs = rng.normal(size=(n_model, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    model_m = dirs * rng.uniform(0.03, 0.04, size=(n_model, 1))
    # keypoints: dispersed, like 2x bbox corners (meters, model frame)
    kpts_m = np.array([[0.08, 0.08, 0.08],
                       [-0.08, 0.08, -0.08],
                       [0.08, -0.08, -0.08]])

    cam_m = model_m @ pose[:3, :3].T + pose[:3, 3]
    uv = cam_m @ k.T
    uv = uv[:, :2] / uv[:, 2:]
    us = np.round(uv[:, 0]).astype(int)
    vs = np.round(uv[:, 1]).astype(int)
    ok = (us >= 0) & (us < w) & (vs >= 0) & (vs < h)
    us, vs = us[ok], vs[ok]
    depth_mm = np.zeros((h, w), np.float32)
    # z of the *pixel ray* consistent back-projection: use point z directly
    depth_mm[vs, us] = cam_m[ok, 2] * 1000.0

    # perfect radial maps (dm) for each keypoint from the true geometry
    radials = []
    kpts_cam = kpts_m @ pose[:3, :3].T + pose[:3, 3]
    xyz_map, valid = geometry.backproject_dense(depth_mm, k)
    xyz_m = np.asarray(xyz_map) / 1000.0
    for kc in kpts_cam:
        r = np.linalg.norm(xyz_m - kc, axis=-1) * 10.0
        radials.append(np.where(np.asarray(valid), r, 0.0).astype(np.float32))
    return k, pose, model_m, kpts_m, depth_mm, radials


def test_full_frame_pose_recovery(rng):
    k, pose, model_m, kpts_m, depth_mm, radials = render_synthetic_frame(rng)
    est_kpts = np.zeros((3, 3))
    scene_parts, scene_masks = [], []
    for i in range(3):
        sem = (radials[i] > 0).astype(np.float32)
        center, overflow, count, pts_mm, mask = eval_mod.keypoint_from_maps(
            jnp.asarray(sem), jnp.asarray(radials[i]),
            jnp.asarray(depth_mm), jnp.asarray(k, jnp.float32),
            jnp.float32(100.0), jnp.float32(0.5),
            n_points=1024, grid_l=96, mode="hier")
        assert not bool(overflow)
        assert int(count) > 50  # pixel collisions shrink the rendered blob
        est_kpts[i] = np.asarray(center)
        scene_parts.append(pts_mm)
        scene_masks.append(mask)

    # keypoints should land within ~1 voxel (5 mm) + quantization of truth
    kpts_cam_mm = (kpts_m @ pose[:3, :3].T + pose[:3, 3]) * 1000.0
    kpt_err = np.linalg.norm(est_kpts - kpts_cam_mm, axis=1)
    assert kpt_err.max() < 12.0, kpt_err

    rt_gt_mm = pose.copy()
    rt_gt_mm[:, 3] *= 1000.0
    cad_mm = jnp.asarray(model_m * 1000.0, jnp.float32)
    rt, score_bf = eval_mod.pose_and_add(
        jnp.asarray(kpts_m * 1000.0, jnp.float32),
        jnp.asarray(est_kpts, jnp.float32),
        cad_mm, jnp.asarray(rt_gt_mm, jnp.float32), False)
    # ADD before ICP should already be small relative to object size (~70 mm)
    assert float(score_bf) < 15.0, float(score_bf)

    scene = jnp.concatenate(scene_parts)
    scene_mask = jnp.concatenate(scene_masks)
    rt2, score_af = eval_mod.refine_and_add(
        rt, cad_mm, scene, scene_mask, jnp.asarray(rt_gt_mm, jnp.float32),
        False, jnp.maximum(score_bf, 1.0), icp_iters=15)
    assert float(score_af) <= float(score_bf) + 1e-3
    assert float(score_af) < 10.0, float(score_af)


def test_e2e_ycb_pipeline_smoke(tmp_path):
    """Plumbing smoke of scripts/e2e_ycb_tpu.py --small: production Trainer
    -> orbax fused checkpoint -> real on-disk YCB tree -> the production
    YCB evaluator consumes every frame and emits the AUC JSON line. (The
    2-step tiny net learns nothing; accuracy is asserted by the full TPU
    run recorded in E2E.md.)"""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "e2e_ycb_tpu.py"),
         "--small", "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=540, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-2000:]
    record = json.loads(proc.stdout.strip().splitlines()[-1])
    assert record["frames"] == 2
    assert record["metric"] == "e2e_ycb_adds_auc_after_icp"


def test_e2e_lmo_pipeline_smoke(tmp_path):
    """Plumbing smoke of scripts/e2e_lmo_tpu.py --small: production Trainer
    -> orbax fused checkpoint -> real on-disk Occlusion-LINEMOD tree -> the
    production LMO evaluator consumes exactly the posed frames (the
    poseless frame exercises the reference's skip path) and emits the JSON
    line. (The 2-step tiny net learns nothing; accuracy is asserted by the
    full TPU run recorded in E2E.md.)"""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "e2e_lmo_tpu.py"),
         "--small", "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=540, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-2000:]
    record = json.loads(proc.stdout.strip().splitlines()[-1])
    assert record["frames"] == 2          # 3 written, 1 poseless skipped
    assert record["frames_written"] == 3
    assert record["metric"] == "e2e_lmo_add_after_icp"


def test_serving_latency_pipeline_smoke(tmp_path):
    """Plumbing smoke of scripts/bench_serving_latency.py --small: open-loop
    Poisson load against the real PoseEstimator host path emits one JSON
    line with a sane latency distribution (percentiles ordered, queueing
    counted). Real numbers come from the TPU run recorded in PERF.md."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable,
         os.path.join(repo, "scripts", "bench_serving_latency.py"),
         "--small", "--n", "6"],
        capture_output=True, text=True, timeout=540, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-2000:]
    record = json.loads(proc.stdout.strip().splitlines()[-1])
    assert record["metric"] == "serving_latency_p99_ms"
    assert 0 < record["p50_ms"] <= record["p95_ms"] <= record["p99_ms"]
    assert record["capacity_rps"] > 0
    assert record["n_requests"] == 6


def test_overflow_retry_pipeline_smoke():
    """Plumbing smoke of scripts/e2e_overflow_retry_tpu.py --small: a
    mask-noise outlier frame overflows the class grid, routes through the
    sequential grid-retry (eval.keypoint_with_retry), and both frames
    still score through the full evaluator. Hardware numbers come from
    the TPU run recorded in E2E.md."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable,
         os.path.join(repo, "scripts", "e2e_overflow_retry_tpu.py"),
         "--small"],
        capture_output=True, text=True, timeout=1200, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-2000:]
    record = json.loads(proc.stdout.strip().splitlines()[-1])
    assert record["metric"] == "overflow_retry_warm_ms_per_kpt"
    assert record["frames"] == 2
    assert record["eval_add_after_icp"] == 1.0
