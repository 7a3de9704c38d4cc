"""Hier-vs-exact accumulator keypoint agreement over synthetic frames.

The hier mode trades reference-equivalent per-voxel vote parity for ~10x
less work (BENCH: 6.9 ms vs 68 ms per keypoint at grid 128, 8192 pts).
This script quantifies the thing that matters — does hier pick the same
keypoint as the exact (reference-semantics) mode? — over N random frames.

Two scene generators:
  single     clean surface patch + perfect radial labels (+5 mm noise on
             half the frames) — the easy regime.
  cluttered  the LMO regime the top-K ranking can actually miss: a
             half-plane-occluded object patch, 1-2 distractor blobs whose
             radial labels vote for their OWN (wrong) keypoints (competing
             basins, like sem false positives), plus a fraction of
             large-outlier radii.

Agreement is measured against the exact mode per frame: whatever the
reference landscape's argmax is, hier must reproduce it — exact IS the
ground truth here, even when clutter fools both.

Usage:
  python scripts/hier_exact_agreement.py [n_frames] [grid_l]
  python scripts/hier_exact_agreement.py [n_frames] [grid_l] --scene cluttered
  python scripts/hier_exact_agreement.py [n_frames] [grid_l] --sweep
      # sweeps hier knobs topk x cpt_stride over both scene types,
      # one JSON line per config (the PERF.md agreement table)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rcvpose_tpu.ops import voting  # noqa: E402


def _patch(rng, n, center, extent_scale=1.0, roughness=0.003):
    """Points on a random rough surface patch around ``center``."""
    u = rng.uniform(-1, 1, size=(n, 2)) * rng.uniform(0.02, 0.05) \
        * extent_scale
    normal = rng.normal(size=3)
    normal /= np.linalg.norm(normal)
    b1 = np.cross(normal, [1.0, 0, 0])
    b1 /= np.linalg.norm(b1) + 1e-9
    b2 = np.cross(normal, b1)
    bump = rng.normal(size=(n,)) * roughness
    return center + u[:, :1] * b1 + u[:, 1:] * b2 + bump[:, None] * normal


def synth_frame(rng, n_points=8192, noise_dm=0.0):
    """Single clean patch + keypoint + radial labels (dm)."""
    center = rng.uniform([-0.1, -0.1, 0.6], [0.1, 0.1, 1.0])
    pts = _patch(rng, n_points, center)
    kpt = center + rng.uniform(-0.06, 0.06, size=3)  # LINEMOD-like offsets
    radial_dm = np.linalg.norm(pts - kpt, axis=1) * 10.0
    if noise_dm:
        radial_dm = radial_dm + rng.normal(size=n_points) * noise_dm
    mask = np.ones(n_points, bool)
    return (jnp.asarray(pts, jnp.float32),
            jnp.asarray(radial_dm, jnp.float32), jnp.asarray(mask),
            kpt * 1000.0)


def synth_maskbleed_frame(rng, n_points=8192, noise_dm=0.05,
                          bleed_frac=0.15):
    """The realistic serving regime: one object whose sem mask bleeds onto
    background — ``bleed_frac`` of the points sit on a background plane
    ~10-30 cm behind the object carrying JUNK radial predictions (what a
    trained net emits on false-positive pixels), plus 5 mm radial noise on
    the object itself. Between 'single' (clean) and 'cluttered'
    (adversarial competing basins)."""
    center = rng.uniform([-0.1, -0.1, 0.6], [0.1, 0.1, 1.0])
    n_obj = int(n_points * (1.0 - bleed_frac))
    obj = _patch(rng, n_obj, center)
    kpt = center + rng.uniform(-0.06, 0.06, size=3)
    obj_r = np.linalg.norm(obj - kpt, axis=1) * 10.0

    n_bg = n_points - n_obj
    bg_center = center + np.array([0.0, 0.0, rng.uniform(0.1, 0.3)])
    bg = _patch(rng, n_bg, bg_center, extent_scale=2.0, roughness=0.001)
    # junk radii: uniform over the plausible prediction range
    bg_r = rng.uniform(0.1, obj_r.max() * 1.2, size=n_bg)

    pts = np.concatenate([obj, bg])[:n_points]
    radial_dm = np.concatenate([obj_r, bg_r])[:n_points]
    radial_dm = np.maximum(
        radial_dm + rng.normal(size=pts.shape[0]) * noise_dm, 0.0)
    mask = np.ones(pts.shape[0], bool)
    return (jnp.asarray(pts, jnp.float32),
            jnp.asarray(radial_dm, jnp.float32), jnp.asarray(mask),
            kpt * 1000.0)


def synth_cluttered_frame(rng, n_points=8192, noise_dm=0.05,
                          outlier_frac=0.05):
    """Occluded multi-blob scene with competing vote basins.

    ~55% of the budget is the true object, cut by a random half-plane
    (occlusion); the rest is 1-2 distractor blobs whose labels vote toward
    their own keypoints; ``outlier_frac`` of ALL radii get +-2 dm junk.
    """
    center = rng.uniform([-0.1, -0.1, 0.6], [0.1, 0.1, 1.0])
    n_obj = int(n_points * 0.55)
    obj = _patch(rng, 2 * n_obj, center)
    # occlusion: keep one side of a random half-plane through the center
    cut_n = rng.normal(size=3)
    cut_n /= np.linalg.norm(cut_n)
    keep = (obj - center) @ cut_n > rng.uniform(-0.01, 0.01)
    obj = obj[keep][:n_obj]
    kpt = center + rng.uniform(-0.06, 0.06, size=3)
    parts = [obj]
    labels = [np.linalg.norm(obj - kpt, axis=1) * 10.0]

    n_rest = n_points - obj.shape[0]
    n_blobs = int(rng.integers(1, 3))
    for b in range(n_blobs):
        nb = n_rest // n_blobs if b < n_blobs - 1 else \
            n_rest - (n_rest // n_blobs) * (n_blobs - 1)
        d_center = center + rng.uniform(-0.12, 0.12, size=3)
        blob = _patch(rng, nb, d_center, extent_scale=rng.uniform(0.5, 1.2))
        d_kpt = d_center + rng.uniform(-0.06, 0.06, size=3)
        parts.append(blob)
        labels.append(np.linalg.norm(blob - d_kpt, axis=1) * 10.0)

    pts = np.concatenate(parts)[:n_points]
    radial_dm = np.concatenate(labels)[:n_points]
    if noise_dm:
        radial_dm = radial_dm + rng.normal(size=pts.shape[0]) * noise_dm
    if outlier_frac:
        n_out = int(pts.shape[0] * outlier_frac)
        idx = rng.choice(pts.shape[0], n_out, replace=False)
        radial_dm[idx] += rng.uniform(-2.0, 2.0, size=n_out)
    radial_dm = np.maximum(radial_dm, 0.0)
    mask = np.ones(pts.shape[0], bool)
    return (jnp.asarray(pts, jnp.float32),
            jnp.asarray(radial_dm, jnp.float32), jnp.asarray(mask),
            kpt * 1000.0)


def run_suite(n_frames, grid_l, scene, topk=None, cpt_stride=None, seed=0,
              n_points=8192, win=None):
    rng = np.random.default_rng(seed)
    agree_voxel = 0
    dists = []
    err_ex, err_hi = [], []
    overflowed = 0
    for i in range(n_frames):
        if scene == "cluttered":
            pts, rad, mask, kpt_mm = synth_cluttered_frame(
                rng, n_points=n_points)
        elif scene == "maskbleed":
            pts, rad, mask, kpt_mm = synth_maskbleed_frame(
                rng, n_points=n_points)
        else:
            noise = 0.0 if i % 2 == 0 else 0.05  # half the frames: 5 mm noise
            pts, rad, mask, kpt_mm = synth_frame(rng, n_points=n_points,
                                                 noise_dm=noise)
        ex = voting.accumulate_3d(pts, rad, mask, grid_l=grid_l, mode="exact")
        hi = voting.accumulate_3d(pts, rad, mask, grid_l=grid_l, mode="hier",
                                  topk=topk, cpt_stride=cpt_stride, win=win)
        if bool(ex.overflow):
            overflowed += 1
            continue
        ce = np.asarray(ex.center_mm)
        ch = np.asarray(hi.center_mm)
        d = float(np.linalg.norm(ce - ch))
        dists.append(d)
        agree_voxel += d <= voting.ACC_UNIT_MM * np.sqrt(3) + 1e-6
        err_ex.append(float(np.linalg.norm(ce - kpt_mm)))
        err_hi.append(float(np.linalg.norm(ch - kpt_mm)))

    if not dists:
        return {"frames": 0, "grid_l": grid_l, "scene": scene,
                "overflowed": overflowed,
                "note": "every frame overflowed — grid_l too small"}
    dists = np.asarray(dists)
    return {
        "frames": len(dists),
        "grid_l": grid_l,
        "scene": scene,
        "topk": topk or voting._TOPK,
        "cpt_stride": cpt_stride or voting._CPT_STRIDE,
        "win": win or voting._WIN,
        "agree_within_1_voxel": round(float(agree_voxel / len(dists)), 4),
        "center_dist_mm_mean": round(float(dists.mean()), 3),
        "center_dist_mm_p95": round(float(np.percentile(dists, 95)), 3),
        "center_dist_mm_max": round(float(dists.max()), 3),
        "kpt_err_mm_exact_mean": round(float(np.mean(err_ex)), 3),
        "kpt_err_mm_hier_mean": round(float(np.mean(err_hi)), 3),
        "overflowed": overflowed,
    }


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_frames = int(args[0]) if args else 120
    grid_l = int(args[1]) if len(args) > 1 else 128
    scene = "single"
    if "--scene" in sys.argv:
        scene = sys.argv[sys.argv.index("--scene") + 1]

    if "--sweep" in sys.argv:
        for sc in ("single", "cluttered"):
            for topk in (2, 4, 8):
                for stride in (1, 4, 8):
                    print(json.dumps(run_suite(n_frames, grid_l, sc,
                                               topk=topk, cpt_stride=stride)),
                          flush=True)
        return

    if "--sweep-win" in sys.argv:
        # refine-window sweep: the true peak lies inside the winning coarse
        # cell, so a window just covering cell+margin should match WIN=16
        for sc in ("single", "cluttered"):
            for topk in (4, 8):
                for win in (8, 12, 16):
                    print(json.dumps(run_suite(n_frames, grid_l, sc,
                                               topk=topk, win=win)),
                          flush=True)
        return

    scenes = ("single", "cluttered") if scene == "both" else (scene,)
    for sc in scenes:
        print(json.dumps(run_suite(n_frames, grid_l, sc)), flush=True)


if __name__ == "__main__":
    main()
