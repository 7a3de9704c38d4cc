"""Hier-vs-exact accumulator keypoint agreement over synthetic frames.

The hier mode trades reference-equivalent per-voxel vote parity for ~10x
less work (BENCH: 6.9 ms vs 68 ms per keypoint at grid 128, 8192 pts).
This script quantifies the thing that matters — does hier pick the same
keypoint? — over N random synthetic frames: surface-patch clouds with
perfect radial labels plus optional radial noise.

Usage: python scripts/hier_exact_agreement.py [n_frames] [grid_l]
Prints one JSON line with agreement stats.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rcvpose_tpu.ops import voting  # noqa: E402


def synth_frame(rng, n_points=8192, noise_dm=0.0):
    """Random camera-frame surface patch + keypoint + radial labels (dm)."""
    # patch: points on a random smooth surface region ~10-20 cm across
    center = rng.uniform([-0.1, -0.1, 0.6], [0.1, 0.1, 1.0])
    u = rng.uniform(-1, 1, size=(n_points, 2)) * rng.uniform(0.02, 0.05)
    normal = rng.normal(size=3)
    normal /= np.linalg.norm(normal)
    b1 = np.cross(normal, [1.0, 0, 0])
    b1 /= np.linalg.norm(b1) + 1e-9
    b2 = np.cross(normal, b1)
    bump = rng.normal(size=(n_points,)) * 0.003  # 3 mm surface roughness
    pts = (center + u[:, :1] * b1 + u[:, 1:] * b2
           + bump[:, None] * normal)
    kpt = center + rng.uniform(-0.06, 0.06, size=3)  # LINEMOD-like offsets
    radial_dm = np.linalg.norm(pts - kpt, axis=1) * 10.0
    if noise_dm:
        radial_dm = radial_dm + rng.normal(size=n_points) * noise_dm
    mask = np.ones(n_points, bool)
    return (jnp.asarray(pts, jnp.float32),
            jnp.asarray(radial_dm, jnp.float32), jnp.asarray(mask),
            kpt * 1000.0)


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    grid_l = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    rng = np.random.default_rng(0)

    agree_voxel = 0
    dists = []
    err_ex, err_hi = [], []
    overflowed = 0
    for i in range(n_frames):
        noise = 0.0 if i % 2 == 0 else 0.05  # half the frames: 5 mm noise
        pts, rad, mask, kpt_mm = synth_frame(rng, noise_dm=noise)
        ex = voting.accumulate_3d(pts, rad, mask, grid_l=grid_l, mode="exact")
        hi = voting.accumulate_3d(pts, rad, mask, grid_l=grid_l, mode="hier")
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

    dists = np.asarray(dists)
    print(json.dumps({
        "frames": len(dists),
        "grid_l": grid_l,
        "agree_within_1_voxel": round(float(agree_voxel / len(dists)), 4),
        "center_dist_mm_mean": round(float(dists.mean()), 3),
        "center_dist_mm_p95": round(float(np.percentile(dists, 95)), 3),
        "center_dist_mm_max": round(float(dists.max()), 3),
        "kpt_err_mm_exact_mean": round(float(np.mean(err_ex)), 3),
        "kpt_err_mm_hier_mean": round(float(np.mean(err_hi)), 3),
        "overflowed": overflowed,
    }))


if __name__ == "__main__":
    main()
