"""Learned LMO-pipeline proof: train -> Occlusion-LINEMOD tree -> evaluator.

Completes the evaluator-proof trio (LM serving: e2e_synthetic_tpu.py, YCB:
e2e_ycb_tpu.py): here the Occlusion-LINEMOD *evaluator* itself — noseg
frame paths, ``blender_poses/<class>/pose<N>.npy`` GT, missing-pose frame
skips, sem threshold 0.5, 30-iteration ICP, meter-valued eval ``.ply``
(reference AccumulatorSpace.py:742-974) — is driven end to end by a net the
production Trainer actually learned, not a fixture's random weights.

The LMO evaluator hardcodes the real LINEMOD intrinsics (reference
AccumulatorSpace.py:59-61), so frames are rendered under that K with
translations aimed so the object projects inside the (smaller) frame —
the same trick the format fixtures use (tests/test_eval_lmo_ycb_format.py).

Steps:
  1. render the e2e synthetic NOCS cuboid at aimed random poses,
  2. train ONE fused multi-head net (kpt_heads=3) with the production
     Trainer; orbax-checkpoint it where ``--mode test`` looks
     (``<model_dir>/<class>/``, eval._load_models),
  3. write the held-out frames as a real on-disk LMO tree
     (``OCCLUSION_LINEMOD/RGB-D/{rgb,depth}_noseg`` + ``blender_poses``,
     CAD as a meter-valued ascii ply + ``Outside9.npy`` under
     ``LINEMOD/<class>/`` — reference :769-784), plus one frame WITHOUT a
     pose file to exercise the reference's skip path (:813-822),
  4. run ``eval.estimate_6d_pose_lmo`` with ``using_ckpts=True`` and report
     the ADD pass fraction before/after ICP as one JSON line.

Run: python scripts/e2e_lmo_tpu.py          (TPU, ~15-30 min)
     python scripts/e2e_lmo_tpu.py --small  (CPU smoke, tiny net)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from e2e_fused_train import (  # noqa: E402
    per_kpt_max_radii_dm, setup_jax, train_fused_checkpoint)
from e2e_synthetic_tpu import (  # noqa: E402
    DIAMETER_M, KEYPOINTS_M, make_object, random_pose, render_frame)


def aimed_poses(rng, n_frames, k, px_range, py_range, z_range):
    """Random SO(3) rotations with translations aimed at a pixel window
    of the full-K image plane (tests/test_eval_lmo_ycb_format.py:58-64)."""
    poses = []
    for _ in range(n_frames):
        pose = random_pose(rng, z_range=z_range)
        z = pose[2, 3]
        px = rng.uniform(*px_range)
        py = rng.uniform(*py_range)
        pose[0, 3] = (px - k[0, 2]) / k[0, 0] * z
        pose[1, 3] = (py - k[1, 2]) / k[1, 1] * z
        poses.append(pose)
    return np.stack(poses)


def write_ascii_ply_m(path, pts_m):
    """Meter-valued ascii ply — the eval-path CAD convention
    (reference AccumulatorSpace.py:544-549, 663-667). Reuses the test
    fixtures' writer (repo root is on sys.path above)."""
    from tests.test_data import write_ascii_ply

    write_ascii_ply(path, pts_m)


def write_lmo_tree(root, class_name, cad_m, poses, images, depths):
    """Write frames as the reference's on-disk Occlusion-LINEMOD layout,
    plus one trailing frame with rgb+depth but NO pose file (the evaluator
    must skip it, reference AccumulatorSpace.py:813-822)."""
    from PIL import Image

    pv = os.path.join(root, "LINEMOD", class_name)
    os.makedirs(pv, exist_ok=True)
    write_ascii_ply_m(os.path.join(pv, f"{class_name}.ply"), cad_m)
    kpts9 = np.zeros((9, 3))
    kpts9[:KEYPOINTS_M.shape[0]] = KEYPOINTS_M
    np.save(os.path.join(pv, "Outside9.npy"), kpts9)

    occ = os.path.join(root, "OCCLUSION_LINEMOD")
    rgb_dir = os.path.join(occ, "RGB-D", "rgb_noseg")
    depth_dir = os.path.join(occ, "RGB-D", "depth_noseg")
    pose_dir = os.path.join(occ, "blender_poses", class_name)
    for d in (rgb_dir, depth_dir, pose_dir):
        os.makedirs(d, exist_ok=True)
    for i, (img, depth_mm) in enumerate(zip(images, depths)):
        Image.fromarray(img).save(
            os.path.join(rgb_dir, f"color_{i:05d}.png"))
        depth_u16 = np.round(depth_mm).astype(np.uint16)
        Image.fromarray(depth_u16.astype(np.int32)).save(
            os.path.join(depth_dir, f"depth_{i:05d}.png"))
        if i < len(poses):  # the extra frame gets no pose -> skipped
            np.save(os.path.join(pose_dir, f"pose{i}.npy"),
                    np.asarray(poses[i], np.float64))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--model_width", type=float, default=None,
                    help="override the net width fraction (e.g. 0.5 for a "
                         "CPU-learnable mid-size run)")
    ap.add_argument("--model_blocks", default=None,
                    help="override encoder block counts, e.g. '2,4,6,2'")
    ap.add_argument("--test_frames", type=int, default=None)
    ap.add_argument("--max_points", type=int, default=None,
                    help="vote point budget override (small default 1024 "
                         "can truncate large masks)")
    ap.add_argument("--out", default="logs/e2e_lmo")
    args = ap.parse_args()
    args.out = os.path.abspath(args.out)

    import jax

    setup_jax(args.small)

    from rcvpose_tpu import eval as eval_mod
    from rcvpose_tpu import geometry
    from rcvpose_tpu.config import Config
    from rcvpose_tpu.ops.voting import suggest_grid_l

    small = args.small
    # frames live in the top-left (h, w) window of the full-K image plane;
    # aim window keeps the ~0.08 m object radius fully inside at these z
    k = np.asarray(geometry.LINEMOD_K, np.float32)
    if small:
        h, w = 128, 160
        px_range, py_range, z_range = (48, 112), (48, 80), (1.2, 1.5)
    else:
        h, w = 256, 320
        px_range, py_range, z_range = (80, 240), (80, 176), (0.78, 1.0)
    n_train = args.frames or (8 if small else 48)
    n_test = args.test_frames or (2 if small else 8)
    steps = args.steps or (2 if small else 600)
    batch = 2 if small else 8
    arch = dict(model_blocks="1,1,1,1", model_width=0.125) if small else {}
    if args.model_width is not None:
        arch["model_width"] = args.model_width
    if args.model_blocks is not None:
        arch["model_blocks"] = args.model_blocks
    class_name = "ape"  # any LMO class; CAD/keypoints are synthetic anyway

    rng = np.random.default_rng(1)
    pts_m, colors, cad_m = make_object(rng)
    poses = aimed_poses(rng, n_train + n_test + 1, k,
                        px_range, py_range, z_range)
    frames = [render_frame(p, pts_m, colors, k, h, w) for p in poses]
    images = np.stack([f[0] for f in frames])
    depths = np.stack([f[1] for f in frames])

    max_radii_dm = per_kpt_max_radii_dm(cad_m, KEYPOINTS_M)

    # --- train the fused net (shared recipe, e2e_fused_train.py) ---
    cfg = Config(compute_dtype="float32" if small else "bfloat16",
                 image_height=h, image_width=w, batch_size=batch,
                 initial_lr=3e-4, max_iterations=steps, kpt_heads=3, **arch)
    model_dir = os.path.join(args.out, "ckpts")
    train_fused_checkpoint(cfg, images, depths, poses, KEYPOINTS_M,
                           max_radii_dm, k, n_train,
                           os.path.join(model_dir, class_name))

    # --- write held-out frames (+1 poseless frame) as a real LMO tree ---
    ds_root = os.path.join(args.out, "dataset")
    sl = slice(n_train, n_train + n_test + 1)
    write_lmo_tree(ds_root, class_name, cad_m,
                   poses[n_train:n_train + n_test],
                   images[sl], depths[sl])

    # --- drive the production LMO evaluator from the orbax checkpoint ---
    grid_l = suggest_grid_l(DIAMETER_M, float(max_radii_dm.max()))
    eval_cfg = Config(
        dataset="lmo", root_dataset=ds_root, model_dir=model_dir,
        using_ckpts=True, kpt_heads=3, **arch,
        compute_dtype=cfg.compute_dtype,
        vote_grid_l=min(grid_l, 96) if small else grid_l,
        max_points=args.max_points or (1024 if small else 8192))
    results = eval_mod.estimate_6d_pose_lmo(eval_cfg,
                                            class_names=[class_name],
                                            progress=lambda s: print(
                                                s, file=sys.stderr))
    res = results[class_name]
    record = {
        "metric": "e2e_lmo_add_after_icp",
        "value": round(float(res["add_after_icp"]), 4),
        "unit": "pass_fraction",
        "add_before_icp": round(float(res["add_before_icp"]), 4),
        "frames": res["frames"],
        "frames_written": n_test + 1,  # one poseless frame must be skipped
        "train_steps": steps,
        "resolution": [h, w],
        "backend": jax.default_backend(),
        "class": class_name,
        "model": "DenseFCNResNet152 fused multi-head"
                 + (" (tiny)" if small else " (full 3/8/36/3)"),
    }
    print(json.dumps(record))
    # --small is a plumbing smoke (2-step tiny net learns nothing): assert
    # the evaluator consumed exactly the posed frames (skip path exercised);
    # the TPU run asserts real accuracy
    ok = (res["frames"] == n_test if small
          else res["add_after_icp"] >= 0.85)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
