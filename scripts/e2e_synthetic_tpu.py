"""End-to-end learning proof on real hardware: train -> serve -> ADD.

The environment has no LINEMOD/YCB data or pretrained checkpoints, so ADD(s)
parity with the reference cannot be measured directly (PARITY.md). This
script closes the largest remaining gap with a *self-contained* experiment
that exercises every production subsystem on a real accelerator:

  1. renders a synthetic asymmetric object (NOCS-style coordinate colors,
     z-buffered point splat) at random 6DoF poses,
  2. generates GT radial/semantic labels with the production label op
     (labels.radial_labels — the reference data_loader.py:68-114 semantics),
  3. trains the production DenseFCNResNet152 (full 3/8/36/3 depth) per
     keypoint with the production pjit Trainer (train.py),
  4. checkpoints with orbax and restores into a fresh state (round trip),
  5. recovers poses on held-out frames through the production serving path
     (infer.PoseEstimator: 3-net forward -> Pallas vote -> Horn -> ICP),
  6. scores ADD against the reference criterion (0.1 x object diameter,
     AccumulatorSpace.py:44-57) and prints one JSON line.

NOCS colors make radial regression well-posed from RGB alone: the radial
distance |p_obj - kpt_obj| is pose-invariant, so a converged net proves the
*pipeline* (labels -> training -> voting -> fit), not a rendering trick.

Run: python scripts/e2e_synthetic_tpu.py            (TPU, ~10 min)
     python scripts/e2e_synthetic_tpu.py --small    (CPU smoke, tiny net)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# Synthetic world
# ---------------------------------------------------------------------------

HALF_EXTENTS = np.array([0.03, 0.045, 0.06])  # m; asymmetric cuboid
DIAMETER_M = 2.0 * float(np.linalg.norm(HALF_EXTENTS))  # 0.1620 m
ADD_THRESHOLD_MM = 0.1 * DIAMETER_M * 1000.0            # reference criterion

# Keypoints: dispersed 2x-bbox corners, the reference's Outside9 fallback
# construction (rmap_dataset.py:43-51). Rows 1..3 are the trained keypoints.
KEYPOINTS_M = np.array([
    [0.0, 0.0, 0.0],                                   # row 0 unused (ref [1:4])
    [2 * 0.03, 2 * 0.045, 2 * 0.06],
    [-2 * 0.03, 2 * 0.045, -2 * 0.06],
    [2 * 0.03, -2 * 0.045, -2 * 0.06],
])


def make_object(rng, n_render=120_000, n_cad=3000):
    """Cuboid surface cloud (model frame, meters) + NOCS colors."""
    # sample faces proportionally to area
    areas = np.array([
        HALF_EXTENTS[1] * HALF_EXTENTS[2],
        HALF_EXTENTS[0] * HALF_EXTENTS[2],
        HALF_EXTENTS[0] * HALF_EXTENTS[1]]).repeat(2)
    p = areas / areas.sum()
    face = rng.choice(6, size=n_render, p=p)
    uv = rng.uniform(-1, 1, size=(n_render, 2))
    pts = np.empty((n_render, 3))
    for f in range(6):
        m = face == f
        axis = f // 2
        sign = 1.0 if f % 2 == 0 else -1.0
        others = [a for a in range(3) if a != axis]
        pts[m, axis] = sign * HALF_EXTENTS[axis]
        pts[m, others[0]] = uv[m, 0] * HALF_EXTENTS[others[0]]
        pts[m, others[1]] = uv[m, 1] * HALF_EXTENTS[others[1]]
    colors = ((pts / HALF_EXTENTS + 1.0) * 0.5 * 255.0).astype(np.uint8)
    cad = pts[rng.choice(n_render, size=n_cad, replace=False)]
    return pts, colors, cad


def random_pose(rng, z_range=(0.65, 0.95)):
    """Uniform-ish SO(3) rotation + bounded translation (m), (3, 4)."""
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    rot = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])
    t = np.array([rng.uniform(-0.04, 0.04), rng.uniform(-0.03, 0.03),
                  rng.uniform(*z_range)])
    return np.concatenate([rot, t[:, None]], axis=1)


def render_frame(pose, pts_m, colors, k, h, w):
    """Z-buffered point splat -> (rgb u8 (H,W,3), depth mm (H,W))."""
    cam = pts_m @ pose[:3, :3].T + pose[:3, 3]
    uvz = cam @ k.T
    us = np.round(uvz[:, 0] / uvz[:, 2]).astype(np.int64)
    vs = np.round(uvz[:, 1] / uvz[:, 2]).astype(np.int64)
    ok = (us >= 0) & (us < w) & (vs >= 0) & (vs < h) & (cam[:, 2] > 0)
    us, vs, z = us[ok], vs[ok], cam[ok, 2]
    lin = vs * w + us
    depth = np.full(h * w, np.inf, np.float32)
    np.minimum.at(depth, lin, z.astype(np.float32))
    # keep only the nearest splat's color per pixel
    keep = z <= depth[lin] + 1e-9
    rgb = np.zeros((h * w, 3), np.uint8)
    rgb[lin[keep]] = colors[ok][keep]
    depth[np.isinf(depth)] = 0.0
    return rgb.reshape(h, w, 3), (depth * 1000.0).reshape(h, w)


def build_dataset(rng, n_frames, pts_m, colors, k, h, w):
    poses, images, depths = [], [], []
    for _ in range(n_frames):
        pose = random_pose(rng)
        rgb, depth = render_frame(pose, pts_m, colors, k, h, w)
        poses.append(pose)
        images.append(rgb)
        depths.append(depth)
    return np.stack(poses), np.stack(images), np.stack(depths)


# ---------------------------------------------------------------------------
# Train + eval
# ---------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="CPU smoke: tiny net, tiny frames, few steps")
    ap.add_argument("--steps", type=int, default=None,
                    help="train steps per keypoint")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--fused", action="store_true",
                    help="train ONE multi-head net (kpt_heads=3) instead of "
                         "three per-keypoint nets")
    ap.add_argument("--fast-head", action="store_true", dest="fast_head",
                    help="conv7/conv8 head at H/2 + upsampled output "
                         "(validates the fast_head extension end to end)")
    ap.add_argument("--out", default="logs/e2e_synthetic")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: the full-model train-step compile costs
    # minutes on a single-core host; identical across reruns
    from rcvpose_tpu.utils import setup_script_cache
    setup_script_cache(cpu=args.small)

    from rcvpose_tpu import infer, labels, metrics, parallel
    from rcvpose_tpu import train as train_mod
    from rcvpose_tpu.checkpoint import Checkpointer
    from rcvpose_tpu.config import Config
    from rcvpose_tpu.ops.voting import suggest_grid_l

    small = args.small
    h, w = (64, 64) if small else (256, 320)  # H, W multiples of 32 (FCN)
    # LINEMOD optics scaled to the frame size (f=572.4 at 480x640)
    scale = w / 640.0
    k = np.array([[572.4114 * scale, 0.0, w / 2.0],
                  [0.0, 573.5704 * scale, h / 2.0],
                  [0.0, 0.0, 1.0]], np.float32)
    n_train = args.frames or (8 if small else 48)
    n_test = 2 if small else 8
    steps = args.steps or (2 if small else 600)
    batch = 2 if small else 8
    blocks, width = ((1, 1, 1, 1), 0.125) if small else (None, None)

    rng = np.random.default_rng(0)
    pts_m, colors, cad_m = make_object(rng)
    print(f"object: cuboid d={DIAMETER_M * 1000:.0f} mm, "
          f"ADD threshold {ADD_THRESHOLD_MM:.1f} mm", file=sys.stderr)

    t0 = time.time()
    poses, images, depths = build_dataset(
        rng, n_train + n_test, pts_m, colors, k, h, w)
    print(f"rendered {n_train + n_test} frames in {time.time() - t0:.1f} s",
          file=sys.stderr)

    # per-keypoint max radius, dataset-core convention (rmap_dataset.py:53-56)
    max_radii_dm = np.array([
        np.linalg.norm(cad_m - KEYPOINTS_M[i + 1], axis=1).max() * 10.0
        for i in range(3)], np.float32)

    heads = 3 if args.fused else 1
    cfg = Config(
        compute_dtype="float32" if small else "bfloat16",
        image_height=h, image_width=w, batch_size=batch,
        initial_lr=3e-4, max_iterations=steps, kpt_heads=heads,
        fast_head=args.fast_head)
    mesh = parallel.data_mesh(1)
    p_steps = train_mod.make_parallel_steps(mesh)

    # GT labels through the production op, batched on device
    label_fn = jax.jit(jax.vmap(
        lambda d, p, kp, mr: labels.radial_labels(
            d, (d > 0).astype(np.float32), p, kp, jnp.asarray(k), mr),
        in_axes=(0, 0, None, None)))
    images_norm = np.asarray(
        jax.jit(jax.vmap(labels.normalize_image))(images))

    def labels_for(kp_i):
        radial, sem = label_fn(
            jnp.asarray(depths), jnp.asarray(poses, jnp.float32),
            jnp.asarray(KEYPOINTS_M[kp_i + 1], jnp.float32),
            jnp.float32(max_radii_dm[kp_i]))
        return np.asarray(radial), np.asarray(sem)

    trained_vars = []
    steps_per_sec = None
    for kp_i in range(1 if args.fused else 3):
        if args.fused:
            # multi-head labels (N, H, W, 3): one (radial, sem) per keypoint
            per = [labels_for(i) for i in range(3)]
            radial_all = np.stack([p[0] for p in per], axis=-1)
            sem_all = np.stack([p[1] for p in per], axis=-1)
        else:
            radial_all, sem_all = labels_for(kp_i)

        # init at 64x64: conv/BN param shapes are spatial-size independent,
        # and the full-res init compile is minutes on a 1-core host
        state = train_mod.create_state(
            cfg, jax.random.PRNGKey(kp_i), steps_per_epoch=n_train // batch,
            blocks=blocks, width=width, sample_shape=(1, 64, 64, 3))

        def train_batches(epoch, kp_i=kp_i, radial=radial_all, sem=sem_all):
            order = np.random.default_rng(epoch * 7 + kp_i).permutation(
                n_train)
            for s in range(0, n_train - batch + 1, batch):
                idx = order[s:s + batch]
                yield {"image": jnp.asarray(images_norm[idx]),
                       "radial": jnp.asarray(radial[idx]),
                       "sem": jnp.asarray(sem[idx])}

        def val_batches(radial=radial_all, sem=sem_all):
            idx = np.arange(n_train, n_train + n_test)
            yield {"image": jnp.asarray(images_norm[idx]),
                   "radial": jnp.asarray(radial[idx]),
                   "sem": jnp.asarray(sem[idx])}

        # checkpointer only attached for the FINAL save: per-epoch orbax
        # saves of a 118M-param state would write hundreds of GB over a run
        tag = "fused" if args.fused else f"kpt{kp_i + 1}"
        ckpt = Checkpointer(os.path.join(args.out, tag))
        trainer = train_mod.Trainer(
            cfg=cfg, state=state, mesh=mesh, train_batches=train_batches,
            val_batches=val_batches, checkpointer=None, steps=p_steps)
        t0 = time.time()
        max_epochs = -(-steps * batch // n_train)
        trainer.fit(max_epochs=max_epochs)
        dt = time.time() - t0
        steps_per_sec = trainer.iteration / dt
        val = trainer.validate(max_epochs)
        ckpt.save(trainer.state, epoch=max_epochs,
                  iteration=trainer.iteration, best_val=val, is_best=False)
        ckpt.wait_until_finished()  # restored below — drain the async write
        print(f"{tag}: {trainer.iteration} steps in {dt:.1f} s "
              f"({steps_per_sec:.2f} steps/s), val loss {val:.4f}",
              file=sys.stderr)

        # orbax round trip: eval uses the RESTORED weights, not the live ones
        fresh = train_mod.create_state(
            cfg, jax.random.PRNGKey(99), steps_per_epoch=1,
            blocks=blocks, width=width, sample_shape=(1, 64, 64, 3))
        restored, _, _, _ = ckpt.restore(fresh)
        trained_vars.append({"params": restored.params,
                             "batch_stats": restored.batch_stats})

    # --- serve held-out frames through the production path ---
    grid_l = suggest_grid_l(DIAMETER_M, float(max_radii_dm.max()))
    eval_cfg = Config(
        compute_dtype=cfg.compute_dtype, image_height=h, image_width=w,
        vote_grid_l=min(grid_l, 96) if small else grid_l,
        max_points=1024 if small else 8192, sem_threshold=0.8,
        kpt_heads=heads, fast_head=args.fast_head)
    est = infer.PoseEstimator(
        eval_cfg, trained_vars, keypoints=KEYPOINTS_M,
        max_radii_dm=max_radii_dm, cad_mm=cad_m * 1000.0, k=k)
    est.model = train_mod.build_model(eval_cfg, blocks=blocks, width=width)

    cad_mm = jnp.asarray(cad_m * 1000.0, jnp.float32)
    adds_before, adds_after = [], []
    for i in range(n_train, n_train + n_test):
        out = est.estimate(images[i], depths[i])
        rt_gt_mm = poses[i].copy()
        rt_gt_mm[:, 3] *= 1000.0
        rt_gt_mm = jnp.asarray(
            np.vstack([rt_gt_mm, [0, 0, 0, 1]]), jnp.float32)
        add_bf = float(metrics.add_score(cad_mm, rt_gt_mm, out["rt"])[0])
        rt2 = est.refine(out, threshold_mm=max(add_bf, 5.0), icp_iters=30)
        add_af = float(metrics.add_score(cad_mm, rt_gt_mm, rt2)[0])
        adds_before.append(add_bf)
        adds_after.append(add_af)
        print(f"frame {i - n_train}: ADD {add_bf:.2f} -> {add_af:.2f} mm "
              f"(threshold {ADD_THRESHOLD_MM:.1f})", file=sys.stderr)

    adds_before = np.array(adds_before)
    adds_after = np.array(adds_after)
    pass_rate = float((adds_after <= ADD_THRESHOLD_MM).mean())
    record = {
        "metric": "e2e_synthetic_add_pass_rate",
        "value": pass_rate,
        "unit": "fraction",
        "add_threshold_mm": round(ADD_THRESHOLD_MM, 1),
        "mean_add_before_icp_mm": round(float(adds_before.mean()), 2),
        "mean_add_after_icp_mm": round(float(adds_after.mean()), 2),
        "max_add_after_icp_mm": round(float(adds_after.max()), 2),
        "train_steps_per_kpt": steps,
        "train_steps_per_sec": round(steps_per_sec or 0.0, 2),
        "frames": {"train": n_train, "test": n_test},
        "resolution": [h, w],
        "backend": jax.default_backend(),
        "kpt_heads": heads,
        "model": "DenseFCNResNet152"
                 + (" (tiny)" if small else " (full 3/8/36/3)")
                 + (" fused multi-head" if args.fused else ""),
    }
    print(json.dumps(record))
    return 0 if (small or pass_rate >= 0.75) else 1


if __name__ == "__main__":
    raise SystemExit(main())
