"""Drive the LMO and YCB evaluators over real-format synthetic trees.

Completes the dataset-layout IO coverage started by
tests/test_eval_lm_format.py: OCCLUSION_LINEMOD noseg pngs + blender_poses
(+ the missing-pose frame skip, reference AccumulatorSpace.py:813-822) and
the YCB layout (per-class HDF5, .mat metadata, factor_depth-scaled depth
pngs, AUC summary, reference :976-1197).
"""

import os

import numpy as np
import pytest
from PIL import Image

from rcvpose_tpu import geometry
from rcvpose_tpu.config import Config
from tests.test_data import write_ascii_ply


def _blob(rng, n=2000, r_lo=0.02, r_hi=0.03):
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return dirs * rng.uniform(r_lo, r_hi, size=(n, 1))


KPTS9 = np.zeros((9, 3))
KPTS9[1] = [0.06, 0.06, 0.06]
KPTS9[2] = [-0.06, 0.06, -0.06]
KPTS9[3] = [0.06, -0.06, -0.06]


def _render(model_m, rot, t, k, h, w):
    cam = model_m @ rot.T + t
    uv = cam @ k.T
    uv = uv[:, :2] / uv[:, 2:]
    us = np.round(uv[:, 0]).astype(int)
    vs = np.round(uv[:, 1]).astype(int)
    ok = (us >= 0) & (us < w) & (vs >= 0) & (vs < h)
    depth_mm = np.zeros((h, w), np.float32)
    depth_mm[vs[ok], us[ok]] = cam[ok, 2] * 1000.0
    return depth_mm


def _radials(depth_mm, rot, t, k):
    xyz_map, valid = geometry.backproject_dense(
        depth_mm.astype(np.float32), np.asarray(k))
    xyz_m = np.asarray(xyz_map) / 1000.0
    valid = np.asarray(valid)
    kpts_cam = KPTS9[1:4] @ rot.T + t
    out = []
    for i in range(3):
        r = np.linalg.norm(xyz_m - kpts_cam[i], axis=-1) * 10.0
        out.append(np.where(valid, r, 0.0).astype(np.float32))
    return out


def _pose_at_pixel(rng, k, px, py, z):
    angle = rng.uniform(-0.3, 0.3)
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    t = np.array([(px - k[0, 2]) / k[0, 0] * z,
                  (py - k[1, 2]) / k[1, 1] * z, z])
    return rot, t


def test_estimate_6d_pose_lmo_real_format(tmp_path, rng):
    from rcvpose_tpu import eval as eval_mod

    k = np.asarray(geometry.LINEMOD_K)
    h, w = 120, 160
    root = tmp_path
    model_m = _blob(rng)

    pv = root / "LINEMOD" / "ape"
    os.makedirs(pv)
    write_ascii_ply(str(pv / "ape.ply"), model_m)  # meters (see LM fixture)
    np.save(pv / "Outside9.npy", KPTS9)

    occ = root / "OCCLUSION_LINEMOD"
    os.makedirs(occ / "RGB-D" / "rgb_noseg")
    os.makedirs(occ / "RGB-D" / "depth_noseg")
    os.makedirs(occ / "blender_poses" / "ape")
    for kp in range(1, 4):
        os.makedirs(occ / "estRadialMap" / "ape" / f"Out_pt{kp}_dm")

    # frame 0: full fixture; frame 1: rgb+depth but NO pose -> must be
    # skipped (reference AccumulatorSpace.py:813-822)
    for i in range(2):
        img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            occ / "RGB-D" / "rgb_noseg" / f"color_{i:05d}.png")
        rot, t = _pose_at_pixel(rng, k, 80, 60, 0.75)
        depth_mm = _render(model_m, rot, t, k, h, w)
        depth_u16 = np.round(depth_mm).astype(np.uint16)
        Image.fromarray(depth_u16.astype(np.int32)).save(
            occ / "RGB-D" / "depth_noseg" / f"depth_{i:05d}.png")
        if i == 0:
            pose = np.concatenate([rot, t[:, None]], axis=1)
            np.save(occ / "blender_poses" / "ape" / f"pose{i}.npy", pose)
            for kp, radial in enumerate(
                    _radials(depth_u16.astype(np.float32), rot, t, k), 1):
                np.save(occ / "estRadialMap" / "ape" / f"Out_pt{kp}_dm"
                        / f"_{i:05d}.npy", radial)

    cfg = Config(root_dataset=str(root), using_ckpts=False,
                 compute_dtype="float32", vote_grid_l=96, max_points=2048,
                 vote_mode="hier", demo_mode=True,
                 out_dir=str(root / "out"), eval_data_parallel=False)
    lines = []
    results = eval_mod.estimate_6d_pose_lmo(
        cfg, class_names=["ape"], progress=lines.append)
    res = results["ape"]
    assert res["frames"] == 1  # frame 1 skipped (no pose)
    assert res["add_before_icp"] == 1.0, res
    assert res["add_after_icp"] == 1.0, res
    assert any("(occ)" in ln for ln in lines)
    # per-stage timers reported like the LM loop (reference :826-831, :862)
    assert res["acc_ms_per_frame"] > 0
    assert any("per-frame time" in ln for ln in lines)
    # offline dataset eval defaults to the saturated vote knob
    assert res["vote_topk"] == 64
    # demo overlays written by the LMO loop too (reference :899-948)
    assert os.path.isfile(
        root / "out" / "demo_lmo" / "ape" / "00000_overlay.png")

    # data-parallel sweep over the 8-virtual-device mesh: same per-class
    # ADD, same pose-skip, overlays still written (VERDICT r2 item 2)
    import dataclasses
    cfg_dp = dataclasses.replace(cfg, eval_data_parallel=True,
                                 out_dir=str(root / "out_dp"))
    dp = eval_mod.estimate_6d_pose_lmo(
        cfg_dp, class_names=["ape"], progress=lambda *_: None)["ape"]
    assert dp["frames"] == 1
    assert dp["add_before_icp"] == res["add_before_icp"]
    assert dp["add_after_icp"] == res["add_after_icp"]
    assert os.path.isfile(
        root / "out_dp" / "demo_lmo" / "ape" / "00000_overlay.png")


YCB_FIXTURE_CLASS = (1, "002_master_chef_can")


def make_ycb_eval_tree(root, rng, n_frames=1, h=120, w=160):
    """Synthetic YCB-Video tree in the exact layout the evaluator reads
    (per-class HDF5, .mat metadata, factor_depth-scaled depth pngs), plus
    exact radial maps saved under ``exact_radials/`` so a separate process
    (the multi-host eval smoke) can rebuild the ExactMaps injection seam
    from disk. Returns the (class_id, class_name) of the one class."""
    import h5py
    import scipy.io

    root = str(root)
    class_id, class_name = YCB_FIXTURE_CLASS
    k = np.array([[300.0, 0, w / 2], [0, 300.0, h / 2], [0, 0, 1.0]])
    factor_depth = 10000.0
    model_m = _blob(rng)

    mdir = os.path.join(root, "models", class_name)
    os.makedirs(mdir)
    np.savetxt(os.path.join(mdir, "points.xyz"), model_m)
    np.save(os.path.join(mdir, "Outside9.npy"), KPTS9)
    os.makedirs(os.path.join(root, "Split", class_name))
    os.makedirs(os.path.join(root, "exact_radials"))

    cycle = "0000"
    os.makedirs(os.path.join(root, "data", cycle))
    ids = []
    with h5py.File(os.path.join(root, f"{class_name}.hdf5"), "w") as f:
        for i in range(n_frames):
            idx = f"{i + 1:06d}"
            rot, t = _pose_at_pixel(rng, k, 80, 60, 0.75 + 0.04 * i)
            depth_mm = _render(model_m, rot, t, k, h, w)
            depth_u16 = np.round(
                depth_mm / 1000.0 * factor_depth).astype(np.uint16)
            Image.fromarray(depth_u16.astype(np.int32)).save(
                os.path.join(root, "data", cycle, f"{idx}-depth.png"))
            img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(root, "data", cycle, f"{idx}-color.png"))
            scipy.io.savemat(os.path.join(root, "data", cycle, f"{idx}.mat"), {
                "poses": np.concatenate([rot, t[:, None]], axis=1)[:, :, None],
                "cls_indexes": np.array([[class_id]]),
                "factor_depth": np.array([[factor_depth]]),
                "intrinsic_matrix": k,
            })
            f.create_dataset(f"JPEGImages/{cycle}_{idx}", data=img,
                             compression="gzip")
            # exact radial maps from the depth the evaluator will see
            depth_seen = depth_u16.astype(np.float32) / factor_depth * 1000.0
            for kp, radial in enumerate(_radials(depth_seen, rot, t, k), 1):
                np.save(os.path.join(root, "exact_radials",
                                     f"{cycle}_{idx}_pt{kp}.npy"), radial)
                # the per-keypoint radial datasets the TRAINING path reads
                # (reference 3DRadius_ycb.py:200-253) — makes the fixture
                # tree trainable (YcbDataset / fused kpt_heads > 1)
                f.create_dataset(f"3Dradius_pt{kp}_dm/{cycle}_{idx}",
                                 data=radial, compression="gzip")
            ids.append(f"{cycle}_{idx}")
    split = "\n".join(ids) + "\n"
    with open(os.path.join(root, "Split", class_name, "val.txt"), "w") as f:
        f.write(split)  # eval layout (AccumulatorSpace.py:996-1001)
    os.makedirs(os.path.join(root, class_name, "Split"), exist_ok=True)
    with open(os.path.join(root, class_name, "Split", "val.txt"), "w") as f:
        f.write(split)  # training layout (rmap_dataset.py:31-38)
    return class_id, class_name


class ExactMapsFromDisk:
    """map_source_factory reading the fixture's exact radial maps from
    ``<root>/exact_radials/`` (YCB has no precomputed-map branch in the
    evaluator itself — reference AccumulatorSpace.py:1044 — this is the
    test injection seam)."""

    def __init__(self, cfg, cname):
        self._dir = os.path.join(cfg.root_dataset, "exact_radials")

    def maps(self, kp, image_u8, frame_id, lmo=False):
        import jax.numpy as jnp
        radial = np.load(os.path.join(self._dir, f"{frame_id}_pt{kp}.npy"))
        return (jnp.asarray((radial != 0).astype(np.float32)),
                jnp.asarray(radial))


def test_estimate_6d_pose_ycb_real_format(tmp_path, rng):
    from rcvpose_tpu import eval as eval_mod

    root = tmp_path
    class_id, class_name = make_ycb_eval_tree(root, rng, n_frames=1)
    cycle, idx = "0000", "000001"
    ExactMaps = ExactMapsFromDisk

    cfg = Config(root_dataset=str(root), using_ckpts=True, dataset="ycb",
                 compute_dtype="float32", vote_grid_l=96, max_points=2048,
                 vote_mode="hier", icp_iters=10, demo_mode=True,
                 out_dir=str(root / "out"), eval_data_parallel=False)
    lines = []
    results = eval_mod.estimate_6d_pose_ycb(
        cfg, class_ids=[class_id], progress=lines.append,
        map_source_factory=ExactMaps)
    res = results["all"]
    assert res["frames"] == 1
    # the 1%-of-bbox-diagonal pass threshold (~0.9 mm for this object) is
    # below the 5 mm voxel quantization by design, so assert on the AUC
    # (reference's headline YCB metric) instead of the pass rate
    assert res["adds_auc_before_icp"] >= 0.8, res
    assert res["adds_auc_after_icp"] >= res["adds_auc_before_icp"] - 1e-6
    assert any("AUC" in ln for ln in lines)
    # per-stage timers reported (reference plumbs net/acc in the YCB loop
    # too, :1043-1047, :1066-1070) + the saturated offline vote knob
    assert res["acc_ms_per_frame"] > 0
    assert any("per-frame time" in ln for ln in lines)
    assert res["vote_topk"] == 64
    # demo overlays written by the YCB loop (reference :1121-1171)
    assert os.path.isfile(root / "out" / "demo_ycb" / class_name
                          / f"{cycle}_{idx}_overlay.png")

    # data-parallel sweep over the 8-virtual-device mesh: identical AUC
    # and pass rates, per-frame intrinsics ride the sharded program
    import dataclasses
    cfg_dp = dataclasses.replace(cfg, eval_data_parallel=True,
                                 out_dir=str(root / "out_dp"))
    dp = eval_mod.estimate_6d_pose_ycb(
        cfg_dp, class_ids=[class_id], progress=lambda *_: None,
        map_source_factory=ExactMaps)["all"]
    assert dp["frames"] == 1
    assert dp["adds_auc_before_icp"] == res["adds_auc_before_icp"]
    assert dp["adds_auc_after_icp"] == res["adds_auc_after_icp"]
    assert dp["add_before_icp"] == res["add_before_icp"]
    assert dp["data_parallel"] >= 2
    assert os.path.isfile(root / "out_dp" / "demo_ycb" / class_name
                          / f"{cycle}_{idx}_overlay.png")


def test_ycb_no_precomputed_map_path_raises(tmp_path):
    """YCB + using_ckpts=False must fail loudly (the reference YCB loop has
    no estRadialMap branch, AccumulatorSpace.py:1044), not misroute into the
    LM LINEMOD_ORIG tree and die with FileNotFoundError."""
    from rcvpose_tpu import eval as eval_mod

    cfg = Config(root_dataset=str(tmp_path), using_ckpts=False,
                 dataset="ycb")
    with pytest.raises(ValueError, match="no precomputed-radial-map path"):
        eval_mod.estimate_6d_pose_ycb(cfg, class_ids=[1])
    # and the shared RadialMapSource guards the same misroute
    src = eval_mod.RadialMapSource(cfg, "002_master_chef_can")
    with pytest.raises(ValueError, match="no precomputed-radial-map path"):
        src.maps(1, np.zeros((4, 4, 3), np.uint8), "0000_000001")


def test_dataset_evals_default_to_saturated_vote_topk():
    """All offline dataset evaluations run the hier accumulator at the
    measured saturation point (topk=64, PERF.md sweep) unless the user set
    --vote_topk; an explicit setting always wins and the caller's cfg is
    never mutated. (Serving keeps the latency default 32.)"""
    from rcvpose_tpu.config import Config
    from rcvpose_tpu.eval import _dataset_eval_cfg

    cfg = Config()
    out = _dataset_eval_cfg(cfg)
    assert out.vote_topk == 64
    assert cfg.vote_topk is None  # replace, not mutate

    cfg2 = Config(vote_topk=16)
    assert _dataset_eval_cfg(cfg2) is cfg2


def test_ycb_icp_criteria_default_converged():
    """The YCB evaluator defaults to the reference's converge-to-tolerance
    ICP criteria (AccumulatorSpace.py:1165-1169: max_iteration=2e6 +
    relative fitness/RMSE 1e-6), capped; --no_ycb_icp_converged falls back
    to the fixed LM/LMO-style count."""
    from rcvpose_tpu.config import Config
    from rcvpose_tpu.eval import _ycb_icp_kw

    kw = _ycb_icp_kw(Config())
    assert kw == {"icp_iters": 10_000, "rel_fitness": 1e-6,
                  "rel_rmse": 1e-6}
    kw_off = _ycb_icp_kw(Config(ycb_icp_converged=False, icp_iters=30))
    assert kw_off == {"icp_iters": 30}
