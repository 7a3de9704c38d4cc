import os

import numpy as np

from rcvpose_tpu.data import genlabels
from rcvpose_tpu.data.dataset import LinemodDataset
from tests import oracles
from tests.test_data import linemod_tree  # noqa: F401 (fixture)


def test_generate_lm_writes_reference_format(linemod_tree):  # noqa: F811
    genlabels.generate_lm(linemod_tree, "toy", kpt_indices=[1, 2],
                          batch_size=2, progress=lambda *_: None)
    ds = LinemodDataset(linemod_tree, "toy", kpt_num=1)
    out_dir = os.path.join(linemod_tree, "toy", "Out_pt1_dm")
    files = sorted(os.listdir(out_dir))
    assert len(files) == len(ds)

    # golden check against the NumPy oracle for one frame
    raw = ds.raw(0)
    k = np.array([[572.4114, 0.0, 325.2611],
                  [0.0, 573.57043, 242.04899],
                  [0.0, 0.0, 1.0]])
    lbl, _ = oracles.radial_map_np(
        raw["depth"].astype(np.float64), raw["mask"], raw["pose"],
        ds.kpt, k, ds.max_radii_dm)
    got = np.load(os.path.join(out_dir, f"{raw['img_id']}.npy"))
    np.testing.assert_allclose(got, lbl, atol=2e-3)


def test_cli_config_round_trip(tmp_path):
    from rcvpose_tpu.cli import config_from_args

    cfg = config_from_args([
        "--mode", "train", "--class_name", "cat", "--batch_size", "16",
        "--optim", "SGD", "--vote_mode", "exact", "--no_ckpts"])
    assert cfg.class_name == "cat"
    assert cfg.batch_size == 16
    assert cfg.optim == "sgd"
    assert cfg.vote_mode == "exact"
    assert cfg.using_ckpts is False

    p = tmp_path / "cfg.json"
    cfg.dump(str(p))
    from rcvpose_tpu.config import Config
    cfg2 = Config.load(str(p))
    assert cfg2 == cfg


def test_generate_lm_fake_depth_mode(linemod_tree):  # noqa: F811
    """depthGeneration parity (reference 3DRadius_lm.py:14, 152-153,
    213-214): meter-valued maps under FakeDepth/, = Out_pt maps / 10."""
    genlabels.generate_lm(linemod_tree, "toy", kpt_indices=[1],
                          batch_size=2, progress=lambda *_: None)
    genlabels.generate_lm(linemod_tree, "toy", kpt_indices=[1],
                          batch_size=2, progress=lambda *_: None,
                          fake_depth=True)
    ds = LinemodDataset(linemod_tree, "toy", kpt_num=1)
    raw = ds.raw(0)
    dm = np.load(os.path.join(linemod_tree, "toy", "Out_pt1_dm",
                              f"{raw['img_id']}.npy"))
    fake = np.load(os.path.join(linemod_tree, "toy", "FakeDepth",
                                f"{raw['img_id']}.npy"))
    np.testing.assert_allclose(fake, dm / 10.0, atol=1e-6)
    assert fake.max() < 1.0  # meters, not decimeters


# ---------------------------------------------------------------------------
# YCB gen-labels round trip: generate -> the file its own dataset reads ->
# BatchLoader -> one real train step (VERDICT r2 item 1; reference
# 3DRadius_ycb.py:200-253 writes JPEGImages + radial maps into the one
# per-class HDF5 that rmap_dataset.py:62-65,79-86 consumes).
# ---------------------------------------------------------------------------

YCB_CLASS = "002_master_chef_can"
YCB_ID = 1


def _ycb_raw_tree(root, rng, n_frames=2, h=64, w=64):
    """Synthetic YCB source tree: data/<cycle>/<idx>{.mat,-color,-depth,
    -label} + models/<class>/Outside9.npy. Returns the per-frame poses."""
    import scipy.io
    from PIL import Image

    from tests.test_eval_lmo_ycb_format import (KPTS9, _blob, _pose_at_pixel,
                                                _render)

    k = np.array([[300.0, 0, w / 2], [0, 300.0, h / 2], [0, 0, 1.0]])
    factor_depth = 10000.0
    model_m = _blob(rng)

    mdir = os.path.join(root, "models", YCB_CLASS)
    os.makedirs(mdir)
    np.save(os.path.join(mdir, "Outside9.npy"), KPTS9)

    cycle = "0000"
    cdir = os.path.join(root, "data", cycle)
    os.makedirs(cdir)
    poses = {}
    for i in range(1, n_frames + 1):
        idx = f"{i:06d}"
        rot, t = _pose_at_pixel(rng, k, w // 2, h // 2, 0.75)
        depth_mm = _render(model_m, rot, t, k, h, w)
        depth_u16 = np.round(depth_mm / 1000.0 * factor_depth)
        Image.fromarray(depth_u16.astype(np.int32)).save(
            os.path.join(cdir, f"{idx}-depth.png"))
        label = np.where(depth_mm > 0, YCB_ID, 0).astype(np.uint8)
        Image.fromarray(label).save(os.path.join(cdir, f"{idx}-label.png"))
        img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(cdir, f"{idx}-color.png"))
        scipy.io.savemat(os.path.join(cdir, f"{idx}.mat"), {
            "poses": np.concatenate([rot, t[:, None]], 1)[:, :, None],
            "cls_indexes": np.array([[YCB_ID]]),
            "factor_depth": np.array([[factor_depth]]),
            "intrinsic_matrix": k,
        })
        poses[f"{cycle}_{idx}"] = (rot, t, k, factor_depth)
    return poses


def test_generate_ycb_round_trip_to_train_step(tmp_path, rng):
    """generate_ycb output must be directly consumable by YcbDataset +
    BatchLoader + train_step — the coherence the reference has by
    construction (one HDF5, written then read)."""
    import h5py
    import jax

    from rcvpose_tpu import train
    from rcvpose_tpu.config import Config
    from rcvpose_tpu.data.dataset import YcbDataset
    from rcvpose_tpu.data.loader import BatchLoader

    root = str(tmp_path)
    poses = _ycb_raw_tree(root, rng)
    ids = genlabels.generate_ycb(root, YCB_CLASS, YCB_ID,
                                 progress=lambda *_: None)
    assert ids == sorted(poses)

    # the one per-class file, with BOTH groups (3DRadius_ycb.py:200-253)
    h5_path = os.path.join(root, f"{YCB_CLASS}.hdf5")
    with h5py.File(h5_path, "r") as f:
        for fid in ids:
            assert f[f"JPEGImages/{fid}"].shape == (64, 64, 3)
            for kp in (1, 2, 3):
                assert f[f"3Dradius_pt{kp}_dm/{fid}"].shape == (64, 64)
        # radial values match the reference label math (unclipped dm)
        fid = ids[0]
        rot, t, k, factor = poses[fid]
        got = np.array(f[f"3Dradius_pt1_dm/{fid}"])
        from tests.test_eval_lmo_ycb_format import KPTS9
        depth_png = np.array(f_read_depth(root, fid))
        depth_mm = depth_png.astype(np.float64) / factor * 1000.0
        pose = np.concatenate([rot, t[:, None]], 1)
        lbl, _ = oracles.radial_map_np(depth_mm, depth_mm > 0, pose,
                                       KPTS9[1], k, np.inf)
        np.testing.assert_allclose(got, lbl, atol=2e-3)

    # split convenience files: BOTH reference layouts (the dataset reads
    # <root>/<class>/Split, the YCB evaluator <root>/Split/<class> —
    # rmap_dataset.py:64 vs AccumulatorSpace.py:986); written once,
    # never clobbered
    split = os.path.join(root, YCB_CLASS, "Split", "val.txt")
    eval_split = os.path.join(root, "Split", YCB_CLASS, "val.txt")
    for path in (split, eval_split):
        with open(path) as f:
            assert [ln.strip() for ln in f] == ids
    with open(split, "w") as f:
        f.write(ids[0] + "\n")
    genlabels.generate_ycb(root, YCB_CLASS, YCB_ID,
                           progress=lambda *_: None)
    with open(split) as f:
        assert [ln.strip() for ln in f] == [ids[0]]
    with open(split, "w") as f:
        f.write("\n".join(ids) + "\n")

    # dataset + loader + ONE real train step off the generated file
    cfg = Config(dataset="ycb", root_dataset=root, class_name=YCB_CLASS,
                 compute_dtype="float32", image_height=64, image_width=64,
                 batch_size=2)
    ds = YcbDataset(root, YCB_CLASS, kpt_num=1, split="val")
    assert len(ds) == 2
    loader = BatchLoader(ds, poses[ids[0]][2], batch_size=2, shuffle=False,
                         ycb_clip=True)
    (batch,) = list(loader)
    assert np.asarray(batch["radial"]).max() > 0  # labels actually present
    state = train.create_state(cfg, jax.random.PRNGKey(0), blocks=(1, 1, 1, 1),
                               sample_shape=(1, 64, 64, 3), width=0.125)
    state, m = jax.jit(train.train_step)(state, batch)
    assert np.isfinite(float(m["loss"]))
    ds.close()


def f_read_depth(root, fid):
    from rcvpose_tpu.data import readers
    cycle, idx = fid.split("_")
    return readers.read_depth(
        os.path.join(root, "data", cycle, f"{idx}-depth.png"))


def test_cli_gen_labels_ycb_e2e(tmp_path, rng):
    """--mode gen-labels --dname ycb end to end through the CLI."""
    from rcvpose_tpu.cli import main

    root = str(tmp_path)
    _ycb_raw_tree(root, rng, n_frames=1)
    main(["--mode", "gen-labels", "--dname", "ycb",
          "--root_dataset", root, "--class_name", YCB_CLASS])
    import h5py
    with h5py.File(os.path.join(root, f"{YCB_CLASS}.hdf5"), "r") as f:
        assert "JPEGImages/0000_000001" in f
        assert "3Dradius_pt1_dm/0000_000001" in f
    assert os.path.exists(os.path.join(root, YCB_CLASS, "Split", "val.txt"))
