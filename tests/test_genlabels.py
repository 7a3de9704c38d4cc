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
