"""--mode test must evaluate what --mode train produces.

The reference's Trainer.Test() evaluates its own trained weights
(/root/reference/train.py:190-194). Here that means estimate_6d_pose_lm
driven by orbax checkpoints from this framework's Trainer — in both the
3-net reference mode (one checkpoint per keypoint) and the fused multi-head
extension (one checkpoint, one forward per frame serving all keypoints).
"""

import os

import jax
import numpy as np
import pytest

from rcvpose_tpu.config import Config
from tests.test_eval_lm_format import make_lm_eval_tree


def _train_and_save(cfg, ckpt_dir, seed=0):
    """One real optimizer step on a synthetic batch, then orbax-save."""
    from rcvpose_tpu import train as train_mod
    from rcvpose_tpu.checkpoint import Checkpointer

    state = train_mod.create_state(
        cfg, jax.random.PRNGKey(seed), steps_per_epoch=10,
        sample_shape=(1, 32, 32, 3))
    rng = np.random.default_rng(seed)
    k = cfg.kpt_heads
    radial = np.zeros((2, 32, 32, k), np.float32)
    radial[:, 8:24, 8:24, :] = rng.uniform(1, 3, size=(2, 16, 16, k))
    batch = {
        "image": rng.normal(size=(2, 32, 32, 3)).astype(np.float32),
        "radial": radial.squeeze(-1) if k == 1 else radial,
        "sem": (np.where(radial > 0, 1.0, -1.0).astype(np.float32)
                .squeeze(-1) if k == 1 else
                np.where(radial > 0, 1.0, -1.0).astype(np.float32)),
    }
    state, m = train_mod.train_step(state, batch)
    assert float(m["loss"]) == float(m["loss"])
    Checkpointer(ckpt_dir).save(state, epoch=0, iteration=1,
                                best_val=float(m["loss"]), is_best=True)


@pytest.mark.parametrize("kpt_heads", [1, 3])
def test_eval_from_orbax_checkpoints(tmp_path, rng, kpt_heads):
    from rcvpose_tpu import eval as eval_mod

    tree = make_lm_eval_tree(tmp_path / "data", rng, h=128, w=160)
    model_dir = str(tmp_path / "trained")
    # kpt_heads=1 pins the sequential loop; kpt_heads=3 leaves
    # eval_data_parallel on auto, so under the conftest's 8-device mesh it
    # exercises the data-parallel --mode test path end to end from a
    # trained fused checkpoint (net -> vote -> fit on device, frames
    # sharded)
    cfg = Config(root_dataset=tree, using_ckpts=True, model_dir=model_dir,
                 model_blocks="1,1,1,1", model_width=0.125,
                 compute_dtype="float32", kpt_heads=kpt_heads,
                 image_height=128, image_width=160, vote_grid_l=96,
                 max_points=2048, vote_mode="hier", icp_iters=5,
                 eval_data_parallel=(None if kpt_heads == 3 else False))

    if kpt_heads == 1:
        # 3-net reference layout: <model_dir>/<class>_pt<k>/ orbax dirs
        for i in range(1, 4):
            _train_and_save(cfg, os.path.join(model_dir, f"ape_pt{i}"),
                            seed=i)
    else:
        # fused layout: one multi-head checkpoint <model_dir>/<class>/
        _train_and_save(cfg, os.path.join(model_dir, "ape"))

    results = eval_mod.estimate_6d_pose_lm(cfg, class_names=["ape"],
                                           progress=lambda *_: None)
    res = results["ape"]
    # a one-step model gives no accuracy guarantee; the contract under test
    # is that training output drives the full eval pipeline end to end
    assert res["frames"] == 2
    assert np.isfinite(res["add_before_icp"])
    assert np.isfinite(res["add_after_icp"])
    if kpt_heads == 3:  # data-parallel sweep engaged (fused checkpoint)
        assert res["data_parallel"] == jax.device_count()
        assert res["frame_ms_per_frame"] > 0
    else:
        assert res["net_ms_per_frame"] > 0


def test_missing_checkpoints_error_names_both_formats(tmp_path, rng):
    from rcvpose_tpu import eval as eval_mod

    cfg = Config(model_dir=str(tmp_path / "nothing"), using_ckpts=True)
    with pytest.raises(FileNotFoundError, match="orbax"):
        eval_mod._load_models(cfg, "ape")
    cfg.kpt_heads = 3
    with pytest.raises(FileNotFoundError, match="fused"):
        eval_mod._load_models(cfg, "ape")


def test_fused_source_runs_one_forward_per_frame():
    """RadialMapSource in fused mode caches the multi-head forward: three
    keypoint queries on one frame -> exactly one apply call."""
    import jax.numpy as jnp

    from rcvpose_tpu import eval as eval_mod

    calls = []

    def fake_apply(params, img):
        calls.append(1)
        h, w = img.shape[1:3]
        seg = jnp.broadcast_to(jnp.arange(3.0), (1, h, w, 3))
        return seg, seg * 10.0

    cfg = Config(using_ckpts=True, kpt_heads=3)
    src = eval_mod.RadialMapSource(cfg, "ape", apply_fns=[fake_apply],
                                   params=[None])
    img = np.zeros((32, 32, 3), np.uint8)
    for kp in range(1, 4):
        seg, radial = src.maps(kp, img, "000001")
        assert seg.shape == (32, 32)
        assert float(seg[0, 0]) == kp - 1  # head kp served
        assert float(radial[0, 0]) == (kp - 1) * 10.0
    assert sum(calls) == 1
    src.maps(1, img, "000002")  # new frame -> one more forward
    assert sum(calls) == 2


def test_orbax_variables_accepts_relative_path(tmp_path, monkeypatch):
    """The CLI default --model_dir ('ckpts') is relative; orbax rejects
    relative paths, so _orbax_variables must abspath before restoring.
    Regression: the learned-YCB e2e run failed exactly here."""
    from rcvpose_tpu import eval as eval_mod

    cfg = Config(model_blocks="1,1,1,1", model_width=0.125,
                 compute_dtype="float32", image_height=32, image_width=32)
    _train_and_save(cfg, str(tmp_path / "ckpts" / "ape_pt1"))
    monkeypatch.chdir(tmp_path)
    variables = eval_mod._orbax_variables(os.path.join("ckpts", "ape_pt1"))
    assert "params" in variables and "batch_stats" in variables


def test_ycb_fused_train_to_eval_roundtrip(tmp_path, rng):
    """The flagship fused mode (kpt_heads=3) trains on YCB: BatchLoader
    stacks the HDF5's per-keypoint 3Dradius_pt1..K_dm datasets into
    (H, W, K) labels (YcbDataset.raw_multi — reference layout
    3DRadius_ycb.py:200-253), the production Trainer takes real steps on
    them, the orbax checkpoint lands where --mode test looks for fused
    checkpoints, and estimate_6d_pose_ycb evaluates it end to end
    (the round-3/4 gap: fused training was LINEMOD-only)."""
    from rcvpose_tpu import geometry, parallel
    from rcvpose_tpu import eval as eval_mod
    from rcvpose_tpu import train as train_mod
    from rcvpose_tpu.checkpoint import Checkpointer
    from rcvpose_tpu.data.dataset import YcbDataset
    from rcvpose_tpu.data.loader import BatchLoader
    from tests.test_eval_lmo_ycb_format import make_ycb_eval_tree

    root = tmp_path
    class_id, class_name = make_ycb_eval_tree(root, rng, n_frames=2,
                                              h=128, w=160)
    model_dir = str(tmp_path / "trained")

    cfg = Config(root_dataset=str(root), dataset="ycb", using_ckpts=True,
                 model_dir=model_dir, class_name=class_name,
                 model_blocks="1,1,1,1", model_width=0.125,
                 compute_dtype="float32", kpt_heads=3,
                 image_height=128, image_width=160, vote_grid_l=96,
                 max_points=2048, vote_mode="hier", icp_iters=5,
                 batch_size=2, eval_data_parallel=False)

    # real loader over the real HDF5: multi-head labels from the
    # precomputed per-keypoint datasets
    ds = YcbDataset(str(root), class_name, split="val")
    loader = BatchLoader(ds, geometry.LINEMOD_K, batch_size=2,
                         shuffle=False, ycb_clip=True, kpt_heads=3)
    batch = next(iter(loader))
    assert batch["radial"].shape == (2, 128, 160, 3)
    assert batch["sem"].shape == (2, 128, 160, 3)
    # head k carries keypoint k's radial map (clip included)
    raw = ds.raw_multi(0, 3)
    want = np.where(raw["radial_dm"] >= 10.0, 0.0, raw["radial_dm"])
    np.testing.assert_allclose(np.asarray(batch["radial"][0]), want,
                               atol=1e-6)

    # two real optimizer steps through the parallel train step
    state = train_mod.create_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=1,
        sample_shape=(1, 128, 160, 3))
    mesh = parallel.data_mesh(2)
    p_train, _ = train_mod.make_parallel_steps(mesh)
    for batch in loader.batches(epoch=0):
        sharded = parallel.shard_batch(mesh, batch)
        state, m = p_train(state, sharded)
        assert np.isfinite(float(m["loss"]))
    Checkpointer(os.path.join(model_dir, class_name)).save(
        state, epoch=0, iteration=1, best_val=float(m["loss"]),
        is_best=True)

    results = eval_mod.estimate_6d_pose_ycb(cfg, class_ids=[class_id],
                                            progress=lambda *_: None)
    res = results["all"]
    assert res["frames"] == 2
    assert np.isfinite(res["adds_auc_before_icp"])
    assert np.isfinite(res["adds_auc_after_icp"])
