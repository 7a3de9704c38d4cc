import numpy as np

from rcvpose_tpu import checkpoint


def synth_torch_state_dict(rng):
    """Synthetic reference-shaped state dict (tiny channel counts) covering
    every name pattern the importer must map."""
    def conv(o, i, k=3):
        return rng.normal(size=(o, i, k, k)).astype(np.float32)

    def bn(c, prefix):
        return {
            f"{prefix}.weight": np.ones(c, np.float32),
            f"{prefix}.bias": np.zeros(c, np.float32),
            f"{prefix}.running_mean": np.zeros(c, np.float32),
            f"{prefix}.running_var": np.ones(c, np.float32),
            f"{prefix}.num_batches_tracked": np.asarray(0),
        }

    sd = {}
    sd["conv1.weight"] = conv(8, 3, 7)
    sd.update(bn(8, "bn1"))
    # block1up with projection
    for m, (o, i) in {"conv1": (4, 8), "conv2": (4, 4), "conv3": (16, 4)}.items():
        sd[f"block1up.{m}.weight"] = conv(o, i, 1 if m != "conv2" else 3)
        if m == "conv2":
            sd[f"block1up.{m}.bias"] = np.zeros(o, np.float32)
        sd.update(bn(o, f"block1up.bn{m[-1]}"))
    sd["block1up.upsample_.0.weight"] = conv(16, 8, 1)
    sd.update(bn(16, "block1up.upsample_.1"))
    # block1.0 (Sequential member)
    for m, (o, i) in {"conv1": (4, 16), "conv2": (4, 4), "conv3": (16, 4)}.items():
        sd[f"block1.0.{m}.weight"] = conv(o, i, 1 if m != "conv2" else 3)
        if m == "conv2":
            sd[f"block1.0.{m}.bias"] = np.zeros(o, np.float32)
        sd.update(bn(o, f"block1.0.bn{m[-1]}"))
    # neck + decoder heads
    sd["conv6.weight"] = conv(8, 16)
    sd["conv6.bias"] = np.zeros(8, np.float32)
    sd.update(bn(8, "bn6"))
    sd["conv_up5.0.weight"] = conv(8, 24)
    sd["conv_up5.0.bias"] = np.zeros(8, np.float32)
    sd.update(bn(8, "conv_up5.1"))
    sd["conv7.0.weight"] = conv(4, 8)
    sd["conv7.0.bias"] = np.zeros(4, np.float32)
    sd.update(bn(4, "conv7.1"))
    sd["conv8.weight"] = conv(2, 4, 1)
    sd["conv8.bias"] = np.zeros(2, np.float32)
    return sd


def test_one_shot_async_save_readable_by_fresh_reader(tmp_path):
    """The throwaway ``Checkpointer(d).save(...)`` idiom with the async
    default must leave a COMPLETE checkpoint behind once the wrapper is
    collected (GC finalizer drains the in-flight write) — a fresh reader
    that knows nothing about the writer then restores it. Regression:
    before the finalizer, GC tore down the commit thread mid-write
    ("cannot schedule new futures after shutdown") and the eval's
    restore found a truncated directory."""
    import gc

    import jax

    from rcvpose_tpu import train
    from rcvpose_tpu.config import Config

    cfg = Config(model_blocks="1,1,1,1", model_width=0.125,
                 compute_dtype="float32", image_height=32, image_width=32)
    state = train.create_state(cfg, jax.random.PRNGKey(0),
                               sample_shape=(1, 32, 32, 3))
    d = str(tmp_path / "ckpts")
    checkpoint.Checkpointer(d).save(state, epoch=2, iteration=7,
                                    best_val=0.25, is_best=True)
    gc.collect()  # the writer is gone; its finalizer must have drained

    restored, epoch, it, best = checkpoint.Checkpointer(d).restore(state)
    assert (epoch, it, best) == (2, 7, 0.25)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]))
    # the best-copy must be complete too
    _, epoch_b, _, _ = checkpoint.Checkpointer(d).restore(state, best=True)
    assert epoch_b == 2


def test_torch_import_maps_all_keys(rng):
    sd = synth_torch_state_dict(rng)
    out = checkpoint.import_torch_state_dict(sd)
    p = out["params"]
    bs = out["batch_stats"]

    # conv kernels transposed OIHW -> HWIO
    assert p["encoder"]["conv1"]["kernel"].shape == (7, 7, 3, 8)
    np.testing.assert_array_equal(
        p["encoder"]["conv1"]["kernel"],
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    # bn split across collections
    assert bs["encoder"]["bn1"]["mean"].shape == (8,)
    assert p["encoder"]["bn1"]["scale"].shape == (8,)
    # projection shortcut
    assert p["encoder"]["block1up"]["proj_conv"]["kernel"].shape == (1, 1, 8, 16)
    assert bs["encoder"]["block1up"]["proj_bn"]["var"].shape == (16,)
    # Sequential index 0 -> block1_1
    assert "block1_1" in p["encoder"]
    # decoder naming
    assert p["conv_up5_conv"]["kernel"].shape == (3, 3, 24, 8)
    assert p["conv_up5_bn"]["scale"].shape == (8,)
    assert p["conv7_conv"]["kernel"].shape == (3, 3, 8, 4)
    assert p["conv8"]["kernel"].shape == (1, 1, 4, 2)


def test_torch_import_strips_dataparallel_prefix(rng):
    sd = {"module.conv8.weight": rng.normal(size=(2, 4, 1, 1)).astype(np.float32),
          "module.conv8.bias": np.zeros(2, np.float32)}
    out = checkpoint.import_torch_state_dict(sd)
    assert out["params"]["conv8"]["kernel"].shape == (1, 1, 4, 2)


def test_torch_import_ignores_bookkeeping(rng):
    sd = {"bn1.num_batches_tracked": np.asarray(7)}
    out = checkpoint.import_torch_state_dict(sd)
    assert out["params"] == {}
    assert out["batch_stats"] == {}


def test_export_torch_cli_round_trip(tmp_path):
    """--mode export-torch: orbax ckpt -> reference .pth.tar whose keys are
    derived from the variable tree (checkpoint.reference_state_dict_keys,
    self-checked against torch_key_to_flax); re-importing reproduces the
    exact parameters."""
    import jax
    import torch

    from rcvpose_tpu import cli, train
    from rcvpose_tpu.checkpoint import Checkpointer
    from rcvpose_tpu.config import Config

    cfg = Config(model_blocks="1,1,1,1", model_width=0.125,
                 compute_dtype="float32", image_height=32, image_width=32)
    state = train.create_state(cfg, jax.random.PRNGKey(1),
                               sample_shape=(1, 32, 32, 3))
    ckpt_dir = str(tmp_path / "ckpts")
    Checkpointer(ckpt_dir).save(state, epoch=3, iteration=17,
                                best_val=0.5, is_best=True)

    out = str(tmp_path / "exported.pth.tar")
    cli.main(["--mode", "export-torch", "--model_dir", ckpt_dir,
              "--export_path", out, "--model_blocks", "1,1,1,1",
              "--model_width", "0.125", "--compute_dtype", "float32"])

    payload = torch.load(out, map_location="cpu", weights_only=False)
    assert payload["epoch"] == 3 and payload["iteration"] == 17
    back = checkpoint.import_torch_state_dict(
        {k: v.numpy() for k, v in payload["model_state_dict"].items()})
    flat_orig = jax.tree_util.tree_leaves_with_path(
        {"params": state.params, "batch_stats": state.batch_stats})
    flat_back = jax.tree_util.tree_leaves_with_path(back)
    orig = {jax.tree_util.keystr(p): np.asarray(v) for p, v in flat_orig}
    rt = {jax.tree_util.keystr(p): np.asarray(v) for p, v in flat_back}
    assert set(orig) == set(rt)
    for k in orig:
        np.testing.assert_array_equal(orig[k], rt[k], err_msg=k)


def test_export_keys_match_reference_model_exactly():
    """The generated key list must be precisely the loadable subset of the
    real reference model's state dict (everything except bookkeeping and
    the dead never-used non-projecting upsample_ params)."""
    import sys

    import jax

    from rcvpose_tpu import train
    from rcvpose_tpu.config import Config

    sys.path.insert(0, "/root/reference")
    try:
        from models.fcnresnet import DenseFCNResNet152 as TorchDense
    except Exception:
        import pytest
        pytest.skip("reference torch model unavailable")
    finally:
        sys.path.pop(0)

    torch_model = TorchDense(3, 2)
    ref_keys = set(torch_model.state_dict().keys())
    cfg = Config(model_blocks="", model_width=1.0, compute_dtype="float32")
    model = train.build_model(cfg)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 3), np.float32), False))
    ours = set(checkpoint.reference_state_dict_keys(variables))
    assert ours <= ref_keys
    missing = ref_keys - ours
    for k in missing:
        assert "num_batches_tracked" in k or "upsample_" in k, k
