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
