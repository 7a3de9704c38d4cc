"""CLI surface: flag parsing, --distributed single-host no-op, CWD-free
benchmark dispatch."""

import os

import numpy as np

from rcvpose_tpu import cli


def test_config_from_args_maps_flags():
    cfg = cli.config_from_args([
        "--mode", "test", "--dname", "lmo", "--no_ckpts",
        "--vote_grid_l", "96", "--optim", "SGD", "--distributed"])
    assert cfg.mode == "test"
    assert cfg.dataset == "lmo"
    assert cfg.using_ckpts is False
    assert cfg.vote_grid_l == 96
    assert cfg.optim == "sgd"  # normalized
    assert cfg.distributed is True


def test_distributed_flag_is_noop_on_single_host():
    """--distributed with no coordinator env must leave the local runtime
    usable (jax.distributed.initialize either succeeds as a 1-process job or
    is skipped with a message) — single-host behavior unchanged."""
    import jax

    cfg = cli.config_from_args(["--distributed"])
    n_before = jax.device_count()
    cli.maybe_init_distributed(cfg)  # must not raise
    assert jax.device_count() == n_before
    # the runtime still computes
    assert float(jax.numpy.asarray(2.0) + 2.0) == 4.0
    # without the flag it is a hard no-op
    cfg2 = cli.config_from_args([])
    assert cli.maybe_init_distributed(cfg2) is False


def test_benchmark_mode_is_cwd_independent(tmp_path, monkeypatch):
    captured = {}

    def fake_run_path(path, run_name=None):
        captured["path"] = path
        captured["run_name"] = run_name

    import runpy
    monkeypatch.setattr(runpy, "run_path", fake_run_path)
    monkeypatch.chdir(tmp_path)  # anywhere but the repo root
    cli.main(["--mode", "benchmark"])
    assert captured["run_name"] == "__main__"
    assert os.path.isabs(captured["path"])
    assert os.path.isfile(captured["path"])  # resolves to the real bench.py
    assert os.path.basename(captured["path"]) == "bench.py"
