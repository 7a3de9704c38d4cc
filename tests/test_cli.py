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


def test_run_train_end_to_end_with_resume(tmp_path, monkeypatch):
    """cli.run_train over an on-disk fixture tree: argparse -> config ->
    make_loaders -> pjit Trainer -> orbax checkpoint, then a --resume_train
    run restores and continues (the reference's resume resets the epoch,
    train.py:50 — ours must not)."""
    import numpy as np

    from rcvpose_tpu.config import Config
    from tests.test_data import make_linemod_tree

    rng = np.random.default_rng(0)
    root = make_linemod_tree(tmp_path, rng, h=32, w=64)
    args = ["--mode", "train", "--root_dataset", root,
            "--class_name", "toy", "--batch_size", "2",
            "--max_iterations", "2", "--compute_dtype", "float32",
            "--model_blocks", "1,1,1,1", "--model_width", "0.125",
            "--out_dir", str(tmp_path / "logs")]
    cfg = cli.config_from_args(args)
    assert cfg.model_blocks == "1,1,1,1"
    cli.run_train(cfg)
    from rcvpose_tpu import utils
    ckpt_dir = utils.get_log_dir(cfg) + "/ckpts"
    assert os.path.isdir(os.path.join(ckpt_dir, "ckpt"))
    assert os.path.isdir(os.path.join(ckpt_dir, "model_best"))

    # resume: restores iteration and runs up to the raised cap
    cfg2 = cli.config_from_args(args + ["--resume_train",
                                        "--max_iterations", "3"])
    cli.run_train(cfg2)


def test_run_train_with_accum_steps(tmp_path):
    """--accum_steps 2 through the full cli.run_train path: loader ->
    make_parallel_steps(accum) -> microbatch-scanned step -> checkpoint.
    Pins the CLI wiring (Trainer passes cfg.accum_steps through)."""
    import numpy as np

    from tests.test_data import make_linemod_tree

    rng = np.random.default_rng(1)
    root = make_linemod_tree(tmp_path, rng, h=32, w=64)
    cfg = cli.config_from_args([
        "--mode", "train", "--root_dataset", root,
        "--class_name", "toy", "--batch_size", "2", "--accum_steps", "2",
        "--max_iterations", "2", "--compute_dtype", "float32",
        "--model_blocks", "1,1,1,1", "--model_width", "0.125",
        "--out_dir", str(tmp_path / "logs")])
    assert cfg.accum_steps == 2
    cli.run_train(cfg)
    from rcvpose_tpu import utils
    assert os.path.isdir(os.path.join(utils.get_log_dir(cfg), "ckpts",
                                      "ckpt"))


def test_run_test_end_to_end(tmp_path):
    """cli.run_test dispatch: lm fixture tree -> evaluator results."""
    import numpy as np

    from tests.test_eval_lm_format import make_lm_eval_tree

    rng = np.random.default_rng(0)
    root = make_lm_eval_tree(tmp_path, rng)
    cfg = cli.config_from_args([
        "--mode", "test", "--root_dataset", root, "--no_ckpts",
        "--compute_dtype", "float32", "--vote_grid_l", "96",
        "--eval_classes", "ape", "--out_dir", str(tmp_path / "logs")])
    cfg.max_points = 2048
    results = cli.run_test(cfg)
    assert results["ape"]["frames"] == 2
    assert results["ape"]["add_after_icp"] == 1.0


def test_main_test_mode_writes_results_json(tmp_path, monkeypatch):
    """cli.main --mode test persists the per-class results machine-readably
    (the reference only prints, AccumulatorSpace.py:735-740). The evaluator
    itself is covered by test_run_test_end_to_end; here it is stubbed (with
    numpy scalars, which json.dump needs default=float for) so only the
    persistence branch runs."""
    import json

    import numpy as np

    canned = {"ape": {"frames": 2, "add_after_icp": np.float32(1.0)}}
    monkeypatch.setattr(cli, "run_test", lambda cfg: canned)
    out_dir = str(tmp_path / "logs")
    cli.main(["--mode", "test", "--max_points", "2048",
              "--icp_iters", "7", "--out_dir", out_dir])
    with open(os.path.join(out_dir, "eval_results.json")) as f:
        results = json.load(f)
    assert results["ape"]["frames"] == 2
    assert results["ape"]["add_after_icp"] == 1.0
    # the new eval knobs reach the Config
    cfg = cli.config_from_args(["--max_points", "2048", "--icp_iters", "7"])
    assert cfg.max_points == 2048 and cfg.icp_iters == 7


def test_run_gen_labels_accepts_both_roots(tmp_path):
    """gen-labels works with --root_dataset pointing at the LINEMOD dir's
    PARENT (the test mode's convention) as well as the dir itself."""
    import numpy as np

    from tests.test_data import make_linemod_tree

    rng = np.random.default_rng(1)
    lm_root = make_linemod_tree(tmp_path, rng)  # <tmp>/LINEMOD
    cfg = cli.config_from_args([
        "--mode", "gen-labels", "--root_dataset", str(tmp_path),
        "--class_name", "toy"])
    cli.run_gen_labels(cfg)
    out = os.path.join(lm_root, "toy", "Out_pt1_dm")
    files = sorted(os.listdir(out))
    assert files == ["000000.npy", "000001.npy", "000002.npy"]
    assert np.load(os.path.join(out, files[0])).shape == (48, 64)


def test_main_profile_dir_captures_trace(tmp_path, monkeypatch):
    """--profile_dir wraps the run in a jax.profiler trace (SURVEY.md §5:
    the reference accumulated net/acc timers but never reported them and
    shipped torch-tb-profiler unimported). The dispatch is stubbed so only
    the trace plumbing runs; the xplane artifact must exist afterwards."""
    import glob

    import jax
    import jax.numpy as jnp

    def fake_test(cfg):
        # one real device op so the trace has content
        float(jnp.sum(jnp.ones((4, 4))))
        return {"ape": {"frames": 0}}

    monkeypatch.setattr(cli, "run_test", fake_test)
    prof = str(tmp_path / "prof")
    cli.main(["--mode", "test", "--out_dir", str(tmp_path / "logs"),
              "--profile_dir", prof])
    assert glob.glob(os.path.join(prof, "**", "*.xplane.pb"),
                     recursive=True), "no xplane trace written"
    del jax


def test_compile_cache_flag_plumbs_and_caches(tmp_path):
    """--compile_cache_dir routes through utils.enable_compile_cache and a
    fresh jit compile actually lands a persistent entry on disk (the knob
    that takes TPU serving cold-class builds from minutes to seconds,
    PERF.md "Persistent compilation cache")."""
    import jax
    import jax.numpy as jnp

    from rcvpose_tpu import utils

    cache = str(tmp_path / "cc")
    cfg = cli.config_from_args(["--compile_cache_dir", cache])
    assert cfg.compile_cache_dir == cache

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        utils.enable_compile_cache(cfg.compile_cache_dir,
                                   min_compile_secs=0.0)
        assert jax.config.jax_compilation_cache_dir == cache
        assert os.path.isdir(cache)

        @jax.jit
        def probe(x):
            return (x @ x).sum() * 3.0

        float(probe(jax.numpy.ones((64, 64), jnp.float32)))
        assert any(os.scandir(cache)), "no persistent cache entry written"
    finally:
        from jax.experimental.compilation_cache import compilation_cache
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          prev_size)
        # the cache object is pinned at first use (see enable_compile_cache)
        # — without this reset, later tests in the process keep writing into
        # this test's deleted tmp dir instead of the conftest cache
        compilation_cache.reset_cache()
