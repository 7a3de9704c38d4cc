"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors the SURVEY.md §4 plan — multi-chip behavior is validated with
``xla_force_host_platform_device_count`` (the TPU-world fake cluster),
never against real hardware in unit tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's TPU plugin overrides JAX_PLATFORMS; force CPU explicitly.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall time is dominated by XLA:CPU
# compiles that are identical run to run (notably the mesh train step).
# MACHINE-KEYED dir (utils.cpu_cache_dir): XLA:CPU entries are AOT machine
# code, and loading entries compiled on another round's driver host
# (different CPU features) corrupted the heap and aborted the suite
# mid-run — the cpu_aot_loader mismatch warnings escalating to crashes.
from rcvpose_tpu.utils import cpu_cache_dir  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    cpu_cache_dir(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

# KNOWN HAZARD (environment, not framework): on some hosts, a LONG
# single-process suite run dies with a segfault/abort INSIDE XLA:CPU
# handling the big 2-device pjit train-step program of
# tests/test_train.py::test_train_step_reduces_loss_on_mesh — observed in
# the fresh-compile path (backend_compile_and_load), the cache-write path
# (put_executable_and_time) AND the cache-read path
# (get_executable_and_time), i.e. the crash follows the program, not one
# code path. The same compile/load succeeds every time in a short-lived
# process (pytest tests/test_train.py alone: 11 passed; standalone
# repro: ok). Reproduced 5/5 full runs vs 0/5 short runs on the round-5
# driver host, with and without the native extension loaded, on a fresh
# machine-keyed cache dir — so it is a process-aged XLA:CPU condition,
# not framework native code and not stale foreign-machine AOT entries
# (those are ALSO a real hazard; hence cpu_cache_dir above).
# Follow-up measurements localized it further: the abort tracks the
# CUMULATIVE big-program load in one process, not process age —
# front-loading every big file into one process made a warm-cache run
# abort at 30% (test_eval_lm_format cache read), while xdist workers
# each handling ~5 files pass 203/203 repeatedly. Mitigations shipped:
# per-file worker processes are the DEFAULT for every pytest
# invocation (pyproject.toml addopts: -n 4 --dist loadfile; override
# with `-p no:xdist`), and the ordering below puts the big-program
# files first, which doubles as xdist load balancing. Ordering between
# files carries no semantics in this suite.

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# big pjit/Pallas programs first, in rough size order
_FRONT = ["test_train.py", "test_serve.py", "test_infer.py",
          "test_eval_from_train.py", "test_cli.py",
          "test_eval_lm_format.py", "test_eval_lmo_ycb_format.py",
          "test_voting.py", "test_mmconv_pallas.py"]


def pytest_collection_modifyitems(config, items):
    def rank(it):
        path = os.path.basename(str(it.fspath))
        return _FRONT.index(path) if path in _FRONT else len(_FRONT)

    items.sort(key=rank)  # stable: preserves in-file order


@pytest.fixture
def rng():
    return np.random.default_rng(0)
