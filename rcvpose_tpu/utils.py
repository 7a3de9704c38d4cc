"""Misc runtime utilities (log dirs, config dump, timers).

Replaces reference ``utils.py``: ``get_log_dir`` (utils.py:6-13) and the
hardcoded config dict (utils.py:16-27, now ``rcvpose_tpu.config.Config``).
"""

from __future__ import annotations

import contextlib
import os
import time


def machine_cache_key():
    """Short hash of this host's CPU feature flags.

    XLA:CPU persistent-cache entries are AOT-compiled machine code;
    loading an entry compiled on a host with a different feature set
    executes unsupported instructions — observed in this repo as
    cpu_aot_loader feature-mismatch warnings escalating to heap
    corruption and mid-suite aborts when rounds run on heterogeneous
    driver machines. CPU cache dirs must therefore be keyed per machine
    (``.jax_cache/cpu-<key>``). TPU entries are serialized device
    programs — host-independent — and stay shareable."""
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            flags = next(ln for ln in f if ln.startswith("flags"))
        return hashlib.sha1(flags.encode()).hexdigest()[:10]
    except Exception:
        return platform.machine() or "unknown"


def cpu_cache_dir(base_dir):
    """Machine-keyed CPU-backend cache dir under ``base_dir`` (see
    ``machine_cache_key``). Used by the test conftest, the driver dryrun,
    and every --small/CPU harness path."""
    return os.path.join(base_dir, f"cpu-{machine_cache_key()}")


def setup_script_cache(cpu=False, repo_root=None, min_compile_secs=1.0):
    """One-call persistent-cache setup for scripts/harnesses: point JAX at
    the repo's ``.jax_cache``, machine-keyed (``cpu_cache_dir``) when the
    CPU backend is in use. Owns the cache policy in ONE place so the six
    CPU-capable harnesses cannot drift (code-review r5)."""
    import jax

    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(
            __file__)))
    cache = os.path.join(repo_root, ".jax_cache")
    if cpu:
        cache = cpu_cache_dir(cache)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return cache


def enable_compile_cache(cache_dir, min_compile_secs=1.0):
    """Point JAX's persistent compilation cache at ``cache_dir``.

    XLA compiles of the full-size frame/train programs take minutes on TPU
    (PERF.md); the persistent cache makes every compile after the first —
    across *processes and restarts* — a disk load instead. This is what
    takes a serving daemon's cold-class build or a restarted training run
    from minutes to seconds (measured in PERF.md "Persistent compilation
    cache"). Safe to share between concurrent processes (entries are
    content-hashed, written atomically) and across backends (the backend
    is part of the cache key). Call before the first jit execution;
    programs compiled earlier in the process are not retroactively cached.
    """
    import jax
    from jax.experimental.compilation_cache import compilation_cache

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # the cache object is created lazily and then pinned — if some earlier
    # compile already initialized it against another dir, the config
    # update alone would be silently ignored
    compilation_cache.reset_cache()


def get_log_dir(cfg):
    """Create logs/<dataset>/<class>Kp<k>/ and dump the config there."""
    log_dir = cfg.log_dir()
    os.makedirs(log_dir, exist_ok=True)
    cfg.dump(os.path.join(log_dir, "config.json"))
    return log_dir


class StageTimers:
    """Per-stage wall-clock accumulators that are actually reported —
    the reference accumulated net_time/acc_time and never printed them
    (AccumulatorSpace.py:510-511, SURVEY.md §5)."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def time(self, stage):
        t0 = time.perf_counter_ns()
        try:
            yield
        finally:
            dt = time.perf_counter_ns() - t0
            self.totals[stage] = self.totals.get(stage, 0) + dt
            self.counts[stage] = self.counts.get(stage, 0) + 1

    def report(self):
        return {stage: {"total_ms": self.totals[stage] / 1e6,
                        "mean_ms": self.totals[stage] / 1e6
                        / max(self.counts[stage], 1),
                        "count": self.counts[stage]}
                for stage in self.totals}
