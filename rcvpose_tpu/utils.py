"""Misc runtime utilities (log dirs, config dump, timers).

Replaces reference ``utils.py``: ``get_log_dir`` (utils.py:6-13) and the
hardcoded config dict (utils.py:16-27, now ``rcvpose_tpu.config.Config``).
"""

from __future__ import annotations

import contextlib
import os
import time


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
