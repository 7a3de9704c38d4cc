"""Tracing / profiling hooks (SURVEY.md §5: the reference's timers were
accumulated but never reported; its env shipped torch-tb-profiler but never
imported it).

Two layers:
* ``trace(logdir)`` — context manager around ``jax.profiler`` for full XLA
  traces viewable in TensorBoard/Perfetto.
* ``annotate(name)`` — ``jax.profiler.TraceAnnotation`` wrapper for labeling
  host-side stages inside a trace.
* ``StageTimers`` (rcvpose_tpu.utils) — lightweight wall-clock stage
  accumulators that are *printed* (used by the eval pipelines to report
  net/vote/fit ms per frame).
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir="/tmp/rcvpose_trace"):
    """Capture a device+host profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Label a host-side region inside an active trace."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats():
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
