"""Real multi-process jax.distributed smoke (see scripts/multihost_smoke.py).

Subprocess-based on purpose: jax.distributed needs one runtime per process,
which cannot be set up inside the already-initialized test process.
"""

import os
import subprocess
import sys

SCRIPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "scripts", "multihost_smoke.py")


def test_two_process_distributed_train_step():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    out = subprocess.run([sys.executable, SCRIPT], capture_output=True,
                         text=True, timeout=900, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "identical on every host" in out.stdout


def test_two_process_full_run_train():
    """The whole production entry point across 2 processes: distributed
    init -> per-process loader shards -> a mesh spanning BOTH processes
    (one chip each; a prefix mesh would sit entirely on host 0) ->
    cross-process pjit collectives -> coordinated orbax checkpoints."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run([sys.executable, SCRIPT, "--full"],
                         capture_output=True, text=True, timeout=900,
                         env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "identical on every host" in out.stdout
