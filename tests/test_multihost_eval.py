"""Real 2-process multi-host --mode test equality
(see scripts/multihost_eval_smoke.py).

Subprocess-based on purpose: jax.distributed needs one runtime per process,
which cannot be set up inside the already-initialized test process. The
smoke asserts the combined per-class LINEMOD ADD and the YCB AUC from two
processes sweeping disjoint frame shards equal a single-process run on the
same fixture trees (VERDICT r3 item 1 done-criterion).
"""

import os
import subprocess
import sys

SCRIPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "scripts", "multihost_eval_smoke.py")


def test_two_process_distributed_eval_matches_single_process():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    out = subprocess.run([sys.executable, SCRIPT], capture_output=True,
                         text=True, timeout=3000, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "identical to the single-process run" in out.stdout
