"""Hier vote time vs refine-window size (device-true chained timing).

The refine stage dominates the hier mode's pair evaluations
(topk * win^3 * n_points vs (L/4)^3 * n_points/stride coarse). The true
fine peak always lies inside the winning coarse cell, so shrinking the
window from 16 only loses when a NEIGHBOR cell of a top-K cell (not in the
top-K itself) holds the peak — the agreement sweep
(hier_exact_agreement.py --sweep-win) quantifies that; this measures the
speed side. Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from rcvpose_tpu.ops import voting  # noqa: E402


def chain(fn, x0, reps=16, runs=3):
    @jax.jit
    def run(x):
        def body(i, carry):
            x, acc = carry
            m = fn(x)
            return (x + (m * 1e-12).astype(x.dtype), acc + m)
        _, acc = jax.lax.fori_loop(0, reps, body, (x, jnp.float32(0)))
        return acc
    float(run(x0))
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        float(run(x0))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    grid_l, n = 128, 8192
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pts = dirs * 0.03 + np.array([0.0, 0.0, 0.7])
    kpt = np.array([0.05, 0.02, 0.72])
    rad = jnp.asarray(np.linalg.norm(pts - kpt, axis=1) * 10.0, jnp.float32)
    pts = jnp.asarray(pts, jnp.float32)
    mask = jnp.ones(n, bool)

    out = {}
    for win in (8, 12, 16):
        for topk in (4, 8, 16):
            def fn(r, win=win, topk=topk):
                res = voting.accumulate_3d(pts, r, mask, grid_l=grid_l,
                                           mode="hier", topk=topk, win=win)
                return res.center_mm.astype(jnp.float32).mean()
            out[f"win{win}_topk{topk}_ms"] = round(chain(fn, rad) * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
