"""Quantify the persistent compilation cache on the serving cold path.

A serving daemon's cold start (and every cold-class build) pays one XLA
compile of the full-size frame program — minutes on TPU. `--compile_cache_dir`
(utils.enable_compile_cache) makes every compile after the first, across
processes and restarts, a disk load. This harness measures exactly that:
two FRESH child processes AOT-lower and compile the same full-size
`infer.frame_pose` program against one shared, initially-empty cache
directory — child 1 populates it (the real-XLA-compile number), child 2
replays it (the warm-cache number every restart / cold-class build pays
with the flag set).

The children time ``jit.lower().compile()`` on ShapeDtypeStructs (the
variables pytree comes from ``jax.eval_shape`` of model.init, so nothing
executes on the device before the measured compile). An earlier version
timed the first end-to-end ``PoseEstimator.estimate`` instead; through
this environment's HTTP tunnel that number is swamped by hundreds of
small-op dispatches whose per-dispatch latency fluctuates 0.1-1 s+
run-to-run (observed 39 s to 10+ min for the identical child), while the
cache-hit load of the 26 MB frame executable itself is a steady ~2-15 s —
the AOT form measures the thing the flag changes.

Run: python scripts/bench_compile_cache.py            (TPU)
     python scripts/bench_compile_cache.py --small    (CPU smoke)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def child(args):
    import numpy as np

    import jax

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    from rcvpose_tpu import utils

    utils.enable_compile_cache(args.cache_dir)

    import jax.numpy as jnp

    from rcvpose_tpu import infer
    from rcvpose_tpu import train as train_mod
    from rcvpose_tpu.config import Config
    from rcvpose_tpu.ops.voting import suggest_grid_l

    backend = jax.default_backend()
    small = args.small or backend == "cpu"
    if small:
        cfg = Config(compute_dtype="float32", vote_grid_l=64,
                     max_points=1024, vote_mode="hier", model_width=0.125,
                     model_blocks="1,1,1,1")
        h, w = 96, 128
    else:
        cfg = Config(compute_dtype="bfloat16",
                     vote_grid_l=suggest_grid_l(0.102, 2.0),
                     max_points=8192, vote_mode="hier")
        h, w = 480, 640

    model = train_mod.build_model(cfg)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    # avals only — nothing runs on the device before the measured compile
    var_shapes = jax.eval_shape(
        lambda rng, x: model.init(rng, x, False), jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32))
    var_shapes = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, dtype if s.dtype == jnp.float32 else s.dtype),
        var_shapes)
    stacked = tuple(var_shapes for _ in range(3))
    sds = {
        "image": jax.ShapeDtypeStruct((h, w, 3), np.float32),
        "depth": jax.ShapeDtypeStruct((h, w), np.float32),
        "k": jax.ShapeDtypeStruct((3, 3), np.float32),
        "radii": jax.ShapeDtypeStruct((3,), np.float32),
        "kpts": jax.ShapeDtypeStruct((3, 3), np.float32),
    }

    t0 = time.perf_counter()
    lowered = infer.frame_pose.lower(
        model.apply, stacked, sds["image"], sds["depth"], sds["k"],
        sds["radii"], sds["kpts"], sem_threshold=0.8,
        n_points=cfg.max_points, grid_l=cfg.vote_grid_l, mode=cfg.vote_mode)
    lower_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    compile_s = time.perf_counter() - t0
    print(json.dumps({"lower_s": lower_s, "compile_s": compile_s,
                      "backend": backend}))
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="CPU smoke shapes")
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--cache_dir", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.child:
        return child(args)

    cache_dir = tempfile.mkdtemp(prefix="rcvpose_cc_")
    runs = []
    try:
        for tag in ("cold_cache", "warm_cache"):
            cmd = ([sys.executable, os.path.abspath(__file__), "--child",
                    "--cache_dir", cache_dir]
                   + (["--small"] if args.small else []))
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=3600)
            if out.returncode != 0:
                sys.stderr.write(out.stderr)
                raise SystemExit(f"{tag} child failed ({out.returncode})")
            rec = json.loads(out.stdout.strip().splitlines()[-1])
            rec["tag"] = tag
            runs.append(rec)
            print(f"{tag}: frame-program compile {rec['compile_s']:.1f} s "
                  f"(trace/lower {rec['lower_s']:.1f} s)", file=sys.stderr)
        cache_entries = len(os.listdir(cache_dir))
    finally:
        # the serialized frame executable is ~26 MB+ on TPU; don't strand
        # one per run in /tmp
        shutil.rmtree(cache_dir, ignore_errors=True)

    cold, warm = runs
    print(json.dumps({
        "metric": "compile_cache_warm_compile_s",
        "value": round(warm["compile_s"], 2),
        "unit": "s",
        "cold_compile_s": round(cold["compile_s"], 2),
        "speedup": round(cold["compile_s"] / max(warm["compile_s"], 1e-9),
                         1),
        "lower_s": round(warm["lower_s"], 2),
        "backend": warm["backend"],
        "cache_entries": cache_entries,
        "note": ("AOT lower+compile of the full-size serving frame program "
                 "in a fresh process against the same persistent cache "
                 "dir: cold = populates it (one real XLA compile), warm = "
                 "what every serving restart / cold-class build pays with "
                 "--compile_cache_dir set"),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
