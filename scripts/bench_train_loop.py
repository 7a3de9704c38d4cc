"""Measure the train-LOOP host costs: per-step metric fetch + ckpt stall.

`bench_train.py` measures the device-true step (fori_loop-chained, host
excluded). This harness measures the two HOST-side costs the round-5 async
work removed (VERDICT r4 item 4):

1. **Per-step metric fetch.** Round 4's loop called ``float(m["loss"])``
   every step — a host sync that blocks on the step's completion and
   forfeits dispatch pipelining. Round 5 fetches every ``log_interval``
   steps (``Trainer.train_epoch``). Measured here: ms/step through the
   REAL ``Trainer.train_epoch`` loop at ``log_interval`` 1 (the old
   behavior) vs the default, with device-resident batches so the only
   host interaction is the metric fetch itself. On this environment the
   host<->device hop rides an HTTP tunnel (~29 ms round trip, PERF.md);
   a co-located host pays less per fetch but the pipelining loss is
   hardware-true.

2. **Checkpoint stall.** Round 4's ``Checkpointer`` was synchronous:
   every validation blocked on the full ~0.5 GB (params + opt state)
   disk write. Round 5 uses orbax ``AsyncCheckpointer``: ``save``
   returns after the host snapshot; the write streams in background.
   Measured here: ``save()`` return latency async vs sync on the full
   production train state, i.e. the per-validation stall removed.

Usage: python scripts/bench_train_loop.py [batch] [steps]   (TPU, ~5 min)
       JAX_PLATFORMS=cpu python scripts/bench_train_loop.py 2 4 --small
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    small = "--small" in sys.argv
    argv = [a for a in sys.argv if not a.startswith("--")]
    batch = int(argv[1]) if len(argv) > 1 else 8
    steps = int(argv[2]) if len(argv) > 2 else 30

    if small:
        # the environment's TPU plugin overrides JAX_PLATFORMS (conftest)
        jax.config.update("jax_platforms", "cpu")
    from rcvpose_tpu.utils import setup_script_cache
    setup_script_cache(cpu=small)

    from rcvpose_tpu import checkpoint as ckpt_mod
    from rcvpose_tpu import parallel
    from rcvpose_tpu import train as train_mod
    from rcvpose_tpu.config import Config

    if small:
        h, w = 64, 64
        cfg = Config(compute_dtype="float32", image_height=h, image_width=w,
                     batch_size=batch, model_blocks="1,1,1,1",
                     model_width=0.125)
    else:
        h, w = 480, 640
        cfg = Config(compute_dtype="bfloat16", image_height=h, image_width=w,
                     batch_size=batch)

    mesh = parallel.data_mesh()
    state = train_mod.create_state(cfg, jax.random.PRNGKey(0),
                                   sample_shape=(1, 64, 64, 3))
    rng = np.random.default_rng(0)
    radial = np.zeros((batch, h, w), np.float32)
    radial[:, h // 4:3 * h // 4, w // 4:3 * w // 4] = rng.uniform(
        1, 3, size=(batch, h // 2, w // 2))
    host_batch = {
        "image": rng.normal(size=(batch, h, w, 3)).astype(np.float32),
        "radial": radial,
        "sem": np.where(radial > 0, 1.0, -1.0).astype(np.float32),
    }
    # Pre-shard once: shard_batch inside the loop then sees already-placed
    # arrays (device_put no-op), so the loop's only host<->device traffic
    # is the metric fetch under test. Input-pipeline overlap is the
    # loader's own (measured) business, not this harness's.
    dev_batch = parallel.shard_batch(mesh, host_batch)

    p_steps = train_mod.make_parallel_steps(mesh)

    def run_epoch(log_interval, n):
        import dataclasses
        c = dataclasses.replace(cfg, log_interval=log_interval,
                                max_iterations=10**9)
        # fresh device copy: the pjit step DONATES the state buffers, so
        # the template must never be executed on twice
        tr = train_mod.Trainer(
            cfg=c, state=jax.tree.map(jnp.array, state), mesh=mesh,
            train_batches=lambda epoch: (dev_batch for _ in range(n)),
            val_batches=lambda: iter(()), steps=p_steps)
        t0 = time.perf_counter()
        tr.train_epoch(0)
        jax.block_until_ready(tr.state.params)
        return (time.perf_counter() - t0) / n * 1e3

    # warmup/compile epoch (donation means state is consumed per step; the
    # Trainer keeps its own state copy, ours stays intact as the template)
    run_epoch(1, 2)
    # Interleaved repetitions, min per arm: single runs through this
    # environment's tunnel swing by >100 ms/step run-to-run (observed
    # 163-328 ms/step for the SAME config), so A-then-B differencing is
    # meaningless. The min is the reproducible floor of each arm; noise
    # only inflates samples.
    every_s, interval_s = [], []
    for _ in range(3):
        every_s.append(run_epoch(1, steps))          # round-4 behavior
        interval_s.append(run_epoch(cfg.log_interval, steps))  # round-5
    ms_every = min(every_s)
    ms_interval = min(interval_s)

    # --- checkpoint stall: async vs sync save of the production state ---
    def save_time(async_save):
        d = tempfile.mkdtemp(prefix="bench_ckpt_")
        try:
            ck = ckpt_mod.Checkpointer(d, async_save=async_save)
            ck.save(state, epoch=0, iteration=0, best_val=1.0)  # warm dir
            ck.wait_until_finished()
            t0 = time.perf_counter()
            ck.save(state, epoch=1, iteration=1, best_val=0.5)
            ret = time.perf_counter() - t0
            ck.wait_until_finished()
            total = time.perf_counter() - t0
            return ret * 1e3, total * 1e3
        finally:
            shutil.rmtree(d, ignore_errors=True)

    async_ret, async_total = save_time(True)
    sync_ret, _ = save_time(False)

    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(state.params))
    print(json.dumps({
        "metric": "train_loop_host_costs",
        "value": round(ms_every - ms_interval, 2),
        "unit": "ms/step saved by interval metric fetch",
        "ms_per_step_fetch_every": round(ms_every, 2),
        f"ms_per_step_fetch_interval{cfg.log_interval}": round(
            ms_interval, 2),
        "samples_fetch_every": [round(v, 1) for v in every_s],
        "samples_fetch_interval": [round(v, 1) for v in interval_s],
        "ckpt_save_return_ms_async": round(async_ret, 1),
        "ckpt_save_return_ms_sync": round(sync_ret, 1),
        "ckpt_stall_removed_ms": round(sync_ret - async_ret, 1),
        "ckpt_background_write_ms": round(async_total - async_ret, 1),
        "params": n_params,
        "batch": batch, "image_hw": [h, w], "steps": steps,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
