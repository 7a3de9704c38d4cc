"""Device-true training-step throughput for the production model.

Measured separately from bench.py (the driver's per-round benchmark) so
the fwd+bwd compile of the full 152-layer model does not sit on the
driver's critical path. Batches live on device; the step is chained in one
fori_loop, so host/tunnel feeding costs are excluded — this is the number
the pjit DP trainer sees per chip once an input pipeline keeps up.

Usage: python scripts/bench_train.py [batch] [height] [width] [--remat]
                                     [--accum N]

``--accum N`` runs the gradient-accumulation step (batch is the GLOBAL
batch; each optimizer step scans N microbatches of batch/N). The imgs/s
reported stays images-consumed per wall second, directly comparable to
the plain rows.

The default batch is 8 — the measured per-chip throughput recipe (PERF.md
"Batch-size curve": +28% imgs/s over the reference's batch 4; 10 and 12
sit in a memory-space-assignment cliff). Batch size is a hyperparameter,
not reference semantics — pass 4 to measure the reference configuration.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    remat = "--remat" in sys.argv
    accum = 1
    argv = []
    it = iter(a for a in sys.argv if a != "--remat")
    for a in it:
        if a == "--accum":
            accum = int(next(it))
        else:
            argv.append(a)
    batch = int(argv[1]) if len(argv) > 1 else 8
    h = int(argv[2]) if len(argv) > 2 else 480
    w = int(argv[3]) if len(argv) > 3 else 640

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rcvpose_tpu import train as train_mod
    from rcvpose_tpu.config import Config

    cfg = Config(compute_dtype="bfloat16", image_height=h, image_width=w,
                 batch_size=batch, remat=remat, accum_steps=accum)
    state = train_mod.create_state(cfg, jax.random.PRNGKey(0),
                                   sample_shape=(1, 64, 64, 3))
    rng = np.random.default_rng(0)
    radial = np.zeros((batch, h, w), np.float32)
    radial[:, h // 4:3 * h // 4, w // 4:3 * w // 4] = rng.uniform(
        1, 3, size=(batch, h // 2, w // 2))
    batch_d = {
        "image": jnp.asarray(rng.normal(size=(batch, h, w, 3)), jnp.float32),
        "radial": jnp.asarray(radial),
        "sem": jnp.asarray(np.where(radial > 0, 1.0, -1.0), jnp.float32),
    }

    reps = 32

    step_fn = (train_mod.make_accum_train_step(accum) if accum > 1
               else train_mod.train_step)

    @jax.jit
    def run(state, batch_d):
        def body(i, carry):
            state, acc = carry
            state, m = step_fn(state, batch_d)
            return (state, acc + m["loss"])
        return jax.lax.fori_loop(0, reps, body, (state, jnp.float32(0)))

    t0 = time.time()
    state2, acc = run(state, batch_d)
    float(acc)
    print(f"compile+first: {time.time() - t0:.1f} s", file=sys.stderr)
    # XLA's FLOP count for ONE train step (fwd+bwd+optimizer), from the
    # pre-compile lowering — .compile() here would bypass the persistent
    # cache and recompile for minutes; the lowered cost_analysis is HLO
    # arithmetic and instant. MFU is against the v5e bf16 MXU peak.
    # jnp.shape/result_type: the state pytree carries scalar leaves (step)
    sds = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        (state, batch_d))

    def _flops():
        lw = jax.jit(step_fn).lower(*sds)
        return float((lw.cost_analysis() or {}).get("flops", 0.0))

    try:
        flops_per_step = _flops()
    except Exception:
        flops_per_step = 0.0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, acc = run(state, batch_d)
        float(acc)
        best = min(best, (time.perf_counter() - t0) / reps)
    backend = jax.default_backend()
    if not flops_per_step:
        # The axon remote-compile backend exposes no cost model from a bare
        # lowering; re-lower for the CPU client (FLOPs are backend-
        # independent HLO arithmetic). Done AFTER timing: switching
        # platforms tears down the TPU backend for this process — and the
        # previous platform value is restored in the finally so anything
        # that runs after main() in-process is not silently pinned to CPU.
        prev_platforms = jax.config.jax_platforms
        try:
            jax.extend.backend.clear_backends()
            jax.config.update("jax_platforms", "cpu")
            flops_per_step = _flops()
        except Exception:
            flops_per_step = 0.0
        finally:
            jax.extend.backend.clear_backends()
            jax.config.update("jax_platforms", prev_platforms)
    peak = 197e12  # v5e bf16 MXU peak FLOP/s
    mfu = (flops_per_step / best / peak
           if flops_per_step and backend == "tpu" else None)
    import json
    print(json.dumps({
        "metric": "train_step_ms", "value": round(best * 1e3, 2),
        "imgs_per_sec": round(batch / best, 2), "batch": batch,
        "resolution": [h, w], "remat": remat, "accum_steps": accum,
        "tflops_per_step": (round(flops_per_step / 1e12, 2)
                            if flops_per_step else None),
        "mfu_vs_bf16_peak": round(mfu, 3) if mfu else None,
        "backend": backend,
        "recommended_recipe": batch == 8 and (h, w) == (480, 640),
        "model": "DenseFCNResNet152 (full, bf16 compute, f32 params)"}))


if __name__ == "__main__":
    main()
