"""Op-level dissection of the production train step via a device trace.

Captures a jax.profiler trace of the (cached) batch-4 480x640 bf16 train
step and prints the HLO-op-category time breakdown, so the 86 ms/step
(scripts/bench_train.py) is attributable: fwd conv vs bwd conv vs BN
reductions vs optimizer vs layout/copy overhead. Uses the xplane ->
hlo_stats converter from tensorboard_plugin_profile (no new full-model
compiles — the step comes straight from .jax_cache).

Usage: python scripts/prof_train_trace.py [batch] [steps]
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def capture(batch, steps, logdir):
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rcvpose_tpu import train as train_mod
    from rcvpose_tpu.config import Config

    cfg = Config(compute_dtype="bfloat16", batch_size=batch)
    state = train_mod.create_state(cfg, jax.random.PRNGKey(0),
                                   sample_shape=(1, 64, 64, 3))
    h, w = cfg.image_height, cfg.image_width
    rng = np.random.default_rng(0)
    radial = np.zeros((batch, h, w), np.float32)
    radial[:, h // 4:3 * h // 4, w // 4:3 * w // 4] = rng.uniform(
        1, 3, size=(batch, h // 2, w // 2))
    batch_d = {
        "image": jnp.asarray(rng.normal(size=(batch, h, w, 3)), jnp.float32),
        "radial": jnp.asarray(radial),
        "sem": jnp.asarray(np.where(radial > 0, 1.0, -1.0), jnp.float32),
    }
    # EXACTLY the bench_train.py chained program (reps=32 fori_loop) so the
    # TPU compile is a .jax_cache hit; per-op times below are per 32 steps.
    reps = 32

    @jax.jit
    def run(state, batch_d):
        def body(i, carry):
            state, acc = carry
            state, m = train_mod.train_step(state, batch_d)
            return (state, acc + m["loss"])
        return jax.lax.fori_loop(0, reps, body, (state, jnp.float32(0)))

    _, acc = run(state, batch_d)   # compile (cache hit) + warm
    float(acc)

    jax.profiler.start_trace(logdir)
    for _ in range(steps):
        _, acc = run(state, batch_d)
    float(acc)
    jax.profiler.stop_trace()
    return steps * reps


def report(logdir, steps):
    """Aggregate TPU-plane op events by name from the raw xplane proto.

    (tensorboard_plugin_profile's converter needs a matching TF build;
    TF's bundled xplane_pb2 parses the trace directly.)
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    assert xplanes, f"no xplane under {logdir}"
    sp = xplane_pb2.XSpace()
    with open(max(xplanes, key=os.path.getmtime), "rb") as f:
        sp.ParseFromString(f.read())
    plane = next(p for p in sp.planes if "TPU" in p.name)
    emeta = plane.event_metadata
    smeta = plane.stat_metadata
    rows = {}
    for line in plane.lines:
        if "XLA Op" not in line.name and "xla op" not in line.name.lower():
            continue
        for ev in line.events:
            md = emeta[ev.metadata_id]
            cat = "?"
            for st in list(ev.stats) + list(md.stats):
                if smeta[st.metadata_id].name == "hlo_category":
                    cat = st.str_value or smeta.get(
                        st.ref_value, xplane_pb2.XStatMetadata()).name
            key = (md.name, cat)
            dur = ev.duration_ps / 1e6  # ps -> us
            t, n = rows.get(key, (0.0, 0))
            rows[key] = (t + dur, n + 1)
    return [{"name": k[0], "category": k[1], "us": v[0], "count": v[1]}
            for k, v in rows.items()], [ln.name for ln in plane.lines]


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    logdir = f"/tmp/rcvpose_train_trace_b{batch}"
    steps = capture(batch, steps, logdir)
    rows, lines = report(logdir, steps)
    print("trace lines:", lines)
    cat_time = {}
    total = 0.0
    for r in rows:
        cat_time[r["category"]] = cat_time.get(r["category"], 0.0) + r["us"]
        total += r["us"]
    print(f"total device time: {total/1e3/steps:.2f} ms/step "
          f"over {steps} chained steps")
    for cat, t in sorted(cat_time.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:40s} {t/1e3/steps:8.3f} ms/step  {100*t/total:5.1f}%")
    print("-- top 25 ops --")
    for r in sorted(rows, key=lambda r: -r["us"])[:25]:
        print(f"  {r['us']/1e3/steps:8.4f} ms/step x{r['count']:5d}  "
              f"[{r['category']}] {r['name'][:110]}")
    # The layout-copy bucket, named: the PERF.md round-3 attribution
    # (input->stem-conv retiling, 5-D upsample stack relayouts, H-minor
    # flip-flops around the full-res conv chains, f32 BN-backward
    # re-blocking) comes from reading these shapes/layouts.
    fmt = [r for r in rows if r["category"] == "data formatting"]
    fmt_total = sum(r["us"] for r in fmt)
    print(f"-- top 15 'data formatting' (layout copies): "
          f"{fmt_total/1e3/steps:.2f} ms/step over {len(fmt)} ops --")
    for r in sorted(fmt, key=lambda r: -r["us"])[:15]:
        print(f"  {r['us']/1e3/steps:8.4f} ms/step x{r['count']:5d}  "
              f"{r['name'][:150]}")


if __name__ == "__main__":
    main()
