"""Benchmark harness — prints ONE JSON line for the driver.

Measures the end-to-end RGB-D pose path on the available accelerator:
DenseFCNResNet152 forward (480x640, bf16) + 3x radial-vote accumulation
(hier mode Pallas path on TPU) + Horn fit, per frame. This is the per-frame
compute of the reference eval pipeline (AccumulatorSpace.py:564-662), which
the reference instrumented but never reported (net_time/acc_time,
SURVEY.md §6).

Baseline: the BASELINE.json north star of 30 RGB-D frames/sec/chip.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 30.0  # north-star target (BASELINE.md)


def build_frame_fn(cfg):
    """The flagship serving path: infer.frame_pose — 3 per-keypoint nets run
    sequentially (measured 3x faster than a vmapped stacked-params forward
    on v5e; see infer.py) + 3x hier voting + Horn fit, all one compiled
    program (BASELINE.json config #2: LINEMOD 'ape' full 3-keypoint
    pipeline)."""
    from rcvpose_tpu import infer
    from rcvpose_tpu import train as train_mod
    from rcvpose_tpu import geometry

    model = train_mod.build_model(cfg)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    variables_list = [
        jax.tree.map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
            model.init(jax.random.PRNGKey(i),
                       jnp.zeros((1, 64, 64, 3), jnp.float32), False))
        for i in range(3)]
    stacked = tuple(variables_list)  # pre-cast, unstacked serving weights
    k = jnp.asarray(geometry.LINEMOD_K, jnp.float32)

    def frame(stacked, image_norm, depth, max_radii, gt_kpts_mm):
        out = infer.frame_pose(
            model.apply, stacked, image_norm, depth, k, max_radii,
            gt_kpts_mm, sem_threshold=0.8, n_points=cfg.max_points,
            grid_l=cfg.vote_grid_l, mode=cfg.vote_mode)
        return out["rt"], out["centers"]

    reps = 20

    @jax.jit
    def run_frames(stacked, image_norm, depth, max_radii, gt_kpts_mm):
        """reps chained frames in one program: measures steady-state
        per-frame device time the way a pipelined serving loop sees it
        (per-dispatch host/tunnel latency amortized away)."""
        def body(i, carry):
            img, acc = carry
            rt, centers = frame(stacked, img, depth, max_radii, gt_kpts_mm)
            # true data dependence so the loop body cannot be hoisted
            return (img + rt[0, 0] * 1e-20, acc + rt)
        _, acc = jax.lax.fori_loop(
            0, reps, body, (image_norm, jnp.zeros((4, 4), jnp.float32)))
        return acc

    return jax.jit(frame), run_frames, reps, stacked


def _time_loop(fn, iters):
    """Average seconds per call, forcing completion via a host fetch of the
    final result (block_until_ready alone is unreliable under the axon
    tunnel)."""
    out = fn()
    np.asarray(jax.tree.leaves(out)[0])  # warm + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    import os
    import sys

    from rcvpose_tpu.config import Config

    backend = jax.default_backend()
    from rcvpose_tpu.ops.voting import suggest_grid_l
    # LINEMOD 'ape'-class sizing: ~0.10 m diameter, ~2 dm max keypoint radius
    grid_l = suggest_grid_l(0.102, 2.0)
    cfg = Config(compute_dtype="bfloat16" if backend != "cpu" else "float32",
                 vote_grid_l=grid_l if backend != "cpu" else 64,
                 max_points=8192 if backend != "cpu" else 1024,
                 vote_mode="hier")

    frame_fn, run_frames, reps, variables = build_frame_fn(cfg)

    rng = np.random.default_rng(0)
    h, w = (480, 640) if backend != "cpu" else (96, 128)
    image = jnp.asarray(rng.normal(size=(h, w, 3)), jnp.float32)
    depth = np.zeros((h, w), np.float32)
    ys, xs = np.mgrid[h // 3:2 * h // 3, w // 3:2 * w // 3]
    depth[ys, xs] = rng.uniform(600, 900, size=ys.shape)
    depth = jnp.asarray(depth)
    max_radii = jnp.asarray([2.0, 2.2, 2.4], jnp.float32)
    gt_kpts = jnp.asarray(rng.normal(size=(3, 3)) * 100, jnp.float32)

    # warm/compile, then time the chained frame loop
    np.asarray(run_frames(variables, image, depth, max_radii, gt_kpts))
    t0 = time.perf_counter()
    np.asarray(run_frames(variables, image, depth, max_radii, gt_kpts))
    dt = (time.perf_counter() - t0) / reps
    iters = 10 if backend != "cpu" else 2
    fps = 1.0 / dt

    # Per-stage timings + accumulator throughput (BASELINE.md requires
    # Mvotes/s to be *reported*, not hidden behind an env var).
    from rcvpose_tpu import eval as eval_mod
    from rcvpose_tpu import train as train_mod
    from rcvpose_tpu import geometry

    model = train_mod.build_model(cfg)
    net = jax.jit(lambda v, x: model.apply(v, x, False))
    one_vars = variables[0]
    dt_net = _time_loop(lambda: net(one_vars, image[None]), iters)
    seg, radial = net(one_vars, image[None])
    sem_map = seg[0, :, :, 0]
    radial_map = radial[0, :, :, 0]
    k = jnp.asarray(geometry.LINEMOD_K, jnp.float32)

    def one_vote(mode=cfg.vote_mode):
        return eval_mod.keypoint_from_maps(
            sem_map, radial_map, depth, k, jnp.float32(2.0),
            jnp.float32(0.8), n_points=cfg.max_points,
            grid_l=cfg.vote_grid_l, mode=mode)[0]
    dt_vote = _time_loop(one_vote, iters)
    # Pair-evaluations the hier mode actually performs per keypoint...
    hier_evals = cfg.max_points * ((cfg.vote_grid_l // 4) ** 3 + 4 * 16 ** 3)
    mvotes = hier_evals / dt_vote / 1e6
    # ...and the O(N*L^3) evaluations the reference loop needs for the same
    # keypoint (its Mvotes/s equivalent throughput at our wall-clock).
    ref_evals = cfg.max_points * cfg.vote_grid_l ** 3
    mvotes_ref_equiv = ref_evals / dt_vote / 1e6

    # Exact (reference-equivalent) mode at the same production size; on the
    # single-core CPU fallback this is ~17G pair-evals, so TPU only.
    dt_exact = None
    if backend != "cpu":
        dt_exact = _time_loop(lambda: one_vote("exact"), max(2, iters // 2))
        mvotes_exact = ref_evals / dt_exact / 1e6

    fit_iters = iters * 10
    from rcvpose_tpu import fit as fit_mod
    gt_dev = jnp.asarray(gt_kpts)
    est_dev = gt_dev + 1.0
    horn = jax.jit(fit_mod.horn_fit)
    dt_fit = _time_loop(lambda: horn(gt_dev, est_dev), fit_iters)

    print(f"stages: net={dt_net*1e3:.2f} ms  vote(1kpt,{cfg.vote_mode})="
          f"{dt_vote*1e3:.2f} ms  fit={dt_fit*1e3:.3f} ms  "
          f"frame={dt*1e3:.2f} ms", file=sys.stderr)
    print(f"accumulator: {mvotes:.0f} M pair-evals/s (hier), "
          f"{mvotes_ref_equiv:.0f} M reference-equivalent votes/s"
          + (f"; exact mode {dt_exact*1e3:.1f} ms/kpt "
             f"({mvotes_exact:.0f} M votes/s)" if dt_exact else ""),
          file=sys.stderr)

    record = {
        "metric": "rgbd_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "net_ms": round(dt_net * 1e3, 3),
        "vote_ms_per_kpt": round(dt_vote * 1e3, 3),
        "fit_ms": round(dt_fit * 1e3, 4),
        "frame_ms": round(dt * 1e3, 3),
        "mvotes_per_sec": round(mvotes, 1),
        "mvotes_ref_equiv_per_sec": round(mvotes_ref_equiv, 1),
        "vote_grid_l": cfg.vote_grid_l,
        "vote_points": cfg.max_points,
    }
    if dt_exact is not None:
        record["exact_vote_ms_per_kpt"] = round(dt_exact * 1e3, 3)
        record["exact_mvotes_per_sec"] = round(mvotes_exact, 1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
