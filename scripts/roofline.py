"""Roofline check: how close is each serving stage to v5e speed-of-light?

For the flagship serving stages (net forward, hier vote, Horn fit) this
pulls FLOP and HBM-byte counts from XLA's own cost model
(``compiled.cost_analysis()``), measures device-true time with the same
chained-loop methodology as bench.py, and reports utilization against the
chip's peaks. This quantifies the "speed-of-light" claim in PERF.md: a
stage near the compute roof cannot be made faster without changing its
math; a stage near the bandwidth roof needs fusion/layout work, not FLOPs.

Peaks (TPU v5e, public spec): 197 TFLOP/s bf16, 819 GB/s HBM.

Run on the TPU:  python scripts/roofline.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_FLOPS = 197e12
V5E_HBM_BPS = 819e9


def cost(jitted, *args):
    """(flops, hbm_bytes) from XLA's cost model for a jitted fn.

    Callers must pass the SAME reduced-output program that is timed
    (`chain_time` bodies reduce to a scalar): costing a full-output
    variant would count output HBM writes the timed program elides,
    overstating %HBM-roof (possibly past 100%).
    """
    c = jitted.lower(*args).compile().cost_analysis()
    if isinstance(c, list):  # older jax returns one dict per device
        c = c[0]
    if not c:  # some backend/jax versions return None/{}
        raise RuntimeError(
            "compiled.cost_analysis() returned nothing on this "
            f"backend ({jax.default_backend()}); roofline needs XLA's "
            "cost model")
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def main():
    from bench import chain_time
    from rcvpose_tpu import eval as eval_mod
    from rcvpose_tpu import fit as fit_mod
    from rcvpose_tpu import geometry
    from rcvpose_tpu import train as train_mod
    from rcvpose_tpu.config import Config
    from rcvpose_tpu.ops.voting import suggest_grid_l

    backend = jax.default_backend()
    grid_l = suggest_grid_l(0.102, 2.0)
    cfg = Config(compute_dtype="bfloat16" if backend != "cpu" else "float32",
                 vote_grid_l=grid_l if backend != "cpu" else 64,
                 max_points=8192 if backend != "cpu" else 1024)
    h, w = (480, 640) if backend != "cpu" else (96, 128)

    model = train_mod.build_model(cfg)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    variables = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
        model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 64, 3), jnp.float32), False))

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(1, h, w, 3)), jnp.float32)
    depth = np.zeros((h, w), np.float32)
    ys, xs = np.mgrid[h // 3:2 * h // 3, w // 3:2 * w // 3]
    depth[ys, xs] = rng.uniform(600, 900, size=ys.shape)
    depth = jnp.asarray(depth)
    k = jnp.asarray(geometry.LINEMOD_K, jnp.float32)

    rows = []

    # --- net forward --- (cost from the same reduced program as timed)
    fwd_red = lambda v, im: (  # noqa: E731
        model.apply(v, im, False)[1].astype(jnp.float32).mean())
    flops, hbm = cost(jax.jit(fwd_red), variables, image)
    dt = chain_time(fwd_red, (variables,), image,
                    reps=128 if backend != "cpu" else 8)
    rows.append(("net fwd 480x640 bf16", "bf16", flops, hbm, dt))

    fwd = jax.jit(lambda v, x: model.apply(v, x, False))
    seg, radial = fwd(variables, image)
    sem_map = seg[0, :, :, 0]
    radial_map = jnp.asarray(radial[0, :, :, 0], jnp.float32)

    # --- hier vote (one keypoint) ---
    def vote(sem, dep, rad):
        return eval_mod.keypoint_from_maps(
            sem, rad, dep, k, jnp.float32(2.0), jnp.float32(0.8),
            n_points=cfg.max_points, grid_l=cfg.vote_grid_l,
            mode="hier")[0].astype(jnp.float32).mean()

    jv = jax.jit(vote)
    flops, hbm = cost(jv, sem_map, depth, radial_map)
    dt = chain_time(vote, (sem_map, depth), radial_map,
                    reps=256 if backend != "cpu" else 16)
    rows.append((f"hier vote {cfg.max_points}pts L={cfg.vote_grid_l}",
                 "f32/VPU", flops, hbm, dt))

    # --- Horn fit ---
    gt = jnp.asarray(rng.normal(size=(3, 3)) * 100, jnp.float32)
    fitfn = lambda a, b: fit_mod.horn_fit(a, b).astype(jnp.float32).mean()  # noqa: E731
    jf = jax.jit(fitfn)
    flops, hbm = cost(jf, gt, gt + 1.0)
    dt = chain_time(fitfn, (gt,), gt + 1.0,
                    reps=1024 if backend != "cpu" else 64)
    rows.append(("horn fit 3kpt", "f32/VPU", flops, hbm, dt))

    on_tpu = backend == "tpu"
    print(f"backend={backend}  peaks: {V5E_BF16_FLOPS/1e12:.0f} TFLOP/s "
          f"bf16, {V5E_HBM_BPS/1e9:.0f} GB/s HBM"
          + ("" if on_tpu else "  [%roof columns N/A off-TPU]"))
    print(f"{'stage':36s} {'dtype':>8s} {'ms':>8s} {'GFLOP':>9s} {'GB':>7s} "
          f"{'%FLOP-roof':>10s} {'%HBM-roof':>9s} {'bound':>6s}")
    for name, dty, flops, hbm, dt in rows:
        if not on_tpu:  # v5e peaks are meaningless against CPU timings
            print(f"{name:36s} {dty:>8s} {dt*1e3:8.2f} {flops/1e9:9.2f} "
                  f"{hbm/1e9:7.3f} {'N/A':>10s} {'N/A':>9s} {'N/A':>6s}")
            continue
        fu = flops / dt / V5E_BF16_FLOPS * 100
        bu = hbm / dt / V5E_HBM_BPS * 100
        bound = "flops" if fu > bu else "hbm"
        print(f"{name:36s} {dty:>8s} {dt*1e3:8.2f} {flops/1e9:9.2f} "
              f"{hbm/1e9:7.3f} {fu:10.1f} {bu:9.1f} {bound:>6s}")
    if on_tpu:
        print("note: %FLOP-roof is vs the bf16 MXU peak; for f32/VPU-"
              "dominated stages (vote, fit) that roof is unreachable, so "
              "their %FLOP-roof is a lower bound and the hbm/flops 'bound' "
              "call should be read from the HBM column.")


if __name__ == "__main__":
    main()
