"""Decompose the batched-serving gap: nets vs pack/vote/fit stage.

frame_pose_batch at B=4 measures slower per frame than chained single
frames. This isolates the two halves on the production model/shapes:

  net:    3 per-keypoint forwards at B=1 (x4 chained) vs at B=4
  stage:  _pose_from_maps on one frame's maps vs _scan_pose_from_maps
          over B=4 frames' maps

Device-true chained timing (see bench.py). Prints one JSON line.
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


def chain(fn, args, x0, reps=8, runs=3):
    @jax.jit
    def run(*a):
        x = a[-1]

        def body(i, carry):
            x, acc = carry
            m = fn(*a[:-1], x)
            return (x + (m * 1e-12).astype(x.dtype), acc + m)
        _, acc = jax.lax.fori_loop(0, reps, body, (x, jnp.float32(0)))
        return acc
    float(run(*args, x0))
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        float(run(*args, x0))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    from rcvpose_tpu import geometry, infer
    from rcvpose_tpu import train as train_mod
    from rcvpose_tpu.config import Config

    cfg = Config(compute_dtype="bfloat16", vote_grid_l=128, max_points=8192,
                 vote_mode="hier")
    model = train_mod.build_model(cfg)
    dtype = jnp.bfloat16
    vs = tuple(
        jax.tree.map(lambda a: a.astype(dtype) if a.dtype == jnp.float32
                     else a,
                     model.init(jax.random.PRNGKey(i),
                                jnp.zeros((1, 64, 64, 3), jnp.float32),
                                False))
        for i in range(3))
    h, w, b = 480, 640, 4
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.normal(size=(1, h, w, 3)), jnp.float32)
    imgb = jnp.asarray(rng.normal(size=(b, h, w, 3)), jnp.float32)
    k = jnp.asarray(geometry.LINEMOD_K, jnp.float32)
    max_radii = jnp.asarray([2.0, 2.2, 2.4], jnp.float32)
    gt_kpts = jnp.asarray(rng.normal(size=(3, 3)) * 100, jnp.float32)
    depth = np.zeros((h, w), np.float32)
    ys, xs = np.mgrid[h // 3:2 * h // 3, w // 3:2 * w // 3]
    depth[ys, xs] = rng.uniform(600, 900, size=ys.shape)
    depth1 = jnp.asarray(depth)
    depthb = jnp.broadcast_to(depth1, (b, h, w))

    def nets(vars_, img):
        outs = [model.apply(v, img, False)[1] for v in vars_]
        return sum(o.astype(jnp.float32).mean() for o in outs)

    t_net1 = chain(nets, (vs,), img1, reps=8)
    t_netb = chain(nets, (vs,), imgb, reps=4)

    # stage: maps -> pose (single vs scanned batch), maps precomputed
    seg, radial = jax.jit(lambda v, x: model.apply(v, x, False))(vs[0], img1)
    sem1 = jnp.broadcast_to(seg[0, :, :, 0], (3, h, w))
    rad1 = jnp.asarray(jnp.broadcast_to(radial[0, :, :, 0], (3, h, w)),
                       jnp.float32)
    semb = jnp.broadcast_to(sem1, (b, 3, h, w))
    radb = jnp.broadcast_to(rad1, (b, 3, h, w))

    def stage1(sem, dep, rad):
        out = infer._pose_from_maps(sem, rad, dep, k, max_radii, gt_kpts,
                                    0.8, cfg.max_points, cfg.vote_grid_l,
                                    "hier", False)
        return out["rt"].astype(jnp.float32).mean()

    def stageb(sem, dep, rad):
        out = infer._scan_pose_from_maps(sem, rad, dep, k, max_radii,
                                         gt_kpts, 0.8, cfg.max_points,
                                         cfg.vote_grid_l, "hier", False)
        return out["rt"].astype(jnp.float32).mean()

    t_stage1 = chain(stage1, (sem1, depth1), rad1, reps=8)
    t_stageb = chain(stageb, (semb, depthb), radb, reps=4)

    print(json.dumps({
        "net3_B1_ms": round(t_net1 * 1e3, 2),
        "net3_B4_ms_per_frame": round(t_netb / b * 1e3, 2),
        "stage_B1_ms": round(t_stage1 * 1e3, 2),
        "stage_B4_scan_ms_per_frame": round(t_stageb / b * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
