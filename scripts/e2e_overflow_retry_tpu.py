"""Measure the eval grid-overflow retry path on real hardware.

The evaluators guard mask-noise outliers with a host-side retry: when a
frame's dynamic cloud extent overflows the class-sized vote cube
(``voting.accumulate_3d``'s ``overflow`` flag — the reference sizes its
grid dynamically per frame, AccumulatorSpace.py:394-401, so it never
overflows but pays a data-dependent shape every frame), the frame re-runs
at ``retry_grid_l=256`` (``eval.keypoint_with_retry``). The retry is
CPU-mesh tested; this script measures its HARDWARE behavior once: the
cold cost of the first retry (one extra grid-256 program compile) and the
warm per-call cost, against the clean-frame baseline, plus a full
evaluator sweep proving the adversarial frame routes through the retry
and both frames still score.

The adversarial frame is a clean fixture render with ONE depth pixel
pushed ~0.9 m behind the object and a valid radial value at that pixel —
exactly the mask-noise outlier the retry exists for: bound lands between
grid 192 and the 256 retry.

Run: python scripts/e2e_overflow_retry_tpu.py            (TPU)
     python scripts/e2e_overflow_retry_tpu.py --small    (CPU smoke)
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="CPU smoke")
    args = ap.parse_args()

    import jax

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    from rcvpose_tpu.utils import setup_script_cache
    setup_script_cache(cpu=args.small)

    import jax.numpy as jnp

    from rcvpose_tpu import eval as eval_mod
    from rcvpose_tpu import geometry
    from rcvpose_tpu.config import Config
    from rcvpose_tpu.data import readers
    from tests.test_data import write_dpt
    from tests.test_eval_lm_format import make_lm_eval_tree

    tmp = tempfile.mkdtemp()
    tree = make_lm_eval_tree(pathlib.Path(tmp), np.random.default_rng(0))

    cfg = Config(root_dataset=tree, using_ckpts=False,
                 compute_dtype="float32", vote_grid_l=192, max_points=2048,
                 vote_mode="hier", icp_iters=10, eval_data_parallel=False,
                 vote_topk=64)
    source = eval_mod.RadialMapSource(cfg, "ape")
    k = jnp.asarray(geometry.LINEMOD_K, jnp.float32)
    cad_m = eval_mod._read_eval_cad_m(
        os.path.join(tree, "LINEMOD", "ape", "ape.ply"))
    keypoints = np.load(os.path.join(tree, "LINEMOD", "ape", "Outside9.npy"))
    max_radii = eval_mod._per_kpt_max_radii_dm(cad_m, keypoints)
    mr = jnp.float32(max_radii[0])
    thr = jnp.float32(cfg.sem_threshold)

    def maps(frame_id):
        return source.maps(1, None, frame_id)

    first_call_ms = {}  # grid_l -> first dispatch cost (compile-inclusive)

    def one_kpt(sem, rad, dep, grid_l):
        t0 = time.perf_counter()
        out = jax.block_until_ready(eval_mod.keypoint_from_maps(
            sem, rad, dep, k, mr, thr, n_points=cfg.max_points,
            grid_l=grid_l, mode=cfg.vote_mode, topk=cfg.vote_topk))
        first_call_ms.setdefault(grid_l, (time.perf_counter() - t0) * 1e3)
        return out

    # Adversarial frame 000001: one depth pixel pushed behind the object
    # with a small valid radial — the mask-noise outlier the retry exists
    # for. The vote frame's bound is a GLOBAL min/max across axes (like the
    # reference's, AccumulatorSpace.py:394-401), so pick the outlier depth
    # empirically: smallest offset whose cloud overflows grid 192 but fits
    # the 256 retry.
    orig = os.path.join(tree, "LINEMOD_ORIG", "ape", "data", "depth1.dpt")
    depth = readers.read_depth(orig).astype(np.uint16)
    z_obj = float(depth[depth > 0].mean())
    p1 = None
    for kp in range(1, 4):
        p = os.path.join(tree, "LINEMOD_ORIG", "estRadialMap", "ape",
                         f"Out_pt{kp}_dm", "000001.npy")
        p1 = p1 or p
        r = np.load(p)
        r[2, 2] = 1.0  # valid (below every max-radius clip)
        np.save(p, r)
    # probe with keypoint 1's map AND keypoint 1's max radius (mr above)
    rad1_np = np.load(p1)
    sem1 = jnp.asarray((rad1_np != 0).astype(np.float32))
    rad1 = jnp.asarray(rad1_np)
    for dz in range(300, 1600, 100):
        depth[2, 2] = np.uint16(z_obj + dz)
        d1 = jnp.asarray(depth.astype(np.float32))
        over_base = bool(one_kpt(sem1, rad1, d1, cfg.vote_grid_l)[1])
        over_retry = bool(one_kpt(sem1, rad1, d1, 256)[1])
        if over_base and not over_retry:
            break
    else:
        raise SystemExit("no outlier offset lands between grid 192 and 256")
    write_dpt(orig, depth)
    print(f"outlier at z_obj + {dz} mm: overflows 192, fits 256",
          file=sys.stderr)

    def load_depth(i):
        return jnp.asarray(readers.read_depth(os.path.join(
            tree, "LINEMOD_ORIG", "ape", "data",
            f"depth{i}.dpt")).astype(np.float32))

    sem0, rad0 = maps("000000")
    sem1, rad1 = maps("000001")
    d0, d1 = load_depth(0), load_depth(1)

    def retry_call(sem, rad, dep):
        t0 = time.perf_counter()
        out = jax.block_until_ready(eval_mod.keypoint_with_retry(
            cfg, sem, rad, dep, k, mr, thr))
        return (time.perf_counter() - t0) * 1e3, out

    retry_call(sem0, rad0, d0)  # warm the retry wrapper on the clean frame
    clean_ms = min(retry_call(sem0, rad0, d0)[0] for _ in range(3))
    # warm retry-path cost: base grid-192 run (flags overflow) + grid-256
    # re-run — both programs already compiled, so this is the steady-state
    # cost every overflowed frame pays
    warm_ms, out_warm = retry_call(sem1, rad1, d1)
    warm_ms = min([warm_ms] + [retry_call(sem1, rad1, d1)[0]
                               for _ in range(2)])
    assert not bool(out_warm[1]), "retry at grid 256 still overflowed"

    # full evaluator sweep: the adversarial frame routes through the retry
    # inside the production loop (the sequential loop counts frames whose
    # keypoint_with_retry fallback fired) and both frames still score
    res = eval_mod.estimate_6d_pose_lm(cfg, class_names=["ape"],
                                       progress=lambda *_: None)["ape"]
    assert res["frames"] == 2, res
    assert res["overflow_frames"] == 1, res  # exactly the adversarial frame

    print(json.dumps({
        "metric": "overflow_retry_warm_ms_per_kpt",
        "value": round(warm_ms, 1),
        "unit": "ms",
        "clean_frame_ms_per_kpt": round(clean_ms, 1),
        "retry_grid256_first_call_ms": round(first_call_ms.get(256, 0), 1),
        "base_grid192_first_call_ms": round(
            first_call_ms.get(cfg.vote_grid_l, 0), 1),
        "outlier_dz_mm": dz,
        "grid_l": cfg.vote_grid_l, "retry_grid_l": 256,
        "eval_add_before_icp": res["add_before_icp"],
        "eval_add_after_icp": res["add_after_icp"],
        "frames": res["frames"],
        "backend": jax.default_backend(),
        "note": ("warm = per-keypoint cost of an overflowed frame with "
                 "both programs compiled (grid-192 run + grid-256 rerun); "
                 "first_call = one-time compile-inclusive dispatch costs; "
                 "clean = grid-192 baseline per keypoint"),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
