"""Single CLI for the framework: train / test / benchmark.

Replaces the reference's two divergent argument parsers (main.py:13-56 and
AccumulatorSpace.py:1202-1227) — including the ``--using_ckpts`` flag that
main.py forgot — with one parser over the typed Config. Boolean flags are
real booleans (the reference's ``type=bool`` flags were always truthy,
main.py:50-55).
"""

from __future__ import annotations

import argparse
import dataclasses
import math

from rcvpose_tpu.config import Config


def build_parser():
    parser = argparse.ArgumentParser(prog="rcvpose-tpu")
    defaults = Config()
    parser.add_argument("--mode", default=defaults.mode,
                        choices=["train", "test", "benchmark", "gen-labels",
                                 "export-torch", "serve", "check-data"])
    parser.add_argument("--dname", "--dataset", dest="dataset",
                        default=defaults.dataset, choices=["lm", "lmo", "ycb"])
    parser.add_argument("--root_dataset", default=defaults.root_dataset)
    parser.add_argument("--class_name", default=defaults.class_name)
    parser.add_argument("--kpt_num", type=int, default=defaults.kpt_num)
    parser.add_argument("--optim", default=defaults.optim,
                        choices=["adam", "sgd", "Adam", "SGD"])
    parser.add_argument("--batch_size", type=int, default=defaults.batch_size)
    parser.add_argument("--initial_lr", type=float,
                        default=defaults.initial_lr)
    parser.add_argument("--max_iterations", type=int,
                        default=defaults.max_iterations)
    parser.add_argument("--resume_train", action="store_true")
    parser.add_argument("--model_dir", default=defaults.model_dir)
    parser.add_argument("--out_dir", default=defaults.out_dir)
    parser.add_argument("--model_blocks", default=defaults.model_blocks,
                        help='stage depths, e.g. "1,1,1,1"; "" = ResNet-152')
    parser.add_argument("--model_width", type=float,
                        default=defaults.model_width,
                        help="channel multiplier (power-of-two fraction)")
    parser.add_argument("--kpt_heads", type=int, default=defaults.kpt_heads,
                        help="1 = reference per-keypoint nets; 3 = one "
                             "fused multi-head net (TPU-first extension)")
    parser.add_argument("--model", default=defaults.model,
                        choices=["dense", "res"])
    parser.add_argument("--compute_dtype", default=defaults.compute_dtype,
                        choices=["bfloat16", "float32"])
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize encoder blocks in backward "
                             "(bigger train batches per chip, PERF.md)")
    parser.add_argument("--fast_head", action="store_true",
                        help="conv7/conv8 head at H/2 + upsampled output "
                             "(faster forward; not the reference forward — "
                             "see PERF.md)")
    parser.add_argument("--vote_mode", default=defaults.vote_mode,
                        choices=["hier", "exact", "surface"])
    parser.add_argument("--vote_grid_l", type=int,
                        default=defaults.vote_grid_l)
    parser.add_argument("--vote_topk", type=int, default=defaults.vote_topk,
                        help="hier refine windows (default 32; 64 "
                             "reproduces the exact mode's keypoint on every "
                             "measured suite incl. adversarial clutter — "
                             "recommended for LMO eval, PERF.md)")
    parser.add_argument("--vote_cpt_stride", type=int,
                        default=defaults.vote_cpt_stride,
                        help="hier coarse-stage point subsample (default 4)")
    parser.add_argument("--vote_win", type=int, default=defaults.vote_win,
                        help="hier refine window side (default 8)")
    parser.add_argument("--max_points", type=int,
                        default=defaults.max_points,
                        help="padded point-cloud size for voting")
    parser.add_argument("--retry_grid_l", type=int,
                        default=defaults.retry_grid_l,
                        help="vote-grid side for the overflow retry; a "
                             "frame still overflowing after the retry is "
                             "reported as overflow_after_retry")
    parser.add_argument("--pack_win_h", type=int, default=defaults.pack_win_h,
                        help="serving point-packing window height px (0 = "
                             "derive from class geometry)")
    parser.add_argument("--pack_win_w", type=int, default=defaults.pack_win_w,
                        help="serving point-packing window width px (0 = "
                             "derive from class geometry)")
    parser.add_argument("--pack_z_min_mm", type=float,
                        default=defaults.pack_z_min_mm,
                        help="nearest expected object depth for the derived "
                             "packing window")
    parser.add_argument("--icp_iters", type=int, default=defaults.icp_iters)
    parser.add_argument("--no_ycb_icp_converged", dest="ycb_icp_converged",
                        action="store_false",
                        default=defaults.ycb_icp_converged,
                        help="YCB eval: fixed icp_iters instead of the "
                             "reference's converge-to-tolerance ICP "
                             "(AccumulatorSpace.py:1165-1169)")
    parser.add_argument("--ycb_icp_max_iters", type=int,
                        default=defaults.ycb_icp_max_iters,
                        help="iteration cap on the converged YCB ICP")
    parser.add_argument("--icp_rel_tol", type=float,
                        default=defaults.icp_rel_tol,
                        help="convergence tolerance (fitness + RMSE "
                             "absolute per-iteration delta)")
    parser.add_argument("--serve_host", default=defaults.serve_host)
    parser.add_argument("--serve_port", type=int,
                        default=defaults.serve_port)
    parser.add_argument("--serve_classes", default=defaults.serve_classes,
                        help="comma list of extra classes to build + "
                             "compile before the serve socket opens "
                             "(cold-class warmup)")
    parser.add_argument("--serve_devices", type=int,
                        default=defaults.serve_devices,
                        help="pre-build per-chip replicas of the default "
                             "class on the first N local devices (0 = "
                             "lazy background growth under load; requests "
                             "always round-robin across free chips)")
    parser.add_argument("--log_interval", type=int,
                        default=defaults.log_interval,
                        help="fetch + TB-log train metrics every N steps "
                             "(per-step fetches host-sync the loop; the "
                             "NaN guard samples at this cadence)")
    parser.add_argument("--accum_steps", type=int,
                        default=defaults.accum_steps,
                        help="gradient accumulation: scan N microbatches "
                             "of batch_size/N per optimizer step (e.g. "
                             "--batch_size 16 --accum_steps 2 emulates "
                             "global batch 16 at microbatch-8 memory, "
                             "PERF.md 'Batch-size curve')")
    parser.add_argument("--val_interval_epochs", type=int,
                        default=defaults.val_interval_epochs,
                        help="validate + checkpoint every N epochs "
                             "(1 = reference behavior; the final epoch "
                             "always validates)")
    parser.add_argument("--using_ckpts", action="store_true", default=True)
    parser.add_argument("--no_ckpts", dest="using_ckpts",
                        action="store_false",
                        help="use precomputed estRadialMap npy files")
    parser.add_argument("--eval_classes", default=defaults.eval_classes,
                        help="comma-separated class subset for --mode test "
                             "(default: every dataset class, like the "
                             "reference)")
    parser.add_argument("--eval_data_parallel", dest="eval_data_parallel",
                        action="store_true", default=None,
                        help="--mode test: shard evaluation frames over the "
                             "device mesh (default: auto when >1 device). "
                             "Under --distributed, frames additionally "
                             "shard across processes with process-local "
                             "IO and a host-side metric reduction")
    parser.add_argument("--no_eval_data_parallel", dest="eval_data_parallel",
                        action="store_false",
                        help="force the sequential per-frame eval loop")
    parser.add_argument("--demo_mode", action="store_true")
    parser.add_argument("--demo_scene_ply", action="store_true",
                        help="demo mode also writes each frame's colored "
                             "scene cloud as <frame>_scene.ply")
    parser.add_argument("--test_occ", action="store_true")
    parser.add_argument("--fake_depth", action="store_true",
                        help="gen-labels: meter-valued FakeDepth/ maps for "
                             "the RGB-only ablation (reference "
                             "depthGeneration flag)")
    parser.add_argument("--compile_cache_dir",
                        default=defaults.compile_cache_dir,
                        help="persistent XLA compilation cache directory "
                             "(default off). TPU program compiles are "
                             "minutes; with the cache, serving restarts, "
                             "cold-class builds, and resumed runs load "
                             "them from disk in seconds (PERF.md)")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: jax.distributed.initialize() "
                             "before mesh construction (no-op on one host)")
    parser.add_argument("--seed", type=int, default=defaults.seed)
    parser.add_argument("--profile_dir", default=defaults.profile_dir,
                        help="capture a jax.profiler trace of the train/"
                             "test run into this directory (TensorBoard/"
                             "Perfetto-viewable; the reference plumbed "
                             "timers but never reported them)")
    parser.add_argument("--export_path", default=defaults.export_path,
                        help="export-torch: output .pth.tar path (default "
                             "<model_dir>/exported.pth.tar)")
    return parser


def maybe_init_distributed(cfg):
    """Multi-host runtime init, gated on ``--distributed``.

    Calls ``jax.distributed.initialize()`` before any mesh construction so a
    multi-host launch (one process per host, coordinator via JAX/cluster env
    vars) sees the global device set; ``parallel.data_mesh()`` and the pjit
    shardings then work unchanged (parallel/mesh.py). On a single host with
    no coordinator environment this is a logged no-op — local behavior is
    identical with or without the flag. Returns True iff the distributed
    runtime was initialized.
    """
    if not cfg.distributed:
        return False
    import jax

    try:
        jax.distributed.initialize()
        return True
    except Exception as exc:  # no coordinator env -> stay single-host
        print(f"distributed init skipped (single-host): {exc}")
        return False


def config_from_args(argv=None):
    args = build_parser().parse_args(argv)
    cfg = Config()
    for field in dataclasses.fields(Config):
        if hasattr(args, field.name):
            setattr(cfg, field.name, getattr(args, field.name))
    cfg.optim = cfg.optim.lower()
    return cfg


def _mesh_size_for_batch(batch_size, n_devices):
    """Largest divisor of the (global) batch that fits the device count —
    a batch of 6 on 8 devices gets a 6-device mesh, not gcd's 2."""
    for d in range(min(max(batch_size, 1), max(n_devices, 1)), 0, -1):
        if batch_size % d == 0:
            return d
    return 1


def run_train(cfg):
    import jax

    from rcvpose_tpu import parallel, train, utils
    from rcvpose_tpu.checkpoint import Checkpointer
    from rcvpose_tpu.data.loader import make_loaders

    maybe_init_distributed(cfg)
    log_dir = utils.get_log_dir(cfg)
    writer = None
    if jax.process_index() == 0:  # one TB stream per run, not per host
        try:
            from tensorboardX import SummaryWriter
            writer = SummaryWriter(logdir=log_dir + "/tbLog/")
        except ImportError:
            pass

    train_loader, val_loader = make_loaders(cfg)
    steps_per_epoch = max(len(train_loader), 1)
    # Mesh sizing. Single-host: largest divisor of the batch <= device
    # count (batch 6 on 8 devices -> 6-device mesh, not gcd's 2).
    # Multi-host: cfg.batch_size is the PER-HOST batch; size per host
    # against the LOCAL device count and span every process with the same
    # per-host slot count (data_mesh picks that many chips from each
    # process), so each host's loader shard lands on its own chips.
    nproc = jax.process_count()
    if cfg.mesh_data_axis:
        n_dev = cfg.mesh_data_axis
    elif nproc > 1:
        n_dev = nproc * _mesh_size_for_batch(cfg.batch_size,
                                             jax.local_device_count())
    else:
        n_dev = _mesh_size_for_batch(cfg.batch_size, jax.device_count())
    mesh = parallel.data_mesh(max(n_dev, 1))
    parallel.warm_collectives(mesh)  # Gloo context init BEFORE the heavy
    # step compiles — their cross-host completion skew can exceed the
    # context's fixed 30 s init deadline (see parallel/mesh.py)
    state = train.create_state(cfg, jax.random.PRNGKey(cfg.seed),
                               steps_per_epoch=steps_per_epoch)
    steps = None
    if nproc > 1:
        # AOT-compile both steps, then rendezvous at the coordination
        # service (NOT a device collective): step compiles take minutes and
        # the hosts' completion skew routinely exceeds Gloo's fixed 30 s
        # deadline — after the barrier every host enters the first step's
        # collectives within milliseconds. CPU-backend concern only, but
        # harmless on TPU pods.
        import numpy as np

        p_train, p_eval = train.make_parallel_steps(
            mesh, getattr(cfg, "accum_steps", 1) or 1)
        sh = parallel.batch_sharding(mesh)
        gb = cfg.batch_size * nproc
        hw = (cfg.image_height, cfg.image_width)
        lbl = ((gb, *hw) if cfg.kpt_heads == 1
               else (gb, *hw, cfg.kpt_heads))
        sds = {
            "image": jax.ShapeDtypeStruct((gb, *hw, 3), np.float32,
                                          sharding=sh),
            "radial": jax.ShapeDtypeStruct(lbl, np.float32, sharding=sh),
            "sem": jax.ShapeDtypeStruct(lbl, np.float32, sharding=sh),
        }
        steps = (p_train.lower(state, sds).compile(),
                 p_eval.lower(state, sds).compile())
        from jax._src import distributed as _dist
        _dist.global_state.client.wait_at_barrier(
            "rcvpose_steps_compiled", 600_000)
    ckpt = Checkpointer(log_dir + "/ckpts")
    trainer = train.Trainer(
        cfg=cfg, state=state, mesh=mesh,
        # two-arg factory: mid-epoch resume skips at the INDEX level (the
        # skipped prefix is never read or transformed, loader.batches)
        train_batches=lambda epoch, start_batch=0: train_loader.batches(
            epoch, start_batch),
        val_batches=lambda: iter(val_loader),
        checkpointer=ckpt, writer=writer,
        steps_per_epoch=steps_per_epoch, steps=steps)
    if cfg.resume_train:
        # the reference resumes from model_best (train.py:46); the restored
        # iteration drives fit()'s epoch placement + in-epoch fast-forward
        state, epoch, iteration, best = ckpt.restore(state, best=True)
        trainer.state, trainer.iteration, trainer.best_val = \
            state, iteration, best
    max_epochs = int(math.ceil(cfg.max_iterations / steps_per_epoch))
    trainer.fit(max_epochs)
    return trainer


def run_test(cfg):
    from rcvpose_tpu import eval as eval_mod

    maybe_init_distributed(cfg)
    classes = ([c.strip() for c in cfg.eval_classes.split(",") if c.strip()]
               or None)
    if cfg.dataset == "ycb":
        ycb_ids = None
        if classes:
            name_to_id = {v: k for k, v in eval_mod.YCB_CLASS_NAMES.items()}
            ycb_ids = [name_to_id[c] for c in classes]
        return eval_mod.estimate_6d_pose_ycb(cfg, class_ids=ycb_ids)
    if cfg.test_occ or cfg.dataset == "lmo":
        return eval_mod.estimate_6d_pose_lmo(cfg, class_names=classes)
    return eval_mod.estimate_6d_pose_lm(cfg, class_names=classes)


def run_gen_labels(cfg):
    """Offline GT radial-map generation (reference 3DRadius_* scripts)."""
    import os

    from rcvpose_tpu.data import genlabels

    if cfg.dataset == "lm":
        # accept either the LINEMOD dir itself or its parent (the test
        # mode's --root_dataset convention), so one flag works for both
        root = cfg.root_dataset
        sub = os.path.join(root, "LINEMOD")
        if os.path.isdir(sub):
            root = sub
        if cfg.fake_depth:
            # one FakeDepth/ dir per class (the reference loops keypoints
            # into it, each overwriting the last — run one keypoint)
            genlabels.generate_lm(root, cfg.class_name,
                                  kpt_indices=[cfg.kpt_num],
                                  fake_depth=True)
        else:
            genlabels.generate_lm(root, cfg.class_name)
    else:
        from rcvpose_tpu.eval import YCB_CLASS_NAMES
        class_id = {v: k for k, v in YCB_CLASS_NAMES.items()}[cfg.class_name]
        genlabels.generate_ycb(cfg.root_dataset, cfg.class_name, class_id)


def run_export_torch(cfg):
    """Export an orbax checkpoint as a reference-format .pth.tar.

    ``--model_dir`` points at a Checkpointer directory (the ``ckpts/`` under
    a train run's log dir); prefers ``model_best`` over ``ckpt``, mirroring
    the reference's eval-from-best convention (train.py:46). The reverse of
    the torch import path: reference code can ``torch.load`` the result and
    ``load_state_dict(strict=False)`` it onto DenseFCNResNet152."""
    import os

    import jax

    from rcvpose_tpu import train
    from rcvpose_tpu.checkpoint import Checkpointer, export_torch_checkpoint

    state = train.create_state(cfg, jax.random.PRNGKey(0),
                               sample_shape=(1, 64, 64, 3))
    ckpt = Checkpointer(cfg.model_dir)
    best = os.path.isdir(os.path.join(cfg.model_dir, "model_best"))
    state, epoch, iteration, _ = ckpt.restore(state, best=best)
    out = cfg.export_path or os.path.join(cfg.model_dir, "exported.pth.tar")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    export_torch_checkpoint(variables, out, epoch=epoch, iteration=iteration)
    print(f"exported {'model_best' if best else 'ckpt'} -> {out}")
    return out


def main(argv=None):
    cfg = config_from_args(argv)
    if cfg.compile_cache_dir:
        from rcvpose_tpu import utils

        utils.enable_compile_cache(cfg.compile_cache_dir)
    if cfg.profile_dir and cfg.mode in ("train", "test"):
        from rcvpose_tpu import profiling

        with profiling.trace(cfg.profile_dir):
            return main_dispatch(cfg)
    return main_dispatch(cfg)


def main_dispatch(cfg):
    if cfg.mode == "train":
        run_train(cfg)
    elif cfg.mode == "test":
        results = run_test(cfg)
        # the reference only *prints* its final ADD(s) lines
        # (AccumulatorSpace.py:735-740); also persist them machine-readably.
        # Multi-host: every process holds the identical reduced results
        # (eval._finalize_class_results); only process 0 writes the file.
        import json
        import os

        import jax

        if jax.process_index() == 0:
            os.makedirs(cfg.out_dir, exist_ok=True)
            path = os.path.join(cfg.out_dir, "eval_results.json")
            with open(path, "w") as f:
                json.dump(results, f, indent=2, default=float)
            print(f"eval results written to {path}")
    elif cfg.mode == "gen-labels":
        run_gen_labels(cfg)
    elif cfg.mode == "export-torch":
        run_export_torch(cfg)
    elif cfg.mode == "serve":
        from rcvpose_tpu import serve as serve_mod

        serve_mod.run_serve(cfg)
    elif cfg.mode == "check-data":
        from rcvpose_tpu import checkdata

        findings = checkdata.run_check(cfg)
        if any(f.level == "ERROR" for f in findings):
            raise SystemExit(1)
    else:
        import os
        import runpy

        # CWD-independent: bench.py sits next to the package directory
        bench = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench.py")
        runpy.run_path(bench, run_name="__main__")


if __name__ == "__main__":
    main()
