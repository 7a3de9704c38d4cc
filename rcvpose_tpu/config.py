"""Single typed configuration for the whole framework.

Replaces the reference's split-brain setup — argparse flags in ``main.py``
(with string-typed ``--batch_size``/``--kpt_num`` and always-true bool flags,
main.py:35-55), a *second* divergent parser in ``AccumulatorSpace.py:1202-1227``
(whose ``--using_ckpts`` flag main.py lacks but Trainer.Test needs), and a
hardcoded hyperparameter dict (utils.py:16-27) — with one dataclass and one
CLI (see ``rcvpose_tpu.cli``).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional


@dataclasses.dataclass
class Config:
    # --- task ---
    mode: str = "train"               # train | test | gen-labels |
    #   benchmark | export-torch | serve | check-data
    dataset: str = "lm"               # lm | lmo | ycb
    root_dataset: str = "./datasets/LINEMOD"
    class_name: str = "ape"
    kpt_num: int = 1                  # keypoint index into Outside9.npy
    # --- training (reference utils.py:16-27, train.py:184-186) ---
    optim: str = "adam"               # adam | sgd
    initial_lr: float = 1e-4
    momentum: float = 0.9             # sgd momentum (train.py:43)
    batch_size: int = 4
    max_iterations: int = 700_000
    lr_decay_epochs: int = 70         # lr /= 10 every N epochs
    lr_decay_factor: float = 0.1
    resume_train: bool = False
    val_interval_epochs: int = 1      # validate (and checkpoint) every N
    #   epochs; 1 = the reference's behavior (train.py:183). The final
    #   epoch always validates so a run never ends without a checkpoint.
    log_interval: int = 10            # fetch + TB-log train metrics every
    #   N steps (a fetch is a host sync that serializes against the
    #   device; the NaN guard samples at this cadence — at most N-1 steps
    #   late, never past the epoch). 1 = the reference's per-step behavior.
    accum_steps: int = 1              # gradient accumulation: each train
    #   step scans accum_steps microbatches of batch_size/accum_steps
    #   images, averages their grads, applies ONE optimizer update.
    #   Emulates a larger global batch without its activation footprint —
    #   e.g. --batch_size 16 --accum_steps 2 sidesteps the batch-10..12
    #   XLA memory-space-assignment cliff (PERF.md "Batch-size curve")
    #   at microbatch-8's measured-best throughput. batch_size must be
    #   divisible by accum_steps. Semantics note: the masked radial-loss
    #   normalizer (reference train.py:69) counts GT-nonzero pixels per
    #   MICRObatch when accum_steps > 1 (grads are the equal-weight mean
    #   over microbatches), and BN stats update once per microbatch.
    # --- model ---
    model: str = "dense"              # dense | res
    model_blocks: str = ""            # "" = ResNet-152 (3,8,36,3); e.g.
    #   "1,1,1,1" for a shallow variant (ablations / smoke tests)
    model_width: float = 1.0          # channel multiplier; power-of-two
    #   fractions >= 1/8 scale the bottleneck expansion exactly
    kpt_heads: int = 1                # 1 = reference 3-net mode; 3 = one
    #   shared net with 2*K output channels (sem+radial per keypoint) —
    #   a TPU-first extension: one forward serves all keypoints (~3x less
    #   net compute per frame than the reference's per-keypoint networks)
    compute_dtype: str = "bfloat16"   # bfloat16 | float32
    remat: bool = False               # checkpoint encoder blocks in the
    #   backward (jax.checkpoint): lifts the max training batch per chip
    #   at a measured recompute cost (PERF.md)
    fast_head: bool = False           # conv7/conv8 at H/2 + upsampled thin
    #   output (TPU-first extension; same param tree, not the reference
    #   forward — accuracy/perf characterization in PERF.md)
    image_height: int = 480
    image_width: int = 640
    # --- serving daemon (--mode serve) ---
    serve_host: str = "127.0.0.1"
    serve_port: int = 5555
    serve_classes: str = ""           # comma list: extra classes to build +
    #   compile BEFORE the socket opens (cold-class warmup; lazily-loaded
    #   classes otherwise pay their build on first request, off the
    #   execution locks)
    serve_devices: int = 0            # pre-build the default class's
    #   per-chip replicas on the first N local devices at startup (0 =
    #   lazy: the server still grows onto every chip in the background
    #   under concurrent load). Requests round-robin across free chips.
    # --- accumulator ---
    vote_grid_l: int = 192
    vote_mode: str = "hier"           # hier | exact | surface
    max_points: int = 8192            # padded point-cloud size for voting
    vote_topk: Optional[int] = None   # hier refine windows (None = 32).
    #   Default topk=32 with win=8 gives 0.83 agreement with exact mode on
    #   occluded multi-blob scenes at the old topk=4/win=16 cost; clean
    #   single-object scenes are 1.0 at every setting (PERF.md sweep).
    vote_cpt_stride: Optional[int] = None  # hier coarse-stage point
    #   subsample (None = 4); measured insensitive from 1 to 8
    vote_win: Optional[int] = None    # hier refine window side (None = 8);
    #   topk=16/stride=8/win=8 is the measured speed-lean point (-13% vote
    #   time at 0.75 occluded agreement)
    retry_grid_l: int = 256           # grid side for the host-side
    #   overflow retry (a frame whose dynamic extent overflows the
    #   class-sized cube re-runs once at this size; a frame that STILL
    #   overflows is surfaced as overflow_after_retry in eval results)
    # --- serving point-packing window (infer.PoseEstimator) ---
    pack_win_h: int = 0               # 0 = derive from class geometry:
    pack_win_w: int = 0               #   CAD bounding-sphere diameter
    #   projected at pack_z_min_mm (infer.suggest_pack_window); explicit
    #   values override (pixels, clamped to the frame)
    pack_z_min_mm: float = 600.0      # nearest expected object depth for
    #   the derived window (LINEMOD objects sit at 0.6-1.1 m)
    # --- eval ---
    using_ckpts: bool = True          # net inference vs precomputed radial maps
    eval_classes: str = ""            # comma list; "" = all dataset classes
    sem_threshold: float = 0.8        # lm (AccumulatorSpace.py:603); lmo uses 0.5
    icp_iters: int = 30
    ycb_icp_converged: bool = True    # YCB eval: run ICP to convergence
    #   (the reference's YCB criteria — max_iteration=2e6 with relative
    #   fitness/RMSE tolerances 1e-6, AccumulatorSpace.py:1165-1169 —
    #   where LM/LMO cap at 30). False = fixed icp_iters like LM/LMO.
    ycb_icp_max_iters: int = 10_000   # cap on the converged YCB ICP loop
    #   (the reference's 2e6 only means "never stop on iterations";
    #   measured convergence is <40 iterations — PARITY.md)
    icp_rel_tol: float = 1e-6         # Open3D-style convergence tolerance
    #   (absolute per-iteration delta of fitness AND inlier RMSE)
    eval_data_parallel: Optional[bool] = None  # --mode test: shard frames
    #   over the device mesh (net -> vote -> Horn -> ICP -> ADD per frame,
    #   whole program on device). None = auto (on when >1 device); False
    #   forces the sequential per-frame loop. Multi-process (--distributed):
    #   frames shard across processes with process-local IO, each process
    #   runs its shard on its LOCAL device mesh, and per-class metrics
    #   reduce host-side — every process returns the global numbers
    demo_mode: bool = False
    demo_scene_ply: bool = False      # demo mode also dumps each frame's
    #   colored scene cloud as <frame>_scene.ply (the reference's unused
    #   rgbd_to_color_point_cloud, AccumulatorSpace.py:87-98, made useful:
    #   eval failures become inspectable in any point-cloud viewer)
    test_occ: bool = False
    fake_depth: bool = False          # gen-labels: write meter-valued
    #   FakeDepth/ maps (reference depthGeneration, 3DRadius_lm.py:14)
    # --- export ---
    export_path: str = ""             # export-torch output .pth.tar ("" =
    #   <model_dir>/exported.pth.tar)
    # --- infra ---
    compile_cache_dir: str = ""       # persistent XLA compilation cache
    #   ("" = off). Full-size program compiles are minutes on TPU; with the
    #   cache every later process (serving restarts, cold-class builds,
    #   resumed training) loads them from disk in seconds. Shared safely
    #   across concurrent processes; keyed by backend + program, so one dir
    #   serves CPU tests and TPU runs alike (utils.enable_compile_cache)
    distributed: bool = False         # multi-host: jax.distributed.initialize
    out_dir: str = "logs"
    model_dir: str = "ckpts"
    seed: int = 0
    profile_dir: str = ""             # capture a jax.profiler trace of the
    #   train/test run into this dir ("" = off); view in TensorBoard or
    #   parse with scripts/prof_train_trace.py::report
    num_prefetch: int = 2             # host->device prefetch depth
    mesh_data_axis: Optional[int] = None  # None = all local devices

    def log_dir(self):
        return os.path.join(self.out_dir, self.dataset,
                            f"{self.class_name}Kp{self.kpt_num}")

    def dump(self, path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2, sort_keys=True)

    @classmethod
    def load(cls, path):
        with open(path) as f:
            return cls(**json.load(f))
