"""Two-process multi-host ``--mode test`` equality smoke.

Single-machine stand-in for evaluating on a multi-host TPU pod: two OS
processes, each a JAX "host" with 2 virtual CPU devices, coordinated
through ``jax.distributed.initialize``. Each process sweeps a DISJOINT
shard of every class's frames (``eval._proc_shard``, frame IO process-
local), runs its shard through the data-parallel eval program on its own
LOCAL device mesh, and the per-class metrics reduce host-side
(``eval._finalize_class_results`` / the YCB score gather). The parent
asserts the combined LINEMOD per-class ADD and the YCB AUC equal a
single-process run on the same fixture trees — the VERDICT r3 item 1
done-criterion. (The reference eval loop being scaled:
/root/reference/AccumulatorSpace.py:553-740; the reference itself has no
distributed evaluation at all.)

Usage: ``python scripts/multihost_eval_smoke.py``          (parent)
       ``... worker <pid> <nprocs> <port> <lm> <ycb>``     (internal)
       ``... baseline <lm> <ycb>``                         (internal)
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROCS = 2
DEV_PER_PROC = 2
LM_FRAMES = 5   # odd across 2 processes: shards of 3 and 2 + DP padding
YCB_FRAMES = 3


def _jax_cpu(n_devices):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from rcvpose_tpu.utils import setup_script_cache
    setup_script_cache(cpu=True, repo_root=REPO)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return jax


def _run_evals(lm_tree, ycb_tree):
    from rcvpose_tpu import eval as eval_mod
    from rcvpose_tpu.config import Config
    from tests.test_eval_lmo_ycb_format import (ExactMapsFromDisk,
                                                YCB_FIXTURE_CLASS)

    quiet = lambda *_: None  # noqa: E731
    cfg_lm = Config(root_dataset=lm_tree, using_ckpts=False,
                    compute_dtype="float32", vote_grid_l=96,
                    max_points=2048, vote_mode="hier", icp_iters=10)
    lm = eval_mod.estimate_6d_pose_lm(cfg_lm, class_names=["ape"],
                                      progress=quiet)["ape"]
    cfg_ycb = Config(root_dataset=ycb_tree, using_ckpts=True, dataset="ycb",
                     compute_dtype="float32", vote_grid_l=96,
                     max_points=2048, vote_mode="hier", icp_iters=10)
    ycb = eval_mod.estimate_6d_pose_ycb(
        cfg_ycb, class_ids=[YCB_FIXTURE_CLASS[0]], progress=quiet,
        map_source_factory=ExactMapsFromDisk)["all"]
    return {
        "lm_add_bf": lm["add_before_icp"], "lm_add_af": lm["add_after_icp"],
        "lm_frames": lm["frames"],
        "ycb_auc_bf": ycb["adds_auc_before_icp"],
        "ycb_auc_af": ycb["adds_auc_after_icp"],
        "ycb_add_bf": ycb["add_before_icp"],
        "ycb_add_af": ycb["add_after_icp"],
        "ycb_frames": ycb["frames"],
    }


def worker(pid, nprocs, port, lm_tree, ycb_tree):
    jax = _jax_cpu(DEV_PER_PROC)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs
    assert jax.local_device_count() == DEV_PER_PROC

    import numpy as np

    from rcvpose_tpu import parallel

    # establish the cross-process (Gloo) context NOW, while the processes
    # are milliseconds apart — the first per-class reduction otherwise
    # races its fixed ~30 s init deadline against compile skew (the same
    # warm-collectives discipline cli.run_train uses)
    parallel.host_allgather(np.zeros((1,), np.float32))

    res = _run_evals(lm_tree, ycb_tree)
    assert res.get("lm_frames") == LM_FRAMES, res     # reduced, not local
    assert res.get("ycb_frames") == YCB_FRAMES, res
    print(f"MULTIHOST_EVAL pid={pid} {json.dumps(res, sort_keys=True)}",
          flush=True)
    jax.distributed.shutdown()


def baseline(lm_tree, ycb_tree):
    _jax_cpu(4)  # a third device count: equality must not depend on it
    res = _run_evals(lm_tree, ycb_tree)
    print(f"BASELINE_EVAL {json.dumps(res, sort_keys=True)}", flush=True)


def _attempt(lm_tree, ycb_tree):
    import socket

    with socket.socket() as s:  # free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker",
             str(pid), str(N_PROCS), str(port), lm_tree, ycb_tree],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(N_PROCS)]
    outs = [p.communicate(timeout=1500)[0] for p in procs]
    results = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(out)
            return None, f"worker {pid} failed rc={p.returncode}"
        line = next(ln for ln in out.splitlines() if "MULTIHOST_EVAL" in ln)
        results.append(json.loads(line.split(" ", 2)[2]))
    return results, None


def main():
    import pathlib
    import tempfile

    _jax_cpu(1)  # fixture rendering uses jax; keep it off the TPU tunnel

    import numpy as np

    from tests.test_eval_lm_format import make_lm_eval_tree
    from tests.test_eval_lmo_ycb_format import make_ycb_eval_tree

    with tempfile.TemporaryDirectory() as tmp:
        lm_tree = make_lm_eval_tree(pathlib.Path(tmp) / "lm",
                                    np.random.default_rng(0),
                                    n_frames=LM_FRAMES)
        ycb_dir = os.path.join(tmp, "ycb")
        os.makedirs(ycb_dir)
        make_ycb_eval_tree(ycb_dir, np.random.default_rng(1),
                           n_frames=YCB_FRAMES)

        # single-process reference run, in its own process for a clean
        # device count
        base = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "baseline",
             lm_tree, ycb_dir],
            capture_output=True, text=True, timeout=1500)
        if base.returncode != 0:
            raise SystemExit(base.stdout + base.stderr)
        line = next(ln for ln in base.stdout.splitlines()
                    if "BASELINE_EVAL" in ln)
        expect = json.loads(line.split(" ", 1)[1])

        err = None
        for attempt in range(3):  # gloo init deadline vs cold-compile skew
            results, err = _attempt(lm_tree, ycb_dir)
            if results is not None:
                break
            print(f"attempt {attempt + 1} failed ({err}); retrying with a "
                  "warm compile cache")
        if results is None:
            raise SystemExit(err)

    assert results[0] == results[1], (
        f"hosts disagree on the reduced results:\n{results[0]}\n"
        f"{results[1]}")
    assert results[0] == expect, (
        f"2-process combined results != single-process run:\n"
        f"got    {results[0]}\nexpect {expect}")
    print(f"multihost_eval_smoke: {N_PROCS} processes x {DEV_PER_PROC} "
          f"devices, LM ADD {expect['lm_add_bf']:.4f}/"
          f"{expect['lm_add_af']:.4f} over {expect['lm_frames']} frames and "
          f"YCB AUC {expect['ycb_auc_bf']:.4f}/{expect['ycb_auc_af']:.4f} "
          f"over {expect['ycb_frames']} frames identical to the "
          f"single-process run on every host")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
               sys.argv[5], sys.argv[6])
    elif len(sys.argv) > 1 and sys.argv[1] == "baseline":
        baseline(sys.argv[2], sys.argv[3])
    else:
        main()
