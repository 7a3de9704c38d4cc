"""Real 2-process multi-host --mode test equality
(see scripts/multihost_eval_smoke.py).

Subprocess-based on purpose: jax.distributed needs one runtime per process,
which cannot be set up inside the already-initialized test process. The
smoke asserts the combined per-class LINEMOD ADD and the YCB AUC from two
processes sweeping disjoint frame shards equal a single-process run on the
same fixture trees (VERDICT r3 item 1 done-criterion).
"""

import os
import subprocess
import sys

SCRIPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "scripts", "multihost_eval_smoke.py")


def test_two_process_distributed_eval_matches_single_process():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    out = subprocess.run([sys.executable, SCRIPT], capture_output=True,
                         text=True, timeout=3000, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "identical to the single-process run" in out.stdout


def test_heterogeneous_path_reduction_uses_fixed_keys(monkeypatch):
    """A pod can mix eval paths: one process with >=2 chips reports the DP
    raw keys (frame_total_ms, overflow_frames, ...), a 1-chip process the
    sequential ones (net_total_ms, acc_total_ms, ...) — both subsets have
    the same length, so a locally-computed key list would sum positionally
    mismatched counters without any shape error (code-review r4).
    _finalize_class_results must reduce over a FIXED key layout with a
    presence mask."""
    import jax
    import numpy as np

    from rcvpose_tpu import eval as eval_mod
    from rcvpose_tpu import parallel

    # the round-5 fixed layout: + overflow_after_retry (post-retry
    # overflow surfacing) and data_parallel (pod-total device count,
    # reduced for LM/LMO exactly like YCB — advisor r4)
    raw = ["bf_count", "af_count", "frames", "overflow_frames",
           "overflow_after_retry", "frame_total_ms", "net_total_ms",
           "acc_total_ms", "decode_total_ms", "data_parallel"]
    # local process: sequential path (no frame_total_ms/overflow_frames)
    res_local = {"bf_count": 3, "af_count": 4, "frames": 5,
                 "net_total_ms": 50.0, "acc_total_ms": 25.0,
                 "decode_total_ms": 10.0, "add_before_icp": 0.6,
                 "add_after_icp": 0.8, "vote_topk": 64}
    # remote process: DP path (no net/acc totals)
    res_remote = {"bf_count": 2, "af_count": 3, "frames": 3,
                  "overflow_frames": 1, "overflow_after_retry": 1,
                  "frame_total_ms": 90.0, "decode_total_ms": 6.0,
                  "data_parallel": 8}

    def fake_allgather(vec):
        remote = np.array(
            [float(res_remote.get(k, 0.0)) for k in raw]
            + [1.0 if k in res_remote else 0.0 for k in raw], np.float32)
        assert vec.shape == remote.shape, "reduction layout must be fixed"
        return np.stack([np.asarray(vec), remote])

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(parallel, "host_allgather", fake_allgather)

    out = eval_mod._finalize_class_results(res_local)
    assert out["frames"] == 8
    assert out["add_before_icp"] == (3 + 2) / 8
    assert out["add_after_icp"] == (4 + 3) / 8
    assert out["overflow_frames"] == 1          # remote-only key survives
    assert out["overflow_after_retry"] == 1
    assert out["data_parallel"] == 8            # pod total (remote's mesh)
    # stage totals never cross-contaminate across mismatched paths
    assert out["net_ms_per_frame"] == 50.0 / 8
    assert out["acc_ms_per_frame"] == 25.0 / 8
    assert out["frame_ms_per_frame"] == 90.0 / 8
    assert out["decode_ms_per_frame_overlapped"] == 16.0 / 8
    assert out["eval_processes"] == 2


def test_ycb_heterogeneous_path_reduction(tmp_path, rng, monkeypatch):
    """The YCB tail reduces path PRESENCE, not just counters: on a mixed
    pod (this process sequential, a remote one DP) every process must
    report the union key set — frame_ms_per_frame/data_parallel from the
    DP shard AND net/acc from the sequential shard — over GLOBAL frame
    counts, instead of keying the report on its local dp_mesh
    (code-review r4). Runs the real evaluator single-process-sequential
    and injects a fake DP remote via the host collectives."""
    import jax
    import numpy as np

    from rcvpose_tpu import eval as eval_mod
    from rcvpose_tpu import metrics, parallel
    from rcvpose_tpu.config import Config
    from tests.test_eval_lmo_ycb_format import (ExactMapsFromDisk,
                                                make_ycb_eval_tree)

    root = tmp_path
    class_id, _ = make_ycb_eval_tree(root, rng, n_frames=1)
    cfg = Config(root_dataset=str(root), using_ckpts=True, dataset="ycb",
                 compute_dtype="float32", vote_grid_l=96, max_points=2048,
                 vote_mode="hier", icp_iters=10, out_dir=str(root / "out"),
                 eval_data_parallel=False)

    # fake remote: one DP-swept frame on an 8-chip process
    remote_scores = [np.array([5.0], np.float32),   # bf (mm)
                     np.array([4.0], np.float32)]   # af
    remote_vec = np.array([1, 1, 1, 120.0, 0.0, 0.0, 4.0, 1.0, 8.0, 0.0],
                          np.float32)
    seen = {"vecs": [], "scores": []}

    def fake_allgather(vec):
        vec = np.asarray(vec, np.float32)
        assert vec.shape == remote_vec.shape, "reduction layout must be fixed"
        seen["vecs"].append(vec.copy())
        return np.stack([vec, remote_vec])

    def fake_concat(lst):
        arr = np.asarray(lst, np.float32)
        seen["scores"].append(arr.copy())
        return np.concatenate([arr, remote_scores[len(seen["scores"]) - 1]])

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(parallel, "host_allgather", fake_allgather)
    monkeypatch.setattr(parallel, "host_allgather_concat", fake_concat)

    lines = []
    res = eval_mod.estimate_6d_pose_ycb(
        cfg, class_ids=[class_id], progress=lines.append,
        map_source_factory=ExactMapsFromDisk)["all"]

    local = seen["vecs"][0]
    assert local[7] == 0 and local[9] == 1      # local path: sequential
    tot = local + remote_vec
    assert res["frames"] == 2
    assert res["eval_processes"] == 2
    # union key set, global numbers — identical on every process
    assert res["data_parallel"] == 8
    assert res["frame_ms_per_frame"] == tot[3] / 2
    assert res["net_ms_per_frame"] == tot[4] / 2
    assert res["acc_ms_per_frame"] == tot[5] / 2
    assert res["add_before_icp"] == tot[0] / 2
    assert res["add_after_icp"] == tot[1] / 2
    # AUC over the gathered (local + remote) per-frame scores
    for key, gathered in (("adds_auc_before_icp", 0),
                          ("adds_auc_after_icp", 1)):
        merged = np.concatenate([seen["scores"][gathered],
                                 remote_scores[gathered]])
        # .tolist() mirrors the evaluator's own f32 -> f64 round-trip
        assert res[key] == metrics.auc_add(
            np.asarray(merged.tolist()) / 1000.0,
            thresholds=eval_mod.YCB_AUC_THRESHOLDS)
    assert any("fused DP program" in ln for ln in lines)
    assert any("per-frame time: net" in ln for ln in lines)
