"""Drive estimate_6d_pose_lm over a real-format synthetic LINEMOD tree.

Exercises the evaluator's actual dataset-layout IO (eval.py: Split/val.txt,
<class>.ply, Outside9.npy, pose/pose<N>.npy, LINEMOD_ORIG data/depth<N>.dpt,
estRadialMap/.../Out_pt<k>_dm/<id>.npy) and the per-frame loop end to end
with using_ckpts=False — the path the reference runs via
AccumulatorSpace.py:553-740 — plus the demo_mode overlay output.
"""

import os

import numpy as np
import pytest
from PIL import Image

from rcvpose_tpu import geometry
from rcvpose_tpu.config import Config
from tests.test_data import write_ascii_ply, write_dpt


def make_lm_eval_tree(tmp_path, rng, h=120, w=160, n_frames=2):
    """Two synthetic 'ape' frames in the exact on-disk layout eval.py reads.

    Rendered with the real LINEMOD intrinsics (the evaluator hardcodes them,
    like the reference) into a small frame (default 120x160; pass /32-divisible
    dims when the network itself must run); the object is placed so it
    projects into that window.
    """
    k = np.asarray(geometry.LINEMOD_K)
    root = tmp_path
    pv = root / "LINEMOD" / "ape"
    orig = root / "LINEMOD_ORIG" / "ape"
    for d in ["JPEGImages", "pose", "Split"]:
        os.makedirs(pv / d)
    os.makedirs(orig / "data")
    for kp in range(1, 4):
        os.makedirs(root / "LINEMOD_ORIG" / "estRadialMap" / "ape"
                    / f"Out_pt{kp}_dm")

    # object: spherical blob (radius ~3 cm), keypoints like dispersed OBB
    n_model = 3000
    dirs = rng.normal(size=(n_model, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    model_m = dirs * rng.uniform(0.02, 0.03, size=(n_model, 1))
    kpts9 = np.zeros((9, 3))
    kpts9[1] = [0.06, 0.06, 0.06]
    kpts9[2] = [-0.06, 0.06, -0.06]
    kpts9[3] = [0.06, -0.06, -0.06]
    # CAD in METERS: the eval-path <class>.ply is meter-valued in the real
    # dataset (reference AccumulatorSpace.py:544-549 computes max radii from
    # raw values; :663-667 scales *1000 for mm-ADD)
    write_ascii_ply(str(pv / "ape.ply"), model_m)
    np.save(pv / "Outside9.npy", kpts9)

    ids = []
    for i in range(n_frames):
        # pose: small rotation; translation aims the object at pixel ~(80,60)
        angle = rng.uniform(-0.3, 0.3)
        c, s = np.cos(angle), np.sin(angle)
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        z = 0.75 + 0.05 * i
        t = np.array([(80 - k[0, 2]) / k[0, 0] * z,
                      (60 - k[1, 2]) / k[1, 1] * z, z])
        pose = np.concatenate([rot, t[:, None]], axis=1)  # (3, 4), t in m
        np.save(pv / "pose" / f"pose{i}.npy", pose)

        cam = model_m @ rot.T + t
        uv = cam @ k.T
        uv = uv[:, :2] / uv[:, 2:]
        us = np.round(uv[:, 0]).astype(int)
        vs = np.round(uv[:, 1]).astype(int)
        ok = (us >= 0) & (us < w) & (vs >= 0) & (vs < h)
        depth_mm = np.zeros((h, w), np.float32)
        depth_mm[vs[ok], us[ok]] = cam[ok, 2] * 1000.0
        depth_u16 = np.round(depth_mm).astype(np.uint16)  # .dpt is uint16
        write_dpt(str(orig / "data" / f"depth{i}.dpt"), depth_u16)

        img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        frame_id = f"{i:06d}"
        Image.fromarray(img).save(pv / "JPEGImages" / f"{frame_id}.jpg")

        # perfect radial maps (dm) from the QUANTIZED depth, per keypoint
        xyz_map, valid = geometry.backproject_dense(
            depth_u16.astype(np.float32), k)
        xyz_m = np.asarray(xyz_map) / 1000.0
        valid = np.asarray(valid)
        kpts_cam = kpts9[1:4] @ rot.T + t
        for kp in range(1, 4):
            r = np.linalg.norm(xyz_m - kpts_cam[kp - 1], axis=-1) * 10.0
            radial = np.where(valid, r, 0.0).astype(np.float32)
            np.save(root / "LINEMOD_ORIG" / "estRadialMap" / "ape"
                    / f"Out_pt{kp}_dm" / f"{frame_id}.npy", radial)
        ids.append(frame_id)

    with open(pv / "Split" / "val.txt", "w") as f:
        f.write("\n".join(ids) + "\n")
    return str(root)


@pytest.fixture
def lm_eval_tree(tmp_path, rng):
    return make_lm_eval_tree(tmp_path, rng)


def test_estimate_6d_pose_lm_real_format(lm_eval_tree, tmp_path):
    from rcvpose_tpu import eval as eval_mod

    cfg = Config(root_dataset=lm_eval_tree, using_ckpts=False,
                 compute_dtype="float32", vote_grid_l=96, max_points=2048,
                 vote_mode="hier", icp_iters=10, demo_mode=True,
                 out_dir=str(tmp_path / "logs"), eval_data_parallel=False)
    lines = []
    results = eval_mod.estimate_6d_pose_lm(
        cfg, class_names=["ape"], progress=lines.append)

    res = results["ape"]
    assert res["frames"] == 2
    assert np.isfinite(res["add_before_icp"])
    assert np.isfinite(res["add_after_icp"])
    # perfect radial maps on a clean render must land within the ape ADD
    # threshold (14.2 mm vs ~60 mm object)
    assert res["add_before_icp"] == 1.0, res
    assert res["add_after_icp"] == 1.0, res
    assert res["net_ms_per_frame"] >= 0
    assert res["acc_ms_per_frame"] > 0
    # offline dataset eval defaults to the saturated vote knob (PERF.md)
    assert res["vote_topk"] == 64
    # printed running + final summaries (reference :730-740)
    assert any("ADD(s) of ape" in ln for ln in lines)

    # demo_mode wrote one overlay per frame
    demo_dir = os.path.join(cfg.out_dir, "demo", "ape")
    files = sorted(os.listdir(demo_dir))
    assert files == ["000000_overlay.png", "000001_overlay.png"]
    overlay = np.asarray(Image.open(os.path.join(demo_dir, files[0])))
    assert (overlay == [255, 0, 0]).all(axis=-1).any()  # estimate painted
    assert (overlay == [0, 0, 255]).all(axis=-1).any()  # GT painted


def test_eval_ply_unit_guard(lm_eval_tree, rng):
    """A millimeter-valued eval ply (the wrong convention — that is the
    train-path mesh.ply unit) must fail loudly, not silently collapse the
    max-radius clip and shrink ADD 1000x."""
    from rcvpose_tpu import eval as eval_mod

    ply = os.path.join(lm_eval_tree, "LINEMOD", "ape", "ape.ply")
    pts_m = eval_mod._read_eval_cad_m(ply)  # meter-valued fixture passes
    assert 0.03 <= float(np.ptp(pts_m, axis=0).max()) <= 0.6

    write_ascii_ply(ply, pts_m * 1000.0)  # rewrite in mm
    with pytest.raises(ValueError, match="millimeter"):
        eval_mod._read_eval_cad_m(ply)
    with pytest.raises(ValueError, match="millimeter"):
        eval_mod.estimate_6d_pose_lm(
            Config(root_dataset=lm_eval_tree, using_ckpts=False),
            class_names=["ape"], progress=lambda *_: None)


def test_lm_eval_data_parallel_matches_sequential(lm_eval_tree, tmp_path):
    """--mode test sharded over the 8-virtual-device mesh (frames data-
    parallel, the whole per-frame program on device) must reproduce the
    sequential loop's per-class ADD exactly (VERDICT r2 item 2; reference
    behavior being scaled: the eval loop AccumulatorSpace.py:553-740)."""
    import dataclasses

    import jax

    from rcvpose_tpu import eval as eval_mod

    assert jax.device_count() >= 2  # conftest forces the 8-device CPU mesh

    cfg = Config(root_dataset=lm_eval_tree, using_ckpts=False,
                 compute_dtype="float32", vote_grid_l=96, max_points=2048,
                 vote_mode="hier", icp_iters=10,
                 eval_data_parallel=False, demo_mode=True,
                 out_dir=str(tmp_path / "seq"))
    seq = eval_mod.estimate_6d_pose_lm(cfg, class_names=["ape"],
                                       progress=lambda *_: None)["ape"]

    cfg_dp = dataclasses.replace(cfg, eval_data_parallel=True,
                                 out_dir=str(tmp_path / "dp"))
    lines = []
    dp = eval_mod.estimate_6d_pose_lm(cfg_dp, class_names=["ape"],
                                      progress=lines.append)["ape"]

    assert dp["frames"] == seq["frames"] == 2
    assert dp["add_before_icp"] == seq["add_before_icp"]
    assert dp["add_after_icp"] == seq["add_after_icp"]
    assert dp["data_parallel"] == jax.device_count()
    assert dp["frame_ms_per_frame"] > 0
    assert dp["overflow_frames"] == 0
    assert any("fused DP program" in ln for ln in lines)
    # the jitted DP program is built once and REUSED across chunks/calls —
    # a fresh jit per chunk would re-trace the whole net->vote->ICP
    # program every mesh-sized group of frames
    from rcvpose_tpu.parallel import mesh as mesh_mod
    n_programs = len(mesh_mod._FRAME_SCORES_PROGRAMS)
    dp2 = eval_mod.estimate_6d_pose_lm(cfg_dp, class_names=["ape"],
                                       progress=lambda *_: None)["ape"]
    assert dp2["add_after_icp"] == dp["add_after_icp"]
    assert len(mesh_mod._FRAME_SCORES_PROGRAMS) == n_programs
    # demo overlays written from the DP path too
    assert sorted(os.listdir(os.path.join(str(tmp_path / "dp"), "demo",
                                          "ape"))) == [
        "000000_overlay.png", "000001_overlay.png"]


def test_forced_eval_data_parallel_raises_when_unhonorable(monkeypatch):
    """An EXPLICIT --eval_data_parallel that cannot run at all (single
    process, one device) raises instead of silently falling back to the
    sequential loop whose results lack the DP-only keys; a multi-process
    run is honored with a LOCAL mesh (frames shard across processes)."""
    import pytest

    from rcvpose_tpu import eval as eval_mod

    cfg = Config(eval_data_parallel=True)
    monkeypatch.setattr(eval_mod.jax, "device_count", lambda: 1)
    with pytest.raises(ValueError, match="only 1 device"):
        eval_mod._dp_mesh_or_none(cfg)
    # multi-process: the DP program runs on this process's LOCAL devices
    # (frames are process-sharded); no raise
    monkeypatch.setattr(eval_mod.jax, "process_count", lambda: 2)
    mesh = eval_mod._dp_mesh_or_none(cfg)
    import jax
    assert mesh is not None
    assert mesh.devices.size == jax.local_device_count()
    # ... and a single LOCAL device means a sequential sweep of the shard
    monkeypatch.setattr(eval_mod.jax, "local_device_count", lambda: 1)
    assert eval_mod._dp_mesh_or_none(cfg) is None


def test_proc_shard_and_finalize_single_process():
    """Single-process: _proc_shard is the identity and
    _finalize_class_results only strips the raw counters."""
    from rcvpose_tpu import eval as eval_mod

    items = list(range(5))
    assert eval_mod._proc_shard(items) == items
    res = eval_mod._finalize_class_results({
        "add_before_icp": 0.5, "add_after_icp": 1.0, "frames": 2,
        "bf_count": 1, "af_count": 2, "net_total_ms": 10.0,
        "acc_total_ms": 20.0, "decode_total_ms": 1.0,
        "net_ms_per_frame": 5.0, "acc_ms_per_frame": 10.0,
        "decode_ms_per_frame_overlapped": 0.5, "vote_topk": 64})
    assert res["add_before_icp"] == 0.5
    assert "bf_count" not in res and "net_total_ms" not in res
    assert "eval_processes" not in res


def test_prefetched_chunks_producer_cancels_on_abort():
    """An abandoned _prefetched_chunks sweep (consumer raises or breaks)
    must cancel its producer thread instead of leaving it parked on q.put
    with a decoded chunk (ADVICE r3): after the abort, no further items
    load and the producer exits."""
    import threading
    import time

    from rcvpose_tpu import eval as eval_mod

    loads = []
    before = threading.active_count()

    def load_one(item):
        loads.append(item)
        return item

    gen = eval_mod._prefetched_chunks(list(range(100)), 1, load_one)
    next(gen)
    next(gen)
    gen.close()  # GeneratorExit inside the consumer loop -> finally runs

    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.02)
    assert threading.active_count() <= before, "producer thread leaked"
    n_after = len(loads)
    time.sleep(0.2)
    assert len(loads) == n_after  # producer stopped loading
    assert n_after < 100


def test_prefetched_chunks_abort_on_final_chunk_releases_producer():
    """The final-chunk window: the consumer aborts while the producer is
    still LOADING the last chunk (queue empty, so the finally's one-slot
    drain drains nothing). The producer then puts the chunk (slot fills),
    the loop exhausts — no cancellation check runs again — and the
    sentinel put would block forever on the full queue unless the
    producer's puts themselves poll the cancellation flag
    (code-review r4)."""
    import threading
    import time

    from rcvpose_tpu import eval as eval_mod

    last_loading = threading.Event()

    def load_one(item):
        if item == 1:
            last_loading.set()
            time.sleep(0.3)  # the consumer aborts during this load
        return item

    before = threading.active_count()
    gen = eval_mod._prefetched_chunks([0, 1], 1, load_one)
    next(gen)                       # consume chunk 0
    assert last_loading.wait(5.0)   # producer mid-load of the final chunk
    gen.close()                     # abort; queue is empty right now

    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.02)
    assert threading.active_count() <= before, (
        "producer leaked parked on the sentinel put")


def test_prefetched_chunks_full_sweep_and_padding():
    from rcvpose_tpu import eval as eval_mod

    out = list(eval_mod._prefetched_chunks(list(range(5)), 2, lambda x: -x))
    assert [n for n, _, _ in out] == [2, 2, 1]
    assert out[-1][1] == [4, 4]       # last chunk padded by repetition
    assert out[-1][2] == [-4, -4]


def test_prefetch_bench_arms_are_equivalent():
    """scripts/bench_eval_prefetch.py A/Bs the shipped _prefetched_chunks
    against its synchronous stand-in; the comparison is only valid if the
    two generators are semantically identical (chunking, padding, timer
    accounting) — assert that here so the bench can't drift."""
    import scripts.bench_eval_prefetch as bep

    from rcvpose_tpu import eval as eval_mod
    from rcvpose_tpu import utils

    for items, chunk in ([list(range(5)), 2], [list(range(4)), 1],
                         [list(range(3)), 4]):
        t_a, t_b = utils.StageTimers(), utils.StageTimers()
        a = list(eval_mod._prefetched_chunks(items, chunk, lambda x: -x,
                                             timers=t_a))
        b = list(bep.synchronous_chunks(items, chunk, lambda x: -x,
                                        timers=t_b))
        assert a == b
        assert t_a.counts.get("decode") == t_b.counts.get("decode")


def test_prefetched_chunks_decode_timer():
    from rcvpose_tpu import eval as eval_mod
    from rcvpose_tpu import utils

    timers = utils.StageTimers()
    list(eval_mod._prefetched_chunks([1, 2, 3], 1, lambda x: x,
                                     timers=timers))
    assert timers.counts.get("decode") == 3
    assert timers.totals["decode"] >= 0
