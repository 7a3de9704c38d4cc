"""--mode check-data: dataset-convention validation (rcvpose_tpu/checkdata).

Real-data ADD parity is unprovable without the real datasets; check-data
de-risks the first real run by validating every on-disk convention the
code assumes (units, coverage, alignment, HDF5 coherence) with
reference-cited messages. Tested on the synthetic fixture trees — clean
(no errors) and deliberately corrupted (each corruption caught)."""

import os

import numpy as np
import pytest

from rcvpose_tpu import checkdata
from rcvpose_tpu.config import Config
from tests.test_data import write_ascii_ply
from tests.test_eval_lm_format import make_lm_eval_tree
from tests.test_eval_lmo_ycb_format import make_ycb_eval_tree


def _errors(findings):
    return [f for f in findings if f.level == "ERROR"]


def test_lm_clean_tree_no_errors(tmp_path, rng):
    root = make_lm_eval_tree(tmp_path, rng)
    findings = checkdata.check_lm(root, "ape")
    assert not _errors(findings), [str(f) for f in _errors(findings)]
    # the fixture has no mask/mesh.ply (eval tree): those are WARNs
    assert any(f.level == "WARN" and "mesh.ply" in f.path
               for f in findings)


def test_lm_catches_mm_valued_eval_ply(tmp_path, rng):
    """A millimeter-valued <class>.ply silently collapses the radius clip
    and shrinks ADD 1000x (AccumulatorSpace.py:544-549) — check-data must
    name the unit convention."""
    root = make_lm_eval_tree(tmp_path, rng)
    ply = os.path.join(root, "LINEMOD", "ape", "ape.ply")
    from rcvpose_tpu.data import readers
    pts = readers.read_ply_points(ply)
    write_ascii_ply(ply, pts * 1000.0)  # corrupt: meters -> millimeters
    errs = _errors(checkdata.check_lm(root, "ape"))
    assert any("meter-valued" in f.message and "ape.ply" in f.path
               for f in errs), [str(f) for f in errs]


def test_lm_catches_missing_frame_and_bad_pose(tmp_path, rng):
    root = make_lm_eval_tree(tmp_path, rng)
    os.remove(os.path.join(root, "LINEMOD", "ape", "JPEGImages",
                           "000000.jpg"))
    pose_p = os.path.join(root, "LINEMOD", "ape", "pose", "pose1.npy")
    pose = np.load(pose_p)
    pose[:, 3] *= 1000.0  # corrupt: meters -> millimeters
    np.save(pose_p, pose)
    errs = _errors(checkdata.check_lm(root, "ape"))
    assert any("image missing" in f.message for f in errs)
    assert any("translation" in f.message.lower() or "|translation|"
               in f.message for f in errs), [str(f) for f in errs]


def test_lm_catches_bad_keypoints(tmp_path, rng):
    root = make_lm_eval_tree(tmp_path, rng)
    kp = os.path.join(root, "LINEMOD", "ape", "Outside9.npy")
    np.save(kp, np.load(kp) * 1000.0)  # mm-valued keypoints
    errs = _errors(checkdata.check_lm(root, "ape"))
    assert any("METERS" in f.message for f in errs)
    np.save(kp, np.zeros((4, 3)))  # wrong shape
    errs = _errors(checkdata.check_lm(root, "ape"))
    assert any("(9, 3)" in f.message for f in errs)


def test_ycb_clean_tree_no_errors(tmp_path, rng):
    make_ycb_eval_tree(tmp_path, rng, n_frames=1)
    findings = checkdata.check_ycb(str(tmp_path), "002_master_chef_can", 1)
    assert not _errors(findings), [str(f) for f in _errors(findings)]


def test_ycb_catches_missing_h5_and_radial_units(tmp_path, rng):
    import h5py

    make_ycb_eval_tree(tmp_path, rng, n_frames=1)
    h5p = os.path.join(str(tmp_path), "002_master_chef_can.hdf5")
    # corrupt one radial dataset: decimeters -> millimeters (x100)
    with h5py.File(h5p, "a") as f:
        key = list(f["3Dradius_pt1_dm"].keys())[0]
        bad = np.asarray(f["3Dradius_pt1_dm"][key]) * 100.0
        del f["3Dradius_pt1_dm"][key]
        f["3Dradius_pt1_dm"].create_dataset(key, data=bad)
    errs = _errors(checkdata.check_ycb(str(tmp_path),
                                       "002_master_chef_can", 1))
    assert any("DECIMETERS" in f.message for f in errs)

    os.remove(h5p)
    errs = _errors(checkdata.check_ycb(str(tmp_path),
                                       "002_master_chef_can", 1))
    assert any("HDF5 missing" in f.message for f in errs)


def test_ycb_catches_mat_field_and_split_mismatch(tmp_path, rng):
    import scipy.io

    make_ycb_eval_tree(tmp_path, rng, n_frames=1)
    mat_p = os.path.join(str(tmp_path), "data", "0000", "000001.mat")
    meta = scipy.io.loadmat(mat_p)
    del meta["factor_depth"]
    scipy.io.savemat(mat_p, {k: v for k, v in meta.items()
                             if not k.startswith("__")})
    errs = _errors(checkdata.check_ycb(str(tmp_path),
                                       "002_master_chef_can", 1))
    assert any("factor_depth" in f.message for f in errs)

    # split listing frames absent from the HDF5
    sp = os.path.join(str(tmp_path), "Split", "002_master_chef_can",
                      "val.txt")
    with open(sp, "w") as f:
        f.write("9999_999999\n")
    errs = _errors(checkdata.check_ycb(str(tmp_path),
                                       "002_master_chef_can", 1))
    assert any("id scheme mismatch" in f.message for f in errs)


def test_cli_check_data_exit_codes(tmp_path, rng, capsys):
    from rcvpose_tpu import cli

    root = make_lm_eval_tree(tmp_path, rng)
    cfg = Config(mode="check-data", dataset="lm", root_dataset=root,
                 class_name="ape")
    cli.main_dispatch(cfg)  # clean tree: no SystemExit
    out = capsys.readouterr().out
    assert "0 error(s)" in out

    os.remove(os.path.join(root, "LINEMOD", "ape", "Split", "val.txt"))
    with pytest.raises(SystemExit):
        cli.main_dispatch(cfg)


def test_lmo_checks(tmp_path, rng):
    # minimal LMO layout: one frame with rgb+depth+pose
    from PIL import Image

    occ = tmp_path / "OCCLUSION_LINEMOD"
    os.makedirs(occ / "RGB-D" / "rgb_noseg")
    os.makedirs(occ / "RGB-D" / "depth_noseg")
    os.makedirs(occ / "blender_poses" / "ape")
    img = (rng.uniform(size=(60, 80, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(occ / "RGB-D" / "rgb_noseg"
                              / "color_00000.png")
    depth = np.zeros((60, 80), np.uint16)
    depth[20:40, 30:50] = 800
    Image.fromarray(depth.astype(np.int32)).save(
        occ / "RGB-D" / "depth_noseg" / "depth_00000.png")
    pose = np.eye(3, 4, dtype=np.float64)
    pose[:, 3] = [0.0, 0.0, 0.8]
    np.save(occ / "blender_poses" / "ape" / "pose0.npy", pose)

    findings = checkdata.check_lmo(str(tmp_path), "ape")
    assert not _errors(findings), [str(f) for f in _errors(findings)]

    os.remove(occ / "RGB-D" / "depth_noseg" / "depth_00000.png")
    errs = _errors(checkdata.check_lmo(str(tmp_path), "ape"))
    assert any("depth frame missing" in f.message for f in errs)


def test_lmo_valid_tree_without_lm_training_dirs_passes(tmp_path, rng):
    """A working LMO setup has OCCLUSION_LINEMOD plus ONLY the LINEMOD
    class assets the LMO evaluator reads (<class>.ply + Outside9.npy) —
    no Split/JPEGImages/pose/mask dirs. run_check(dataset=lmo) must not
    flag the absent full-LM requirements as errors (code-review r5)."""
    from PIL import Image

    from rcvpose_tpu.config import Config

    occ = tmp_path / "OCCLUSION_LINEMOD"
    os.makedirs(occ / "RGB-D" / "rgb_noseg")
    os.makedirs(occ / "RGB-D" / "depth_noseg")
    os.makedirs(occ / "blender_poses" / "ape")
    img = (rng.uniform(size=(60, 80, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(occ / "RGB-D" / "rgb_noseg"
                              / "color_00000.png")
    depth = np.zeros((60, 80), np.uint16)
    depth[20:40, 30:50] = 800
    Image.fromarray(depth.astype(np.int32)).save(
        occ / "RGB-D" / "depth_noseg" / "depth_00000.png")
    pose = np.eye(3, 4, dtype=np.float64)
    pose[:, 3] = [0.0, 0.0, 0.8]
    np.save(occ / "blender_poses" / "ape" / "pose0.npy", pose)
    # the borrowed class assets, and NOTHING else under LINEMOD/ape
    pv = tmp_path / "LINEMOD" / "ape"
    os.makedirs(pv)
    cad = rng.uniform(-0.05, 0.05, size=(500, 3))
    with open(pv / "ape.ply", "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {len(cad)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n")
        for p in cad:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")
    np.save(pv / "Outside9.npy", rng.uniform(-0.1, 0.1, size=(9, 3)))

    cfg = Config(dataset="lmo", root_dataset=str(tmp_path),
                 class_name="ape")
    findings = checkdata.run_check(cfg, progress=lambda *_: None)
    assert not _errors(findings), [str(f) for f in _errors(findings)]

    # the borrowed eval ply IS load-bearing for LMO: its absence is ERROR
    os.remove(pv / "ape.ply")
    errs = _errors(checkdata.run_check(cfg, progress=lambda *_: None))
    assert any("ape.ply" in f.path for f in errs)


def test_lmo_stray_png_flagged_not_crashed(tmp_path, rng):
    """A stray .png in rgb_noseg (preview.png, editor copy) must become
    a WARN finding, not a ValueError in the frame-number parse — and the
    evaluator's own frame filter now ignores it (code-review r5)."""
    from PIL import Image

    occ = tmp_path / "OCCLUSION_LINEMOD"
    os.makedirs(occ / "RGB-D" / "rgb_noseg")
    os.makedirs(occ / "RGB-D" / "depth_noseg")
    os.makedirs(occ / "blender_poses" / "ape")
    img = (rng.uniform(size=(60, 80, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(occ / "RGB-D" / "rgb_noseg"
                              / "color_00000.png")
    Image.fromarray(img).save(occ / "RGB-D" / "rgb_noseg" / "preview.png")
    depth = np.zeros((60, 80), np.uint16)
    depth[20:40, 30:50] = 800
    Image.fromarray(depth.astype(np.int32)).save(
        occ / "RGB-D" / "depth_noseg" / "depth_00000.png")
    pose = np.eye(3, 4, dtype=np.float64)
    pose[:, 3] = [0.0, 0.0, 0.8]
    np.save(occ / "blender_poses" / "ape" / "pose0.npy", pose)

    findings = checkdata.check_lmo(str(tmp_path), "ape")
    assert not _errors(findings), [str(f) for f in _errors(findings)]
    assert any("preview.png" in f.path and f.level == "WARN"
               for f in findings)


def test_corrupt_files_become_findings_not_tracebacks(tmp_path, rng):
    """Truncated/corrupt data files must yield ERROR findings and the
    walk must continue reporting the rest (code-review r5)."""
    root = make_lm_eval_tree(tmp_path, rng)
    pv = os.path.join(root, "LINEMOD", "ape")
    with open(os.path.join(pv, "Outside9.npy"), "wb") as f:
        f.write(b"\x93NUMPY garbage")          # corrupt npy header
    frame_id = open(os.path.join(pv, "Split", "val.txt")).read().split()[0]
    pose_p = os.path.join(pv, "pose", f"pose{int(frame_id)}.npy")
    with open(pose_p, "wb") as f:
        f.write(b"not a npy")
    findings = checkdata.check_lm(root, "ape")
    errs = _errors(findings)
    assert any("unreadable keypoint" in f.message for f in errs)
    assert any("unreadable pose" in f.message for f in errs)
    # the walk continued past the corrupt files: later finds still present
    assert any("depth" in f.path for f in findings)
