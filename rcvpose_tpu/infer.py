"""Serving-path inference engine: whole-frame pose estimation as one jit.

The reference eval loop round-trips host<->device once per keypoint per
frame (FCResBackbone, AccumulatorSpace.py:596) and runs each of the three
per-keypoint networks as a separate batch-1 forward. Here:

* the three keypoint networks run *sequentially unrolled* inside one
  program (measured on v5e: vmapping over stacked parameters lowers to
  batched-weight convolutions that run ~3x slower than three plain convs
  — 55 ms vs 18 ms for the trio at 480x640 bf16),
* voting for the three keypoints is vmapped,
* Horn fit closes the pose, all inside a single compiled program per frame.

``PoseEstimator`` is the serving API: construct once (compiles), call
``estimate(image, depth)`` per frame or ``estimate_batch`` for throughput.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rcvpose_tpu import fit, geometry, labels
from rcvpose_tpu import train as train_mod
from rcvpose_tpu.ops import voting


def stack_variables(variables_list):
    """Stack per-keypoint model variables along a leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *variables_list)


# Legacy fixed crop window for point packing (pixels). LINEMOD objects at
# 0.6-1.1 m project to well under this; window truncation is reported via
# ``cropped``. Serving derives a per-class window instead
# (``suggest_pack_window`` — escalation is an exception path, and a class
# whose objects always project larger than a fixed window would silently
# pay the full-frame re-run on EVERY frame); these remain the default for
# callers that pass no ``win_hw``.
WIN_H = 256
WIN_W = 320


def suggest_pack_window(cad_mm, k, z_min_mm=600.0, margin=1.2, multiple=32):
    """Packing window (win_h, win_w) sized to the class geometry: the CAD
    bounding-sphere diameter projected at the nearest expected depth
    ``z_min_mm`` through intrinsics ``k``, padded by ``margin`` and rounded
    up to ``multiple`` (TPU-friendly tile shapes). The grid-size analogue
    ``ops.voting.suggest_grid_l`` sizes the vote cube the same way."""
    cad_mm = np.asarray(cad_mm)
    center = cad_mm.mean(axis=0)
    diameter = 2.0 * float(np.linalg.norm(cad_mm - center, axis=1).max())
    k = np.asarray(k)
    out = []
    for f in (float(k[1, 1]), float(k[0, 0])):  # rows use fy, cols fx
        px = diameter / float(z_min_mm) * f * margin
        out.append(int(-(-max(px, 1.0) // multiple) * multiple))
    return tuple(out)


def _window_origin(any_rows, any_cols, win_h, win_w):
    """Top-left corner of a fixed window centered on the True extent."""
    h = any_rows.shape[0]
    w = any_cols.shape[0]
    ri = jnp.arange(h)
    ci = jnp.arange(w)
    big = jnp.int32(1 << 30)
    r0 = jnp.min(jnp.where(any_rows, ri, big))
    r1 = jnp.max(jnp.where(any_rows, ri, -1))
    c0 = jnp.min(jnp.where(any_cols, ci, big))
    c1 = jnp.max(jnp.where(any_cols, ci, -1))
    rc = jnp.where(r0 > r1, h // 2, (r0 + r1) // 2)
    cc = jnp.where(c0 > c1, w // 2, (c0 + c1) // 2)
    ro = jnp.clip(rc - win_h // 2, 0, h - win_h)
    co = jnp.clip(cc - win_w // 2, 0, w - win_w)
    return ro, co


def _frame_pose(apply_fn, stacked_vars, image_norm, depth_mm, k, max_radii_dm,
                gt_kpts_mm, sem_threshold=0.8, n_points=8192, grid_l=192,
                mode="hier", full_frame=False, topk=None, cpt_stride=None,
                win=None, win_hw=None):
    """Full frame: 3-net forward + 3x vote + Horn, one program.

    Args:
      apply_fn: model.apply (static).
      stacked_vars: variables stacked over the 3 keypoints (leading axis 3).
      image_norm: (H, W, 3) ImageNet-normalized image.
      depth_mm: (H, W) depth in millimeters.
      k: (3, 3) intrinsics.
      max_radii_dm: (3,) per-keypoint radius clip.
      gt_kpts_mm: (3, 3) model-frame keypoints (mm) for the Horn fit.

    Returns: dict(rt (4,4) mm, centers (3,3) mm, overflow (3,), counts (3,),
      scene_pts (3, n_points, 3) mm, scene_mask (3, n_points)).
    """
    def one_net(vars_):
        seg, radial = apply_fn(vars_, image_norm[None], False)
        return seg[0, :, :, 0], radial[0, :, :, 0]

    # Unrolled sequential applies: vmapping over the stacked params lowers
    # to batched-weight convs that measure ~3x slower on v5e. Accept either
    # a stacked pytree (leading axis 3) or a tuple of three variable trees —
    # the tuple form avoids per-frame dynamic slicing of the stacked params.
    if isinstance(stacked_vars, (tuple, list)):
        var_list = list(stacked_vars)
    else:
        var_list = [jax.tree.map(lambda a, i=i: a[i], stacked_vars)
                    for i in range(3)]
    maps = [one_net(v) for v in var_list]
    sem_maps = jnp.stack([m[0] for m in maps])     # (3, H, W)
    radial_maps = jnp.stack([m[1] for m in maps])  # (3, H, W)
    return _pose_from_maps(sem_maps, radial_maps, depth_mm, k, max_radii_dm,
                           gt_kpts_mm, sem_threshold, n_points, grid_l,
                           mode, full_frame, topk, cpt_stride, win, win_hw)


def _frame_pose_fused(apply_fn, variables, image_norm, depth_mm, k,
                      max_radii_dm, gt_kpts_mm, sem_threshold=0.8,
                      n_points=8192, grid_l=192, mode="hier",
                      full_frame=False, topk=None, cpt_stride=None,
                      win=None, win_hw=None):
    """Fused multi-head frame: ONE net forward (kpt_heads output pairs)
    replaces the reference's three per-keypoint networks — the TPU-first
    serving extension (config ``kpt_heads=3``). Voting/fit identical to
    ``frame_pose``."""
    seg, radial = apply_fn(variables, image_norm[None], False)
    sem_maps = jnp.moveaxis(seg[0], -1, 0)        # (K, H, W)
    radial_maps = jnp.moveaxis(radial[0], -1, 0)  # (K, H, W)
    return _pose_from_maps(sem_maps, radial_maps, depth_mm, k, max_radii_dm,
                           gt_kpts_mm, sem_threshold, n_points, grid_l,
                           mode, full_frame, topk, cpt_stride, win, win_hw)


def _pose_from_maps(sem_maps, radial_maps, depth_mm, k, max_radii_dm,
                    gt_kpts_mm, sem_threshold, n_points, grid_l, mode,
                    full_frame, topk=None, cpt_stride=None, win=None,
                    win_hw=None):
    """(K, H, W) sem + radial maps -> pose dict (shared by the 3-net and
    fused paths)."""
    # Crop a fixed window around the union of the three sem masks before
    # packing: the pack's TopK compaction scales with pixel count (3.4 ms
    # full-frame -> ~1 ms windowed). Truncation is flagged via ``cropped``;
    # ``full_frame=True`` packs the whole frame (the estimate() fallback for
    # large/near objects whose mask exceeds the window).
    h, w = depth_mm.shape
    wh, ww = (WIN_H, WIN_W) if win_hw is None else win_hw
    win_h = h if full_frame else min(wh, h)
    win_w = w if full_frame else min(ww, w)
    sems = (sem_maps > sem_threshold) & (radial_maps <= max_radii_dm[:, None,
                                                                    None])
    sems = sems & (depth_mm > 0)
    union = jnp.any(sems, axis=0)
    ro, co = _window_origin(jnp.any(union, axis=1), jnp.any(union, axis=0),
                            win_h, win_w)
    total_valid = jnp.sum(sems.astype(jnp.int32), axis=(1, 2))

    # Shared point packing: the three keypoints vote from the same physical
    # pixels (per-keypoint sem masks of one object differ only marginally),
    # so back-project and TopK-compact the window ONCE on the union mask and
    # give each keypoint its own validity mask over the shared packed points
    # (masked points carry lo == hi == 0 in the vote kernel and can never
    # vote). Packing was 3x top_k + gather = ~1.2 ms/frame of the 16.8 ms
    # device time; this runs it once.
    unionw = jax.lax.dynamic_slice(union, (ro, co), (win_h, win_w))
    depw = jnp.where(unionw, jax.lax.dynamic_slice(depth_mm, (ro, co),
                                                   (win_h, win_w)), 0.0)
    us = (co + jnp.arange(win_w)).astype(jnp.float32)[None, :]
    vs = (ro + jnp.arange(win_h)).astype(jnp.float32)[:, None]
    xs = (us - k[0, 2]) * depw / k[0, 0]
    ys = (vs - k[1, 2]) * depw / k[1, 1]
    flat_xyz = jnp.stack([xs, ys, depw], axis=-1).reshape(-1, 3) / 1000.0
    flat_union = (depw > 0).reshape(-1)
    # Budget check: when the union mask holds more pixels than the packing
    # budget, TopK compaction silently drops the excess (and with it some
    # keypoints' votes). Surface it so estimate() can escalate n_points.
    union_count = jnp.sum(flat_union.astype(jnp.int32))
    budget_exceeded = union_count > n_points
    order, umask = geometry.pack_valid_indices(flat_union, n_points)
    pts = jnp.where(umask[:, None], flat_xyz[order], 0.0)
    pts, umask = jax.lax.optimization_barrier((pts, umask))

    def one_kpt(sem_map, radial_map):
        semw = jax.lax.dynamic_slice(sem_map, (ro, co), (win_h, win_w))
        radw = jax.lax.dynamic_slice(radial_map, (ro, co), (win_h, win_w))
        valid = semw.reshape(-1)[order] & umask & (flat_union[order])
        rad = jnp.where(valid, radw.reshape(-1)[order], 0.0)
        n_valid = jnp.sum((semw & (depw > 0)).astype(jnp.int32))
        res = voting.accumulate_3d(pts, rad, valid, grid_l=grid_l, mode=mode,
                                   topk=topk, cpt_stride=cpt_stride, win=win)
        return res.center_mm, res.overflow, n_valid, pts * 1000.0, valid

    # vmapped over the 3 keypoints: the three vote kernels batch into one
    # Pallas call (measured faster than three separate instances — the
    # opposite tradeoff from the conv trio above).
    centers, overflow, counts, pts_mm, masks = jax.vmap(one_kpt)(
        sems, radial_maps)
    rt = fit.horn_fit(gt_kpts_mm, centers)
    cropped = counts < total_valid  # window truncated some mask pixels
    # Packed copy of the escalation signals: estimate() must read them on
    # the host every frame, and separate scalar fetches each cost a full
    # device round trip (~29 ms through this environment's tunnel; even on
    # a co-located host a sync apiece). One small vector = one fetch.
    escalate = jnp.stack([jnp.any(cropped).astype(jnp.float32),
                          budget_exceeded.astype(jnp.float32),
                          union_count.astype(jnp.float32)])
    return {"rt": rt, "centers": centers, "overflow": overflow,
            "counts": counts, "scene_pts": pts_mm, "scene_mask": masks,
            "cropped": cropped, "budget_exceeded": budget_exceeded,
            "union_count": union_count, "escalate": escalate}


_STATIC = ("apply_fn", "n_points", "grid_l", "mode", "sem_threshold",
           "full_frame", "topk", "cpt_stride", "win", "win_hw")

frame_pose = partial(jax.jit, static_argnames=_STATIC)(_frame_pose)
frame_pose_fused = partial(jax.jit, static_argnames=_STATIC)(
    _frame_pose_fused)


def _scan_frames(frame_fn, images_norm, depths_mm):
    """Run a per-frame program over a batch with ``lax.scan``.

    Measured composition (scripts/prof_batch_forms.py, v5e, 480x640 bf16,
    B=4, per frame): batching the conv forwards is WORSE than batch-1
    (16.1 vs 14.5 ms — full-res activations blow the on-chip working set),
    while scanning the pack/vote/fit stage is better than standalone
    frames (5.4 vs 7.2 ms — fixed overheads amortize, and inside a scan
    body the windowed packing's dynamic_slice stays a slice where vmap
    lowered it to a full-frame gather). So the fastest batch form is the
    UNBATCHED per-frame program scanned over frames in one dispatch.
    """
    def body(carry, inp):
        img, dep = inp
        return carry, frame_fn(img, dep)

    _, outs = jax.lax.scan(body, 0, (images_norm, depths_mm))
    return outs


@partial(jax.jit, static_argnames=_STATIC)
def frame_pose_batch(apply_fn, stacked_vars, images_norm, depths_mm, k,
                     max_radii_dm, gt_kpts_mm, sem_threshold=0.8,
                     n_points=8192, grid_l=192, mode="hier",
                     full_frame=False, topk=None, cpt_stride=None,
                     win=None, win_hw=None):
    """Batched ``frame_pose``: (B, H, W, 3) images + (B, H, W) depths,
    scanned per frame in one program (see ``_scan_frames`` for why nothing
    is actually batched inside). Returns the ``frame_pose`` dict with a
    leading batch axis on every entry."""
    def one(img, dep):
        return _frame_pose(
            apply_fn, stacked_vars, img, dep, k, max_radii_dm, gt_kpts_mm,
            sem_threshold=sem_threshold, n_points=n_points, grid_l=grid_l,
            mode=mode, full_frame=full_frame, topk=topk,
            cpt_stride=cpt_stride, win=win, win_hw=win_hw)
    return _scan_frames(one, images_norm, depths_mm)


@partial(jax.jit, static_argnames=_STATIC)
def frame_pose_fused_batch(apply_fn, variables, images_norm, depths_mm, k,
                           max_radii_dm, gt_kpts_mm, sem_threshold=0.8,
                           n_points=8192, grid_l=192, mode="hier",
                           full_frame=False, topk=None, cpt_stride=None,
                           win=None, win_hw=None):
    """Batched fused-path frames (see ``frame_pose_batch``)."""
    def one(img, dep):
        return _frame_pose_fused(
            apply_fn, variables, img, dep, k, max_radii_dm, gt_kpts_mm,
            sem_threshold=sem_threshold, n_points=n_points, grid_l=grid_l,
            mode=mode, full_frame=full_frame, topk=topk,
            cpt_stride=cpt_stride, win=win, win_hw=win_hw)
    return _scan_frames(one, images_norm, depths_mm)


class PoseEstimator:
    """Compile-once, per-frame 6DoF pose estimation for one object class."""

    def __init__(self, cfg, variables_list, keypoints, max_radii_dm,
                 cad_mm=None, k=None, device=None):
        """``variables_list``: 3 per-keypoint variable trees (reference
        mode, ``cfg.kpt_heads == 1``) or a single multi-head tree
        (``cfg.kpt_heads > 1`` — one net serves all keypoints).

        ``device``: pin this estimator to one accelerator chip — weights
        and constants are ``device_put`` there and every ``estimate``
        executes under ``jax.default_device``, so a multi-chip host can
        run one replica per chip concurrently (``replicate_to``; the
        ``PoseServer`` scale-out). None = the process default device."""
        self.cfg = cfg
        self.device = None
        self.fused = getattr(cfg, "kpt_heads", 1) > 1
        self.model = train_mod.build_model(cfg)
        # Pre-cast weights to the serving compute dtype once: casting the
        # ~118M f32 params per frame costs ~GBs of HBM traffic.
        dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                 else jnp.float32)
        cast = lambda v: jax.tree.map(  # noqa: E731
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, v)
        if self.fused:
            if isinstance(variables_list, (tuple, list)):
                variables_list = variables_list[0]
            self.stacked = cast(variables_list)
        else:
            self.stacked = tuple(cast(v) for v in variables_list)
        self.gt_kpts_mm = jnp.asarray(np.asarray(keypoints)[1:4] * 1000.0,
                                      jnp.float32)
        self.max_radii = jnp.asarray(max_radii_dm, jnp.float32)
        self.cad_mm = None if cad_mm is None else jnp.asarray(
            cad_mm, jnp.float32)
        self.k = jnp.asarray(
            geometry.LINEMOD_K if k is None else k, jnp.float32)
        # Packing window: explicit config override > derived from class
        # geometry (CAD bounding-sphere diameter projected at the nearest
        # expected depth) > legacy fixed 256x320. A class whose objects
        # project larger than a fixed window would otherwise trip
        # ``cropped`` on EVERY frame and silently pay the full-frame
        # re-run as a steady state (escalation is designed as an
        # exception path).
        ph = int(getattr(cfg, "pack_win_h", 0) or 0)
        pw = int(getattr(cfg, "pack_win_w", 0) or 0)
        if ph > 0 and pw > 0:
            self.win_hw = (ph, pw)
        elif cad_mm is not None:
            self.win_hw = suggest_pack_window(
                np.asarray(cad_mm), np.asarray(self.k),
                z_min_mm=float(getattr(cfg, "pack_z_min_mm", 600.0)))
        else:
            self.win_hw = None  # legacy WIN_H/WIN_W
        if device is not None:
            self._move_to(device)

    def _move_to(self, device):
        """``device_put`` every constant this estimator closes over onto
        ``device`` and pin execution there."""
        put = lambda t: jax.device_put(t, device)  # noqa: E731
        self.stacked = jax.tree.map(put, self.stacked)
        self.gt_kpts_mm = put(self.gt_kpts_mm)
        self.max_radii = put(self.max_radii)
        if self.cad_mm is not None:
            self.cad_mm = put(self.cad_mm)
        self.k = put(self.k)
        self.device = device

    def replicate_to(self, device):
        """A replica of this estimator pinned to ``device``: the weights
        are copied to that chip (HBM cost: one model copy) and its
        ``estimate`` runs there — replicas on distinct chips execute
        concurrently. The config/model objects are shared; nothing is
        re-read from disk."""
        import copy

        new = copy.copy(self)
        new._move_to(device)
        return new

    def _device_ctx(self):
        import contextlib

        if self.device is None:
            return contextlib.nullcontext()
        # thread-local: concurrent server threads each pin their own chip
        return jax.default_device(self.device)

    def _escalate(self, run, image_pixels):
        """Run a frame program and escalate its fallbacks until nothing is
        silently dropped: ``cropped`` (window truncated mask pixels) re-runs
        with full-frame packing; ``budget_exceeded`` (union mask larger than
        the point budget, so TopK compaction dropped votes) doubles
        ``n_points`` until the union fits (power-of-two sizes keep the set
        of compiled programs bounded). Both flags can fire on one frame —
        the loop re-checks after every re-run."""
        full = False
        n_pts = self.cfg.max_points
        result = run(full, n_pts)
        while True:
            # One host fetch for all escalation signals ((B?, 3) packed
            # [cropped, budget_exceeded, union_count]) — per-leaf scalar
            # reads would each pay a device->host round trip per frame.
            esc = np.asarray(result["escalate"]).reshape(-1, 3)
            redo = False
            if not full and bool((esc[:, 0] > 0).any()):
                full = True
                redo = True
            if bool((esc[:, 1] > 0).any()) and n_pts < image_pixels:
                needed = min(int(esc[:, 2].max()), image_pixels)
                while n_pts < needed:
                    n_pts *= 2
                redo = True
            if not redo:
                return result
            result = run(full, n_pts)

    def estimate(self, image_u8, depth_mm):
        """image: (H, W, 3) uint8 RGB; depth: (H, W) mm. Returns the frame
        dict from ``frame_pose`` (device arrays).

        Serving never silently drops votes: if the fixed packing window
        truncated any mask pixels (``cropped`` — a large/near object like
        driller or lamp) the frame re-runs with full-frame packing, and if
        the union mask exceeded the point budget (``budget_exceeded``) it
        re-runs with a doubled budget (see ``_escalate``).
        """
        with self._device_ctx():
            image_norm = labels.normalize_image(jnp.asarray(image_u8))
            pose_fn = frame_pose_fused if self.fused else frame_pose

            def run(full_frame, n_points):
                return pose_fn(
                    self.model.apply, self.stacked, image_norm,
                    jnp.asarray(depth_mm, jnp.float32), self.k,
                    self.max_radii, self.gt_kpts_mm,
                    sem_threshold=self.cfg.sem_threshold,
                    n_points=n_points, grid_l=self.cfg.vote_grid_l,
                    mode=self.cfg.vote_mode, full_frame=full_frame,
                    topk=getattr(self.cfg, "vote_topk", None),
                    cpt_stride=getattr(self.cfg, "vote_cpt_stride", None),
                    win=getattr(self.cfg, "vote_win", None),
                    win_hw=self.win_hw)

            return self._escalate(run, int(np.prod(np.shape(depth_mm))))

    def estimate_batch(self, images_u8, depths_mm):
        """Batched estimate: (B, H, W, 3) uint8 images + (B, H, W) mm depths
        -> batched frame dict (leading axis B on every entry). See
        ``frame_pose_batch`` for when this is (and is not) the fast path.

        The no-dropped-votes fallbacks escalate PER FRAME: the batch runs
        once at the serving knobs, then only the frames whose escalate
        flags tripped re-run through the single-frame path
        (``estimate``) and their rows are spliced into the batch result.
        Re-running the whole batch at full-frame packing / doubled budget
        for one oversized mask would be a latency cliff under mixed load;
        the untripped frames' results are returned exactly as the base
        run produced them. When escalated frames grew their point budget,
        every frame's ``scene_pts``/``scene_mask`` are zero-padded to the
        largest budget (padded entries have mask False — they can never
        vote and ICP ignores them)."""
        imgs_np = np.asarray(images_u8)
        deps_np = np.asarray(depths_mm, np.float32)
        with self._device_ctx():
            imgs = jax.vmap(labels.normalize_image)(jnp.asarray(imgs_np))
            deps = jnp.asarray(deps_np)
        batch_fn = frame_pose_fused_batch if self.fused else frame_pose_batch

        with self._device_ctx():
            result = batch_fn(
                self.model.apply, self.stacked, imgs, deps, self.k,
                self.max_radii, self.gt_kpts_mm,
                sem_threshold=self.cfg.sem_threshold,
                n_points=self.cfg.max_points, grid_l=self.cfg.vote_grid_l,
                mode=self.cfg.vote_mode, full_frame=False,
                topk=getattr(self.cfg, "vote_topk", None),
                cpt_stride=getattr(self.cfg, "vote_cpt_stride", None),
                win=getattr(self.cfg, "vote_win", None),
                win_hw=self.win_hw)

        # one host fetch of the packed (B, 3) [cropped, budget, union] flags
        esc = np.asarray(result["escalate"]).reshape(-1, 3)
        pixels = int(np.prod(deps_np.shape[1:]))
        tripped = (esc[:, 0] > 0) | ((esc[:, 1] > 0)
                                     & (self.cfg.max_points < pixels))
        if not tripped.any():
            return result

        singles = {int(i): self.estimate(imgs_np[i], deps_np[i])
                   for i in np.nonzero(tripped)[0]}
        n_max = max([np.shape(result["scene_pts"])[2]]
                    + [s["scene_pts"].shape[1] for s in singles.values()])

        def pad_pts(row):
            pad = n_max - row.shape[1]
            if pad == 0:
                return row
            width = [(0, 0), (0, pad)] + [(0, 0)] * (row.ndim - 2)
            return np.pad(row, width)

        out = {}
        for key, val in result.items():
            base = np.asarray(val)
            rows = [np.asarray(singles[i][key]) if i in singles else base[i]
                    for i in range(base.shape[0])]
            if key in ("scene_pts", "scene_mask"):
                rows = [pad_pts(r) for r in rows]
            # device arrays like the no-escalation return: the result type
            # must not depend on whether a frame tripped escalation (one
            # H2D on this rare path instead of surprise host numpy leaves)
            with self._device_ctx():
                out[key] = jnp.asarray(np.stack(rows))
        return out

    def refine(self, result, threshold_mm, icp_iters=None):
        """Optional ICP refinement of the fitted pose: align the CAD model
        (constructor ``cad_mm``) to the frame's own masked scene cloud."""
        if self.cad_mm is None:
            raise ValueError("PoseEstimator needs cad_mm for ICP refinement")
        with self._device_ctx():
            scene = result["scene_pts"].reshape(-1, 3)
            mask = result["scene_mask"].reshape(-1)
            return fit.icp_point_to_point(
                self.cad_mm, scene, mask, result["rt"], threshold_mm,
                max_iters=icp_iters or self.cfg.icp_iters)
