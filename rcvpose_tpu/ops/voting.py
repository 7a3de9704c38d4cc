"""The 3D radial-voting accumulator — TPU-native redesign.

The reference implementation (``/root/reference/AccumulatorSpace.py:325-419``)
is a Numba CPU triple loop: for every masked depth pixel it scans the *entire*
data-dependent voxel grid and increments every voxel whose distance to the
point falls in the spherical band ``0 < round(r) - d < sqrt(3)/4`` — with an
unsynchronized ``+=`` data race across threads.

This module re-derives the op for TPU:

* **Static shapes.** The vote grid is a fixed ``L^3`` cube; the data-dependent
  extent of the reference grid becomes a *validity bound* applied at argmax
  time. Point sets are padded to a fixed size with a mask.
* **Pair-evaluation form.** ``votes[v] = sum_n [lo_n < d2(v, n) < hi_n]``
  over squared distances (no sqrt). With the exact band
  ``lo = (r - sqrt(3)/4)^2, hi = r^2`` this is equivalent to the reference
  test ``0 < round(r) - d < sqrt(3)/4``. Deterministic, race-free, and the
  same kernel (``rcvpose_tpu.ops.vote_pallas``) serves every mode because
  the voxel list is just data.
* **Three accuracy modes.**
  - ``exact``: evaluates the full grid — reference-equivalent vote counts and
    the reference's first-in-row-major argmax tie-break.
  - ``surface``: the reference's abandoned sphere-*surface* voting strategy
    (``draw_sphere``/``parallel_for``, AccumulatorSpace.py:281-323), math
    fixed and re-derived as an Andres-annulus band — see ``surface_band``.
  - ``hier``: coarse-to-fine — votes on a 4x-coarse grid with a widened band,
    then densely refines small windows around the top-K coarse peaks
    (default 8^3 windows around the top 32 — many small windows measured
    strictly better than few large ones, PERF.md sweep). ~50-100x less
    work; validated for keypoint/ADD parity rather than per-voxel vote
    parity.

Reference decode semantics matched exactly (AccumulatorSpace.py:373-419):
voxel = 5 mm (``acc_unit``); recenter by per-axis mean; radii dm -> voxels
(x20); ``zero_boundary = int(min - r_max) + 1`` shift when negative;
``center = (argmax + mean + 0.5) * 5`` mm.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Shell half-thickness: reference ``factor = sqrt(3)/4`` (AccumulatorSpace.py:328).
VOTE_BAND = math.sqrt(3.0) / 4.0
ACC_UNIT_MM = 5.0  # reference acc_unit (AccumulatorSpace.py:374)


class AccumulatorResult(NamedTuple):
    center_mm: jax.Array     # (3,) estimated keypoint, millimeters
    peak_votes: jax.Array    # () vote count at the peak
    overflow: jax.Array      # () bool: True if the reference's dynamic grid
    #                            would not fit in the static L^3 cube
    peak_voxel: jax.Array    # (3,) argmax voxel (shifted-grid coordinates)


# ---------------------------------------------------------------------------
# Band bounds (squared-distance form)
# ---------------------------------------------------------------------------

def band_votes(d2, r):
    """Oracle vote indicator. Equivalent to reference ``0 < r - d < sqrt(3)/4``
    (AccumulatorSpace.py:337-338) for the rounded radii r >= 0."""
    return jnp.logical_and(d2 < r * r, d2 > (r - VOTE_BAND) ** 2)


def exact_band(radii_round, point_mask):
    """Per-point [lo, hi] d2 bounds for the exact reference band.

    Masked-out points get lo = hi = 0 and can never vote (d2 >= 0 > hi fails).
    """
    r = radii_round
    valid = point_mask & (r > 0)
    lo = jnp.where(valid, (r - VOTE_BAND) ** 2, 0.0)
    hi = jnp.where(valid, r * r, 0.0)
    return lo, hi


def widened_band(radii_round, point_mask, slack):
    """[lo, hi] for the hier coarse stage: band widened by +/- slack."""
    r = radii_round
    valid = point_mask & (r > 0)
    lo = jnp.where(valid, jnp.maximum(r - slack, 0.0) ** 2, 0.0)
    hi = jnp.where(valid, (r + slack) ** 2, 0.0)
    return lo, hi


def surface_band(radii_round, point_mask):
    """Per-point [lo, hi] d2 bounds for the *sphere-surface* voting strategy.

    The reference carries an abandoned alternative accumulator that scatters
    each point's votes onto the discrete *surface* of its radial sphere by
    stacking Andres midpoint circles slice by slice
    (``AccumulatorSpace.py:165-323``: ``circle_perimeter`` -> ``draw_sphere``
    -> ``parallel_for``; never called by ``Accumulator_3D``). Two defects
    made it dead weight there: the slice-radius recurrence
    ``(radius**2 - d**2) * 0.5`` at ``:291`` should be ``sqrt(radius**2 -
    d**2)``, and the per-slice Python loops are scalar host code.

    The TPU-native re-derivation dissolves both. Andres' discrete sphere is
    by definition the voxel annulus ``r - 1/2 <= ||v - c|| < r + 1/2``
    (E. Andres, "Discrete circles, rings and spheres", 1994 — the paper the
    reference's circle code cites), so in the pair-evaluation form the whole
    rasterizer collapses to a different ``[lo, hi)`` band: ``lo =
    (r - 1/2)^2, hi = (r + 1/2)^2``. The slice radii come out as
    ``sqrt(r^2 - d^2)`` automatically — the broken recurrence has nothing
    to be wrong about — and the same Pallas/XLA kernels serve it unchanged.
    """
    r = radii_round
    valid = point_mask & (r > 0)
    lo = jnp.where(valid, jnp.maximum(r - 0.5, 0.0) ** 2, 0.0)
    hi = jnp.where(valid, (r + 0.5) ** 2, 0.0)
    return lo, hi


# ---------------------------------------------------------------------------
# Vote counting backends
# ---------------------------------------------------------------------------

def vote_counts_reference(voxels, points, radii, point_mask):
    """O(V*N) direct jnp oracle (small problems / tests only)."""
    d2 = jnp.sum((voxels[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    votes = band_votes(d2, radii[None, :]) & point_mask[None, :]
    return jnp.sum(votes.astype(jnp.float32), axis=1)


def vote_counts_xla(voxels, points, lo, hi, chunk=512):
    """Chunked pure-XLA pair evaluation (CPU fallback + kernel cross-check)."""
    n = points.shape[0]
    pad = (-n) % chunk
    if pad:
        points = jnp.pad(points, ((0, pad), (0, 0)))
        lo = jnp.pad(lo, (0, pad))
        hi = jnp.pad(hi, (0, pad))

    def step(acc, args):
        p, l, h = args
        d2 = jnp.sum(
            (voxels[:, None, :] - p[None, :, :]) ** 2, axis=-1)
        vt = jnp.logical_and(d2 > l[None, :], d2 < h[None, :])
        return acc + jnp.sum(vt.astype(jnp.float32), axis=1), None

    nchunks = points.shape[0] // chunk
    acc, _ = jax.lax.scan(
        step,
        jnp.zeros(voxels.shape[0], jnp.float32),
        (points.reshape(nchunks, chunk, 3),
         lo.reshape(nchunks, chunk),
         hi.reshape(nchunks, chunk)),
    )
    return acc


def vote_counts(voxels, points, lo, hi, mxu=False):
    """Dispatch: Pallas kernel on TPU, chunked XLA elsewhere.

    ``mxu=True`` selects the matmul-form kernel (d2 via |v|^2 - 2vp + |p|^2
    on the MXU). Measured SLOWER than the VPU form on v5e (K=8 matmuls at
    HIGHEST precision don't amortize), so nothing uses it by default; kept
    as a documented exploration for hardware where the tradeoff flips.
    """
    if jax.default_backend() == "tpu":
        from rcvpose_tpu.ops import vote_pallas
        if mxu:
            return vote_pallas.vote_counts_pallas_mxu(voxels, points, lo, hi)
        return vote_pallas.vote_counts_pallas(voxels, points, lo, hi)
    return vote_counts_xla(voxels, points, lo, hi)


def vote_grid_oracle(points, radii, point_mask, grid_l):
    """Dense (L, L, L) vote grid via separable per-point broadcast (oracle)."""
    coords = jnp.arange(grid_l, dtype=jnp.float32)

    def step(acc, args):
        p, r, m = args
        d2 = ((coords - p[0])[:, None, None] ** 2
              + (coords - p[1])[None, :, None] ** 2
              + (coords - p[2])[None, None, :] ** 2)
        vt = band_votes(d2, r) & m
        return acc + vt.astype(jnp.float32), None

    acc, _ = jax.lax.scan(
        step, jnp.zeros((grid_l,) * 3, jnp.float32),
        (points, radii, point_mask))
    return acc


def enumerate_grid(grid_l):
    """(L^3, 3) row-major voxel-center list for the exact mode."""
    c = jnp.arange(grid_l, dtype=jnp.float32)
    ii, jj, kk = jnp.meshgrid(c, c, c, indexing="ij")
    return jnp.stack([ii.ravel(), jj.ravel(), kk.ravel()], axis=1)


@partial(jax.jit, static_argnames=("grid_l", "mode"))
def accumulate_3d_no_depth(xyz_hyp_m, radial_dm, point_mask, grid_l=192,
                           mode="hier"):
    """RGB-only ablation accumulator: vote over a stack of depth-hypothesis
    clouds (reference ``Accumulator_3D_no_depth``/``fast_for_no_depth``,
    AccumulatorSpace.py:421-479 — unused by the main flows and partially
    broken there; this is the sanitized equivalent).

    Args:
      xyz_hyp_m: (D, N, 3) hypothesis clouds in meters (one per depth plane,
        cf. rgbd_to_point_cloud_no_depth, AccumulatorSpace.py:100-120).
      radial_dm: (N,) radii shared across hypotheses.
      point_mask: (N,) validity shared across hypotheses.

    Hypothesis clouds are just more voting spheres for the pair kernel:
    flatten and reuse the standard accumulator.
    """
    d, n, _ = xyz_hyp_m.shape
    flat = xyz_hyp_m.reshape(d * n, 3)
    radial = jnp.tile(jnp.asarray(radial_dm, jnp.float32), d)
    mask = jnp.tile(jnp.asarray(point_mask), d)
    return accumulate_3d(flat, radial, mask, grid_l=grid_l, mode=mode)


def suggest_grid_l(object_diameter_m, max_radial_dm, slack_voxels=16,
                   multiple=32, cap=256):
    """Static grid side for a class: the reference's dynamic side is
    ~ cloud extent + 2 * r_max (AccumulatorSpace.py:394-401); size the cube
    from the CAD diameter and the keypoint's max radius, rounded up.
    The runtime ``overflow`` flag still guards mask-noise outliers.
    """
    extent_vox = object_diameter_m * 1000.0 / ACC_UNIT_MM
    rmax_vox = max_radial_dm * 100.0 / ACC_UNIT_MM
    need = extent_vox + 2.0 * rmax_vox + slack_voxels
    l = int(-(-need // multiple) * multiple)
    return min(max(l, 2 * multiple), cap)


# ---------------------------------------------------------------------------
# Voxelization frame (reference AccumulatorSpace.py:373-399)
# ---------------------------------------------------------------------------

def _prepare(xyz_m, radial_dm, point_mask):
    """Voxelize + recenter + shift. All reductions are masked so padded
    points never influence the grid frame.

    Returns (points_vox, radii_rounded, means, shift, bound).
    Valid voxel indices are [0, bound) per axis, matching the reference's
    dynamic grid side ``length + int(r_max)``.
    """
    point_mask = jnp.asarray(point_mask)
    mask_f = point_mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(mask_f), 1.0)
    xyz_vox = jnp.asarray(xyz_m, jnp.float32) * (1000.0 / ACC_UNIT_MM)

    means = jnp.sum(xyz_vox * mask_f[:, None], axis=0) / n
    centered = xyz_vox - means

    radii_vox = jnp.asarray(radial_dm, jnp.float32) * (100.0 / ACC_UNIT_MM)
    # Reference rounds with np.around (round-half-even) inside fast_for.
    radii_round = jnp.round(radii_vox)

    big = jnp.float32(3e38)
    cmin = jnp.min(jnp.where(point_mask[:, None], centered, big))
    cmax = jnp.max(jnp.where(point_mask[:, None], centered, -big))
    rmax = jnp.max(jnp.where(point_mask, radii_vox, -big))

    # zero_boundary = int(min - r_max) + 1; int() truncates toward zero.
    zero_boundary = jnp.trunc(cmin - rmax) + 1.0
    shift = jnp.where(zero_boundary < 0, zero_boundary, 0.0)
    shifted = centered - shift

    length = jnp.trunc(cmax - shift)
    bound = length + jnp.trunc(rmax)
    # Keep padded points far outside every band.
    shifted = jnp.where(point_mask[:, None], shifted, 1e9)
    return shifted, radii_round, means, shift, bound


# ---------------------------------------------------------------------------
# Public accumulator
# ---------------------------------------------------------------------------

@partial(jax.jit,
         static_argnames=("grid_l", "mode", "topk", "cpt_stride", "win"))
def accumulate_3d(xyz_m, radial_dm, point_mask, grid_l=192, mode="hier",
                  topk=None, cpt_stride=None, win=None):
    """Point cloud (m) + radial predictions (dm) -> keypoint estimate (mm).

    Args:
      xyz_m: (N, 3) masked-depth point cloud in meters (padded).
      radial_dm: (N,) predicted radii in decimeters, aligned with ``xyz_m``.
      point_mask: (N,) bool validity.
      grid_l: static cube side (the reference's dynamic side is
        ``length + int(r_max)``; ``overflow`` reports if it exceeds grid_l).
      mode: 'exact', 'surface' (Andres sphere-surface voting, the math-fixed
        form of the reference's dead draw_sphere path) or 'hier'.
      topk/cpt_stride/win: hier-mode robustness/speed knobs (None = module
        defaults _TOPK/_CPT_STRIDE/_WIN); see _accumulate_hier.
    """
    pts, radii_round, means, shift, bound = _prepare(
        xyz_m, radial_dm, point_mask)
    if mode == "exact":
        return _accumulate_exact(pts, radii_round, point_mask, grid_l,
                                 means, shift, bound)
    elif mode == "surface":
        return _accumulate_exact(pts, radii_round, point_mask, grid_l,
                                 means, shift, bound, band_fn=surface_band)
    elif mode == "hier":
        return _accumulate_hier(pts, radii_round, point_mask, grid_l,
                                means, shift, bound,
                                topk=topk or _TOPK,
                                cpt_stride=cpt_stride or _CPT_STRIDE,
                                win=win or _WIN)
    raise ValueError(f"unknown accumulator mode: {mode}")


def _accumulate_exact(pts, radii_round, point_mask, grid_l, means, shift,
                      bound, band_fn=exact_band):
    lo, hi = band_fn(radii_round, point_mask)
    votes = vote_counts(enumerate_grid(grid_l), pts, lo, hi)
    votes = votes.reshape(grid_l, grid_l, grid_l)

    # Mask voxels the reference grid would not contain, then take the first
    # row-major argmax — same tie-break as np.argwhere(V == V.max())[0].
    coords = jnp.arange(grid_l, dtype=jnp.float32)
    inb = coords < bound
    valid = (inb[:, None, None] & inb[None, :, None]) & inb[None, None, :]
    masked = jnp.where(valid, votes, -1.0)
    flat = masked.reshape(-1)
    flat_idx = jnp.argmax(flat)
    peak = jnp.stack([flat_idx // (grid_l * grid_l),
                      (flat_idx // grid_l) % grid_l,
                      flat_idx % grid_l]).astype(jnp.float32)
    center = (peak + shift + means + 0.5) * ACC_UNIT_MM
    return AccumulatorResult(center_mm=center, peak_votes=flat[flat_idx],
                             overflow=bound > grid_l, peak_voxel=peak)


# Hier-mode constants. Defaults chosen by the round-2 sweeps
# (scripts/hier_exact_agreement.py --sweep/--sweep-win + prof_vote_win.py,
# table in PERF.md): many SMALL refine windows beat few large ones — at
# win=8 the refine stage is nearly free (kernel-granularity bound), so
# topk=32/win=8 costs no more than the old topk=4/win=16 while raising
# occluded-scene agreement with the exact mode from 0.58 to 0.83 (clean
# scenes are 1.0 at every setting). The coarse-stage subsample at 8 is
# agreement-identical to 4 (0.8333 on the cluttered suite either way) and
# 13% faster: 0.73 vs 0.84 ms/kpt dispatch-amortized at grid 128/8192 pts.
_COARSE = 4   # coarse factor (4x4x4 fine voxels per coarse cell)
_TOPK = 32    # refine around this many coarse peaks
_WIN = 8      # fine refine window side per peak
_CPT_STRIDE = 8  # coarse stage samples every k-th point (refine uses all)


def _accumulate_hier(pts, radii_round, point_mask, grid_l, means, shift,
                     bound, topk=_TOPK, cpt_stride=_CPT_STRIDE, win=_WIN):
    """Coarse-to-fine accumulation; same millimeter decode frame as exact.

    ``topk`` (refine windows) and ``cpt_stride`` (coarse-stage point
    subsample) trade robustness on multi-modal vote landscapes against
    work; defaults validated on single- AND cluttered-scene synthetic
    suites (scripts/hier_exact_agreement.py, table in PERF.md).
    """
    lc = grid_l // _COARSE
    cc = jnp.arange(lc, dtype=jnp.float32)
    ci, cj, ck = jnp.meshgrid(cc, cc, cc, indexing="ij")
    coarse_vox = (jnp.stack([ci.ravel(), cj.ravel(), ck.ravel()], axis=1)
                  + 0.5) * _COARSE - 0.5  # center of each coarse cell

    # Any fine voxel inside the exact band lies within
    # (band + coarse-cell circumradius) of its parent cell's center.
    # (bf16 pair evaluation measured 0.81x the f32 kernel on v5e — the VPU
    # has no bf16 rate advantage here and the f32-compare epilogue adds
    # converts; scripts/prof_vote_bf16.py. f32 stays.)
    slack = VOTE_BAND + math.sqrt(3.0) * _COARSE / 2.0
    lo_c, hi_c = widened_band(radii_round, point_mask, slack)
    # The coarse stage only RANKS cells to pick refine windows — a uniform
    # point subsample preserves the ranking statistic at a fraction of the
    # pair-evaluation cost (packed points are valid-first, so a stride is a
    # uniform subsample of the valid set). The refine stage votes with every
    # point, so the final peak/count semantics are unchanged. Validated by
    # scripts/hier_exact_agreement.py (identical keypoints on 120/120
    # synthetic frames, with and without 5 mm radial noise).
    cvotes = vote_counts(coarse_vox, pts[::cpt_stride],
                         lo_c[::cpt_stride], hi_c[::cpt_stride])

    cb = jnp.ceil(bound / _COARSE)
    cin = cc < cb
    cvalid = ((cin[:, None, None] & cin[None, :, None])
              & cin[None, None, :]).reshape(-1)
    cvotes = jnp.where(cvalid, cvotes, -1.0)
    _, top_idx = jax.lax.top_k(cvotes, topk)

    # Dense fine windows around each coarse peak, evaluated in one batch.
    def window_base(cidx):
        c = jnp.stack([cidx // (lc * lc), (cidx // lc) % lc,
                       cidx % lc]).astype(jnp.float32)
        base = c * _COARSE - (win - _COARSE) // 2
        return jnp.clip(base, 0, grid_l - win)

    bases = jax.vmap(window_base)(top_idx)  # (K, 3)
    w = jnp.arange(win, dtype=jnp.float32)
    wi, wj, wk = jnp.meshgrid(w, w, w, indexing="ij")
    local = jnp.stack([wi.ravel(), wj.ravel(), wk.ravel()], axis=1)  # (W^3,3)
    win_vox = (bases[:, None, :] + local[None, :, :]).reshape(-1, 3)

    lo_f, hi_f = exact_band(radii_round, point_mask)
    fvotes = vote_counts(win_vox, pts, lo_f, hi_f)
    fvalid = jnp.all(win_vox < bound, axis=1)
    fvotes = jnp.where(fvalid, fvotes, -1.0).reshape(topk, -1)

    best_per = jnp.max(fvotes, axis=1)
    kbest = jnp.argmax(best_per)
    widx = jnp.argmax(fvotes[kbest])
    local_best = jnp.stack([widx // (win * win), (widx // win) % win,
                            widx % win]).astype(jnp.float32)
    peak = bases[kbest] + local_best
    center = (peak + shift + means + 0.5) * ACC_UNIT_MM
    return AccumulatorResult(center_mm=center, peak_votes=best_per[kbest],
                             overflow=bound > grid_l, peak_voxel=peak)
