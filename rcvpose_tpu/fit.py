"""Closed-form rigid pose fitting + ICP refinement, pure jnp.

TPU-native replacement for two host-side native components of the reference:

* ``util/horn.py`` — Horn's 1987 quaternion least-squares fit, there done with
  a hand-rolled 1-indexed Jacobi eigensolver in Python loops. Here: build the
  4x4 quaternion matrix N and take the max-eigenvalue eigenvector with
  ``jnp.linalg.eigh`` — closed form, jit-able, vmappable over frames.
* Open3D ``registration_icp`` point-to-point (AccumulatorSpace.py:710-715,
  940-946, 1165-1169) — here a fixed-iteration ``lax.scan``: NN
  correspondence by brute-force pairwise distances (MXU work at these sizes)
  followed by a weighted Horn fit per iteration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _quat_to_rot(q):
    """Unit quaternion (w, x, y, z) -> 3x3 rotation (Horn's convention,
    util/horn.py:151-159)."""
    q0, q1, q2, q3 = q[0], q[1], q[2], q[3]
    return jnp.array([
        [q0*q0 + q1*q1 - q2*q2 - q3*q3, 2*(q1*q2 - q0*q3), 2*(q1*q3 + q0*q2)],
        [2*(q1*q2 + q0*q3), q0*q0 + q2*q2 - q1*q1 - q3*q3, 2*(q2*q3 - q0*q1)],
        [2*(q1*q3 - q0*q2), 2*(q2*q3 + q0*q1), q0*q0 + q3*q3 - q1*q1 - q2*q2],
    ])


def _max_eigvec_4x4(n, squarings=10):
    """Max-eigenvalue eigenvector of a symmetric 4x4 via shifted repeated
    squaring.

    ``jnp.linalg.eigh`` lowers to scalar-heavy loops that are pathologically
    slow to compile and run on TPU for tiny matrices. Instead: Gershgorin-
    shift to make the spectrum positive with the same top eigenvector, then
    square the matrix ``squarings`` times (normalizing to avoid overflow) —
    equivalent to 2^squarings power-iteration steps, so convergence is
    ratio^1024 for the default: exact to f32 for any nonzero eigengap. All
    statically unrolled: ~10 4x4 matmuls, no device loops.
    """
    row_abs = jnp.sum(jnp.abs(n), axis=1)
    lower = jnp.min(jnp.diagonal(n) - (row_abs - jnp.abs(jnp.diagonal(n))))
    c = jnp.maximum(0.0, -lower) + 1e-6 * jnp.max(jnp.abs(n))
    a = n + c * jnp.eye(4, dtype=n.dtype)

    for _ in range(squarings):
        a = a / jnp.maximum(jnp.max(jnp.abs(a)), 1e-30)
        a = jnp.matmul(a, a, precision=jax.lax.Precision.HIGHEST)
    # a ~ lam^(2^k) v v^T: any non-orthogonal probe lands on v
    q = a @ jnp.full((4,), 0.5, dtype=n.dtype)
    return q / jnp.maximum(jnp.linalg.norm(q), 1e-30)


def horn_fit(p1, p2, weights=None):
    """Least-squares rigid transform A (4x4) with A[:3] @ [p1, 1] ~= p2.

    Args:
      p1: (N, 3) source points.
      p2: (N, 3) destination points.
      weights: optional (N,) non-negative weights (masked correspondences).

    Returns: (4, 4) homogeneous transform.
    """
    p1 = jnp.asarray(p1, jnp.float32)
    p2 = jnp.asarray(p2, jnp.float32)
    if weights is None:
        weights = jnp.ones(p1.shape[0], jnp.float32)
    w = weights.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    c1 = jnp.sum(p1 * w[:, None], axis=0) / wsum
    c2 = jnp.sum(p2 * w[:, None], axis=0) / wsum
    q1 = p1 - c1
    q2 = p2 - c2
    # S[a, b] = sum_i w_i * q1[i, a] * q2[i, b]
    s = jnp.einsum("i,ia,ib->ab", w, q1, q2,
                   precision=jax.lax.Precision.HIGHEST)
    sxx, sxy, sxz = s[0, 0], s[0, 1], s[0, 2]
    syx, syy, syz = s[1, 0], s[1, 1], s[1, 2]
    szx, szy, szz = s[2, 0], s[2, 1], s[2, 2]
    n = jnp.array([
        [sxx + syy + szz, syz - szy, szx - sxz, sxy - syx],
        [syz - szy, sxx - syy - szz, sxy + syx, szx + sxz],
        [szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy],
        [sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz],
    ])
    q = _max_eigvec_4x4(n)
    r = _quat_to_rot(q)
    t = c2 - r @ c1
    a = jnp.eye(4, dtype=jnp.float32)
    a = a.at[:3, :3].set(r)
    a = a.at[:3, 3].set(t)
    return a


@partial(jax.jit, static_argnames=("max_iters", "rel_fitness", "rel_rmse",
                                   "return_iters"))
def icp_point_to_point(source, target, target_mask, init, threshold,
                       max_iters=30, rel_fitness=None, rel_rmse=None,
                       return_iters=False):
    """Point-to-point ICP: align ``source`` onto ``target``.

    Mirrors Open3D ``registration_icp(source, target, threshold, init,
    TransformationEstimationPointToPoint())``. Two modes:

    * ``rel_fitness``/``rel_rmse`` both None (default): a fixed iteration
      count, ``lax.scan`` over ``max_iters`` steps — the reference's LM/LMO
      criteria (default max_iteration=30, AccumulatorSpace.py:710-715,
      940-946).
    * tolerances set: iterate TO CONVERGENCE under a ``lax.while_loop`` —
      the reference's YCB criteria (``max_iteration=2_000_000`` with
      ``relative_fitness=relative_rmse=1e-6``, AccumulatorSpace.py:
      1165-1169). Matches Open3D's check exactly: stop when the ABSOLUTE
      per-iteration change of both fitness (inlier fraction of source
      points) and inlier RMSE drops below the respective tolerance
      (Open3D's "relative_*" names notwithstanding, its comparison is an
      absolute delta — pipelines/registration/Registration.cpp), or at
      ``max_iters`` updates. Like Open3D, quality is evaluated BEFORE
      the next update is applied, so the returned transform is the one
      whose quality passed the test — no trailing extra update — and
      the iteration count is the number of updates applied.

    Args:
      source: (S, 3) model points (e.g. CAD vertices, mm).
      target: (T, 3) scene points, padded.
      target_mask: (T,) bool validity of scene points.
      init: (4, 4) initial transform.
      threshold: max correspondence distance (same unit as points).
      max_iters: iteration count (fixed mode) or cap (converged mode).
      rel_fitness / rel_rmse: Open3D-style convergence tolerances.
      return_iters: converged mode only — also return the iteration count
        at which the loop stopped (tests/benchmarks).

    Returns: (4, 4) refined transform (plus the iteration count when
    ``return_iters``).
    """
    source = jnp.asarray(source, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    big = jnp.float32(1e30)
    t2 = jnp.sum(target * target, axis=1)
    n_src = jnp.float32(source.shape[0])

    def nn(src_tf):
        # d2[s, t] via |s|^2 - 2 s.t + |t|^2 (MXU), masked targets excluded
        d2 = (jnp.sum(src_tf * src_tf, axis=1)[:, None]
              - 2.0 * jnp.matmul(src_tf, target.T,
                                 precision=jax.lax.Precision.HIGHEST)
              + t2[None, :])
        d2 = jnp.where(target_mask[None, :], d2, big)
        idx = jnp.argmin(d2, axis=1)
        dmin = jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0]
        return idx, jnp.sqrt(jnp.maximum(dmin, 0.0))

    def one_iter(rt):
        """One ICP update; also returns this iteration's registration
        quality (fitness = inlier fraction, inlier RMSE) — the quantities
        Open3D's convergence criteria watch."""
        src_tf = source @ rt[:3, :3].T + rt[:3, 3]
        idx, dist = nn(src_tf)
        w = (dist <= threshold).astype(jnp.float32)
        n_corr = jnp.sum(w)
        enough = n_corr >= 3.0
        corr = target[idx]
        delta = horn_fit(src_tf, corr, weights=w)
        new_rt = jnp.where(enough, delta @ rt, rt)
        fitness = n_corr / n_src
        rmse = jnp.sqrt(jnp.sum(w * dist * dist)
                        / jnp.maximum(n_corr, 1.0))
        return new_rt, fitness, rmse

    init = jnp.asarray(init, jnp.float32)

    if rel_fitness is None and rel_rmse is None:
        def step(rt, _):
            new_rt, _, _ = one_iter(rt)
            return new_rt, None

        rt, _ = jax.lax.scan(step, init, None, length=max_iters)
        if return_iters:
            return rt, jnp.int32(max_iters)
        return rt

    tol_f = jnp.float32(rel_fitness if rel_fitness is not None else 0.0)
    tol_r = jnp.float32(rel_rmse if rel_rmse is not None else 0.0)

    # Open3D's loop evaluates registration quality of the CURRENT
    # transform, compares it against the previous evaluation, and only
    # when not converged applies the next update — so the transform it
    # returns is the one whose quality passed the test, with no extra
    # update on top. Mirror that order exactly: each body evaluates
    # quality(rt) (one NN pass, shared with the update), decides `done`
    # against the previous quality, and keeps rt unchanged when done.
    # The first body compares against -1 sentinels (Open3D's first
    # comparison is update-1's quality vs the init's quality — same
    # sequence, since our body 1 evaluates the init). ``n_upd`` counts
    # UPDATES APPLIED, the reference's iteration count.

    def cond(carry):
        _, _, _, n_upd, done = carry
        return (~done) & (n_upd < max_iters)

    def body(carry):
        rt, prev_f, prev_r, n_upd, _ = carry
        new_rt, fitness, rmse = one_iter(rt)
        done = ((jnp.abs(prev_f - fitness) < tol_f)
                & (jnp.abs(prev_r - rmse) < tol_r))
        rt = jnp.where(done, rt, new_rt)
        return rt, fitness, rmse, n_upd + jnp.where(done, 0, 1), done

    carry = (init, jnp.float32(-1.0), jnp.float32(-1.0), jnp.int32(0),
             jnp.bool_(False))
    rt, _, _, iters, _ = jax.lax.while_loop(cond, body, carry)
    if return_iters:
        return rt, iters
    return rt
