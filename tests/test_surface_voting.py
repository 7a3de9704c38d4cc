"""Sphere-surface voting mode (SURVEY §2.1 #18).

The reference's abandoned alternative accumulator rasterizes each point's
radial sphere *surface* by stacking Andres midpoint circles per x-slice
(`AccumulatorSpace.py:165-323`) — dead code there, with a broken slice-radius
recurrence (`(radius**2 - d**2) * 0.5` at :291 instead of
`sqrt(radius**2 - d**2)`). Our re-derivation (`voting.surface_band`) expresses
Andres' discrete sphere as the annulus `r - 1/2 <= ||v - c|| < r + 1/2` in
the pair-evaluation kernel. These tests prove (a) the slice geometry follows
the correct sqrt law the reference botched, (b) every slice is a proper Andres
*ring* (1-voxel-thick circle perimeter, not a disc), and (c) the mode recovers
the same keypoint as the exact reference band on synthetic sphere clouds.
"""

import numpy as np
import jax.numpy as jnp

from rcvpose_tpu.ops import voting
from tests.test_voting import synth_cloud


def _surface_grid_np(center, radius, grid_l):
    """NumPy oracle: Andres discrete-sphere voxel set by definition."""
    c = np.arange(grid_l, dtype=np.float64)
    ii, jj, kk = np.meshgrid(c, c, c, indexing="ij")
    d = np.sqrt((ii - center[0]) ** 2 + (jj - center[1]) ** 2
                + (kk - center[2]) ** 2)
    return (d >= radius - 0.5) & (d < radius + 0.5)


def test_surface_band_bounds():
    radii = jnp.asarray([4.0, 0.0, 6.0], jnp.float32)
    mask = jnp.asarray([True, True, False])
    lo, hi = voting.surface_band(radii, mask)
    np.testing.assert_allclose(np.asarray(lo), [3.5**2, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(hi), [4.5**2, 0.0, 0.0])


def test_surface_votes_match_andres_annulus_definition():
    """Kernel-path surface votes == the definitional NumPy annulus set."""
    grid_l = 24
    center = np.array([11.0, 12.0, 10.0])
    radius = 7.0
    want = _surface_grid_np(center, radius, grid_l)

    lo, hi = voting.surface_band(jnp.asarray([radius], jnp.float32),
                                 jnp.asarray([True]))
    got = voting.vote_counts_xla(
        voting.enumerate_grid(grid_l), jnp.asarray(center[None], jnp.float32),
        lo, hi, chunk=1).reshape(grid_l, grid_l, grid_l)
    np.testing.assert_array_equal(np.asarray(got) > 0, want)


def test_surface_slice_radii_follow_sqrt_law():
    """Per-slice ring radius tracks sqrt(R^2 - d^2) — the corrected math.

    The reference recurrence gives (R^2 - d^2)/2: at R=7, d=1 that is 24
    voxels instead of ~6.93; any surviving trace of it would blow this
    tolerance by an order of magnitude.
    """
    grid_l = 32
    center = np.array([15.0, 16.0, 15.0])
    radius = 7.0
    surf = _surface_grid_np(center, radius, grid_l)
    for d in range(0, int(radius) - 1):
        sl = surf[int(center[0]) + d]
        ys, zs = np.nonzero(sl)
        ring_r = np.hypot(ys - center[1], zs - center[2])
        expect = np.sqrt(radius**2 - d**2)
        # every slice voxel sits within the annulus cross-section
        assert np.all(np.abs(ring_r - expect) < 1.2), (d, ring_r, expect)
        assert abs(np.mean(ring_r) - expect) < 0.6, (d, np.mean(ring_r))


def test_surface_slices_are_rings_not_discs():
    """Andres rings are ~1 voxel thick: interior voxels must NOT vote."""
    grid_l = 32
    center = np.array([15.0, 16.0, 15.0])
    radius = 8.0
    surf = _surface_grid_np(center, radius, grid_l)
    eq = surf[int(center[0])]  # equatorial slice
    ys, zs = np.nonzero(eq)
    ring_r = np.hypot(ys - center[1], zs - center[2])
    assert ring_r.min() >= radius - 0.5
    # the disc interior (e.g. the center pixel) is empty
    assert not eq[int(center[1]), int(center[2])]


def test_surface_mode_recovers_exact_keypoint(rng):
    """On sphere clouds the surface peak coincides with the exact-band peak
    (every point's sphere surface passes through the true keypoint)."""
    pts, radial_dm, center = synth_cloud(rng, n=150)
    n_pad = 256
    pad = n_pad - pts.shape[0]
    pts_p = jnp.asarray(np.pad(pts, ((0, pad), (0, 0))), jnp.float32)
    rad_p = jnp.asarray(np.pad(radial_dm, (0, pad)), jnp.float32)
    mask = jnp.asarray(np.arange(n_pad) < pts.shape[0])

    res_exact = voting.accumulate_3d(pts_p, rad_p, mask, grid_l=64,
                                     mode="exact")
    res_surf = voting.accumulate_3d(pts_p, rad_p, mask, grid_l=64,
                                    mode="surface")
    assert not bool(res_surf.overflow)
    # same decode frame; peaks agree to within one voxel (5 mm) per axis
    np.testing.assert_allclose(np.asarray(res_surf.center_mm),
                               np.asarray(res_exact.center_mm),
                               atol=voting.ACC_UNIT_MM + 1e-3)
    err = np.linalg.norm(np.asarray(res_surf.center_mm) - center * 1000.0)
    assert err < 10.0, f"keypoint error {err} mm"
