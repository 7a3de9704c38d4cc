"""Independent NumPy oracles for the reference algorithms.

Written fresh from the behavioral spec in SURVEY.md (with file:line citations
into /root/reference) — these deliberately mirror the *reference semantics*,
including its quirks (banker's rounding of radii, int() truncation of the
zero boundary, first-row-major argmax), so the TPU implementations can be
validated against them on synthetic data.
"""

import numpy as np

FACTOR = np.sqrt(3.0) / 4.0


def project_np(xyz, k, rt):
    cam = xyz @ rt[:3, :3].T + rt[:3, 3]
    uvw = cam @ np.asarray(k).T
    return uvw[:, :2] / uvw[:, 2:], cam


def backproject_np(depth, k):
    """Reference rgbd_to_point_cloud (data_loader.py:35-43): row-major
    nonzero pixels -> (N, 3) points, plus the pixel indices."""
    vs, us = np.nonzero(depth)
    zs = depth[vs, us].astype(np.float64)
    xs = (us - k[0, 2]) * zs / k[0, 0]
    ys = (vs - k[1, 2]) * zs / k[1, 1]
    return np.stack([xs, ys, zs], axis=1), vs, us


def radial_map_np(depth_mm, mask, pose, kpt_m, k, max_radii_dm,
                  ycb_clip=False):
    """Reference RData.transform label math (data_loader.py:68-114)."""
    depth = np.where(mask == 0, 0, depth_mm)
    pts_mm, vs, us = backproject_np(depth, k)
    xyz = pts_mm / 1000.0
    pose_mm = pose.copy()
    pose_mm[:, 3] = pose[:, 3] * 1000.0
    kpt_cam = (pose_mm[:, :3] @ (kpt_m * 1000.0) + pose_mm[:, 3]) / 1000.0
    dist = np.linalg.norm(xyz - kpt_cam, axis=1)
    rmap = np.zeros(depth.shape, np.float64)
    rmap[vs, us] = dist
    lbl = rmap * 10.0
    lbl = np.where(lbl > max_radii_dm, 0.0, lbl)
    if ycb_clip:
        lbl = np.where(lbl >= 10.0, 0.0, lbl)
    sem = np.where(lbl > 0, 1.0, -1.0)
    return lbl, sem


def vote_grid_np(points, radii, grid_shape):
    """Reference fast_for (AccumulatorSpace.py:325-341), race-free."""
    votes = np.zeros(grid_shape, np.float64)
    ii = np.arange(grid_shape[0])[:, None, None]
    jj = np.arange(grid_shape[1])[None, :, None]
    kk = np.arange(grid_shape[2])[None, None, :]
    for p, r in zip(points, radii):
        rr = int(np.around(r))
        d = np.sqrt((ii - p[0]) ** 2 + (jj - p[1]) ** 2 + (kk - p[2]) ** 2)
        votes += ((rr - d < FACTOR) & (rr - d > 0)).astype(np.float64)
    return votes


def accumulator_3d_np(xyz_m, radial_dm):
    """Reference Accumulator_3D (AccumulatorSpace.py:373-419), including the
    data-dependent grid. Returns (center_mm (3,), grid_side)."""
    acc_unit = 5.0
    xyz = np.asarray(xyz_m, np.float64) * 1000.0 / acc_unit
    means = xyz.mean(axis=0)
    xyz = xyz - means
    radial = np.asarray(radial_dm, np.float64) * 100.0 / acc_unit

    zero_boundary = int(xyz.min() - radial.max()) + 1
    if zero_boundary < 0:
        xyz = xyz - zero_boundary
    length = int(xyz.max())
    side = length + int(radial.max())
    votes = vote_grid_np(xyz, radial, (side, side, side))
    center = np.argwhere(votes == votes.max())[0].astype(np.float64)
    if zero_boundary < 0:
        center += zero_boundary
    center = (center + means + 0.5) * acc_unit
    return center, side


def horn_fit_np(p1, p2):
    """Horn 1987 closed-form rigid fit (util/horn.py:75-181 semantics):
    returns 4x4 A with R, t such that A @ p1 ~= p2 (in homogeneous form)."""
    c1 = p1.mean(axis=0)
    c2 = p2.mean(axis=0)
    q1 = p1 - c1
    q2 = p2 - c2
    s = q1.T @ q2  # S[a][b] = sum p1_a * p2_b
    n = np.array([
        [s[0, 0] + s[1, 1] + s[2, 2], s[1, 2] - s[2, 1],
         s[2, 0] - s[0, 2], s[0, 1] - s[1, 0]],
        [s[1, 2] - s[2, 1], s[0, 0] - s[1, 1] - s[2, 2],
         s[0, 1] + s[1, 0], s[2, 0] + s[0, 2]],
        [s[2, 0] - s[0, 2], s[0, 1] + s[1, 0],
         -s[0, 0] + s[1, 1] - s[2, 2], s[1, 2] + s[2, 1]],
        [s[0, 1] - s[1, 0], s[2, 0] + s[0, 2],
         s[1, 2] + s[2, 1], -s[0, 0] - s[1, 1] + s[2, 2]],
    ])
    w, v = np.linalg.eigh(n)
    q = v[:, -1]  # max eigenvalue
    q0, q1_, q2_, q3 = q
    r = np.array([
        [q0*q0 + q1_*q1_ - q2_*q2_ - q3*q3, 2*(q1_*q2_ - q0*q3), 2*(q1_*q3 + q0*q2_)],
        [2*(q1_*q2_ + q0*q3), q0*q0 + q2_*q2_ - q1_*q1_ - q3*q3, 2*(q2_*q3 - q0*q1_)],
        [2*(q1_*q3 - q0*q2_), 2*(q2_*q3 + q0*q1_), q0*q0 + q3*q3 - q1_*q1_ - q2_*q2_],
    ])
    t = c2 - r @ c1
    a = np.eye(4)
    a[:3, :3] = r
    a[:3, 3] = t
    return a
