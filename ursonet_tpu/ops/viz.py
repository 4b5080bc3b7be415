"""Visualization (reference component #25: utils.py:88-217 and the viewer
blocks of pose_estimator.py:546-604), redesigned headless-first: every
figure is saved to a file (matplotlib Agg) instead of opening interactive
windows, so it works on TPU pods / CI.

  * axes overlay: GT (solid) vs estimated (dashed) body axes projected
    onto the image (reference visualize_axes/plot_axes, utils.py:154-217)
  * location circles: GT vs estimated projected positions
    (pose_estimator.py:577-604)
  * Euler polar plot (reference polar_plot, utils.py:88-114)
  * orientation-PMF slice stack (reference visualize_weights,
    utils.py:117-151)
"""

from __future__ import annotations

import numpy as np

from ursonet_tpu import se3


def _mpl():
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    return plt


def project_points(K, pts, frame: str = 'camera'):
    """Project 3D points to pixels through intrinsics K.

    frame='camera': optical convention (x right, y down, z forward) —
    SPEED. frame='unreal': URSO/Unreal body frame (x forward, y right,
    z down) — the axis permutation of the reference adapter
    (urso.py:79-81).
    """
    pts = np.atleast_2d(np.asarray(pts, np.float64))
    if frame == 'unreal':
        cam = np.stack([pts[:, 1], pts[:, 2], pts[:, 0]], axis=1)
    else:
        cam = pts
    K = np.asarray(K, np.float64)
    uvw = cam @ K.T
    return uvw[:, :2] / np.maximum(uvw[:, 2:3], 1e-9)


def axes_endpoints(q, loc, scale: float = 1.0):
    """Body-axis endpoints in the label frame: origin + R·(scale·eᵢ)."""
    R = se3.quat2SO3(np.asarray(q, np.float64))
    ends = [np.asarray(loc, np.float64) + np.asarray(R) @ (scale * e)
            for e in np.eye(3)]
    return np.asarray(loc, np.float64), np.stack(ends)


def save_axes_overlay(image, K, loc_gt, q_gt, loc_est=None, q_est=None,
                      path='overlay.png', frame: str = None,
                      scale: float = 1.0):
    """GT (solid) vs estimated (dashed) pose axes over the image."""
    plt = _mpl()
    if frame is None:
        frame = 'unreal'
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.imshow(image)
    colors = ['r', 'g', 'b']

    def draw(loc, q, ls):
        origin, ends = axes_endpoints(q, loc, scale)
        o2 = project_points(K, origin[None], frame)[0]
        e2 = project_points(K, ends, frame)
        for i, c in enumerate(colors):
            ax.plot([o2[0], e2[i, 0]], [o2[1], e2[i, 1]], c + ls, lw=2)

    draw(loc_gt, q_gt, '-')
    if loc_est is not None:
        draw(loc_est, q_est, '--')
        g = project_points(K, np.asarray(loc_gt)[None], frame)[0]
        e = project_points(K, np.asarray(loc_est)[None], frame)[0]
        ax.add_patch(plt.Circle(g, 8, color='lime', fill=False, lw=2))
        ax.add_patch(plt.Circle(e, 8, color='yellow', fill=False, lw=2))
    ax.set_axis_off()
    fig.savefig(path, bbox_inches='tight', dpi=110)
    plt.close(fig)
    return path


def polar_plot(q_gt, q_est, path='polar.png'):
    """GT-vs-estimate Euler angles on a polar chart (utils.py:88-114)."""
    plt = _mpl()
    pyr_gt = np.asarray(se3.quat2euler(np.asarray(q_gt, np.float64)))
    pyr_est = np.asarray(se3.quat2euler(np.asarray(q_est, np.float64)))
    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(111, projection='polar')
    names = ['pitch', 'yaw', 'roll']
    for i, name in enumerate(names):
        ax.plot([0, np.deg2rad(float(pyr_gt[i]))], [0, 1.0],
                label=f"{name} gt")
        ax.plot([0, np.deg2rad(float(pyr_est[i]))], [0, 0.8], '--',
                label=f"{name} est")
    ax.legend(loc='lower left', fontsize=7)
    fig.savefig(path, bbox_inches='tight', dpi=110)
    plt.close(fig)
    return path


def visualize_weights(pmf, nr_bins_per_dim: int, path='pmf.png',
                      max_slices: int = 16):
    """Orientation-PMF slice stack: one heatmap per yaw slice
    (utils.py:117-151). pmf: flat [bins³] (masked bins may be missing —
    pad to the full cube)."""
    plt = _mpl()
    pmf = np.asarray(pmf, np.float64).ravel()
    full = nr_bins_per_dim ** 3
    if pmf.size < full:
        buf = np.zeros(full)
        buf[:pmf.size] = pmf
        pmf = buf
    cube = pmf[:full].reshape(nr_bins_per_dim, nr_bins_per_dim,
                              nr_bins_per_dim)
    n = min(nr_bins_per_dim, max_slices)
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(2 * cols, 2 * rows))
    axes = np.atleast_1d(axes).ravel()
    step = max(1, nr_bins_per_dim // n)
    vmax = cube.max() or 1.0
    for k, ax in enumerate(axes):
        ax.set_axis_off()
        if k < n:
            ax.imshow(cube[:, k * step, :], vmin=0, vmax=vmax,
                      cmap='viridis')
            ax.set_title(f"yaw bin {k * step}", fontsize=6)
    fig.savefig(path, bbox_inches='tight', dpi=110)
    plt.close(fig)
    return path
