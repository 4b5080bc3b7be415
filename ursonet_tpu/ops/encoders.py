"""Pose soft-assignment encoders.

Re-designs the reference encoders (utils.py:220-396) as fully vectorized
array programs: the reference's O(N·bins³) Python loops (utils.py:306-315)
become a single broadcasted kernel evaluation, usable both on host (numpy)
and on device under jit (jnp) — the latter enables re-encoding rotated
ground truth inside the on-device augmentation pipeline (replacing
utils.encode_ori_fast, net.py:427,438).

Orientation: SO(3) is quantized as an ORI_BINS_PER_DIM³ Euler-angle grid
over [-180,180]×[-90,90]×[-180,180]; each bin holds its quaternion; bins
that alias another orientation (boundary wrap, gimbal singularities) are
masked out; a ground-truth quaternion becomes a Gaussian-kernel PMF over
the remaining bins with variance (BETA/nr_bins)²/12 (utils.py:267-269,309).

Location: (image_x·Z, image_y·Z, Z) space quantized into LOC_BINS_PER_DIM³
bins bounded by the camera FOV tangents and dataset depth range
(urso.py:84-93); ground truth becomes an isotropic-Gaussian PMF
(utils.py:349-396).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ursonet_tpu import se3


class OriGrid(NamedTuple):
    """Precomputed orientation quantization structure.

    quat:  (bins³, 4) quaternion of each Euler-grid bin (H_quat).
    mask:  (bins³,) True for redundant bins to zero out (Redundant_flags).
    euler: (bins³, 3) Euler angles of each bin.
    nr_bins_per_dim: grid resolution.
    """
    quat: np.ndarray
    mask: np.ndarray
    euler: np.ndarray
    nr_bins_per_dim: int


def _euler_grid(nr_bins_per_dim: int, min_lim, max_lim) -> np.ndarray:
    """The bins³×3 Euler grid, ordered like itertools.product over
    linspace(0,1,bins) (utils.py:272-274): last dimension fastest."""
    lin = np.linspace(0.0, 1.0, nr_bins_per_dim)
    g0, g1, g2 = np.meshgrid(lin, lin, lin, indexing='ij')
    grid = np.stack([g0.ravel(), g1.ravel(), g2.ravel()], axis=1)
    min_lim = np.asarray(min_lim, dtype=np.float64)
    max_lim = np.asarray(max_lim, dtype=np.float64)
    return grid * (max_lim - min_lim) + min_lim


def build_ori_grid(nr_bins_per_dim: int,
                   min_lim=(-180, -90, -180),
                   max_lim=(180, 90, 180)) -> OriGrid:
    """Construct the quantization structure once (grid + quats + redundancy
    mask). Matches utils.py:272-300; fully vectorized."""
    H_ori = _euler_grid(nr_bins_per_dim, min_lim, max_lim)
    H_quat = np.asarray(
        se3.euler2quat(H_ori[:, 0], H_ori[:, 1], H_ori[:, 2]),
        dtype=np.float32)

    min_lim = np.asarray(min_lim, dtype=np.float64)
    max_lim = np.asarray(max_lim, dtype=np.float64)
    # Redundant boundary bins: pitch == +180 or roll == +180 wrap onto the
    # -180 bins (utils.py:297).
    boundary = np.logical_or(H_ori[:, 0] == max_lim[0],
                             H_ori[:, 2] == max_lim[2])
    # Gimbal singularities at yaw == ±90: all pitch values except the first
    # alias the same orientation (utils.py:299).
    gimbal = np.logical_and(np.abs(H_ori[:, 1]) == max_lim[1],
                            H_ori[:, 0] != min_lim[0])
    mask = np.logical_or(boundary, gimbal)
    return OriGrid(quat=H_quat, mask=mask, euler=H_ori,
                   nr_bins_per_dim=nr_bins_per_dim)


def ori_variance(beta: float, nr_bins_per_dim: int) -> float:
    """Kernel variance: Gaussian approximation of a uniform bin
    (utils.py:267-269)."""
    delta = beta / nr_bins_per_dim
    return delta ** 2 / 12.0


def encode_ori_pmf(oris, grid_quat, grid_mask, beta, nr_bins_per_dim, xp=np):
    """Encode quaternions as Gaussian-kernel PMFs over the bin grid.

    Vectorized core of utils.encode_ori (utils.py:306-315) /
    encode_ori_fast (utils.py:319-346). Works with numpy (host) or
    jax.numpy (pass xp=jnp) for on-device re-encoding after augmentation.

    oris: (..., 4); grid_quat: (B, 4); grid_mask: (B,) bool.
    Returns (..., B) normalized PMFs.
    """
    var = ori_variance(beta, nr_bins_per_dim)
    dots = xp.abs(oris @ grid_quat.T)          # (..., B)
    ang = xp.arccos(xp.minimum(dots, 1.0)) / np.pi
    H = xp.exp(-2.0 * ang ** 2 / var)
    H = xp.where(grid_mask, xp.zeros_like(H), H)
    return H / xp.sum(H, axis=-1, keepdims=True)


def encode_ori(oris, nr_bins_per_dim, beta, min_lim, max_lim):
    """Drop-in equivalent of the reference utils.encode_ori
    (utils.py:246-317): returns (encoded, H_quat, Redundant_flags)."""
    oris = np.asarray(oris, dtype=np.float32)
    grid = build_ori_grid(nr_bins_per_dim, min_lim, max_lim)
    encoded = encode_ori_pmf(oris, grid.quat, grid.mask, beta,
                             nr_bins_per_dim).astype(np.float32)
    return encoded, grid.quat, grid.mask


def encode_ori_fast(oris, beta, H_quat, Redundant_flags):
    """Single/batched re-encode with a prebuilt grid (utils.py:319-346)."""
    nr_total_bins = len(H_quat)
    nr_bins_per_dim = round(nr_total_bins ** (1.0 / 3))
    return encode_ori_pmf(np.asarray(oris, dtype=np.float32),
                          np.asarray(H_quat), np.asarray(Redundant_flags),
                          beta, nr_bins_per_dim)


class LocGrid(NamedTuple):
    """Location quantization structure.

    map3d: (bins³, 3) physical XYZ of each bin (histogram_3D_map): the
           Euler-product grid over (image_x, image_y, Z) with the first two
           coordinates multiplied by Z (urso-frame back-projection,
           utils.py:370-372).
    nr_bins_per_dim: grid resolution.
    var: isotropic Gaussian variance used for encoding.
    """
    map3d: np.ndarray
    nr_bins_per_dim: int
    var: float


def build_loc_grid(nr_bins_per_dim: int, beta: float, min_lim, max_lim) -> LocGrid:
    """Construct the location histogram structure (utils.py:361-372).

    Note: the reference overrides the width formula with
    delta = beta / nr_bins_per_dim (utils.py:363) — kept as-is.
    """
    H = _euler_grid(nr_bins_per_dim, min_lim, max_lim)
    H[:, 0] = H[:, 0] * H[:, 2]
    H[:, 1] = H[:, 1] * H[:, 2]
    delta = beta / nr_bins_per_dim
    var = delta ** 2 / 12.0
    return LocGrid(map3d=H.astype(np.float32),
                   nr_bins_per_dim=nr_bins_per_dim, var=var)


def encode_loc_pmf(locs, grid_map3d, var, xp=np):
    """Encode (image_x, image_y, Z) locations as Gaussian PMFs over the
    physical-XYZ bin grid. Vectorized core of utils.encode_loc
    (utils.py:377-394); the multivariate-normal normalization constant
    cancels in the PMF normalization, so only the exponent is computed.

    locs: (..., 3) as (image_x, image_y, Z); grid_map3d: (B, 3).
    Returns (..., B).
    """
    Z = locs[..., 2:3]
    xyz = xp.concatenate([locs[..., 0:1] * Z, locs[..., 1:2] * Z, Z], axis=-1)
    d2 = xp.sum((xyz[..., None, :] - grid_map3d) ** 2, axis=-1)
    H = xp.exp(-0.5 * d2 / var)
    return H / xp.sum(H, axis=-1, keepdims=True)


def encode_loc(locs, nr_bins_per_dim, beta, min_lim, max_lim):
    """Drop-in equivalent of the reference utils.encode_loc
    (utils.py:349-396): returns (encoded, H_loc_3D).

    n.b. the reference signature is (..., max_lim, min_lim) but every call
    site passes (mins, maxes) positionally (urso.py:91-93); this function
    uses the unambiguous (min_lim, max_lim) order.
    """
    locs = np.asarray(locs, dtype=np.float64)
    grid = build_loc_grid(nr_bins_per_dim, beta, min_lim, max_lim)
    encoded = encode_loc_pmf(locs, grid.map3d.astype(np.float64), grid.var)
    return encoded.astype(np.float32), grid.map3d
