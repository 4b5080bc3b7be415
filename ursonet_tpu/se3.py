"""SO(3) / quaternion / Euler-angle math (host-side, numpy).

Convention-exact re-derivation of the reference math library
(reference: se3lib.py:8-318): quaternions are scalar-LAST [qx, qy, qz, qw]
in the JPL (left-handed) convention of Trawny & Roumeliotis, "Indirect
Kalman filter for 3D attitude estimation"; Euler angles are (pitch, yaw,
roll) in DEGREES applied in XYZ order with the left-handed sign choices of
the reference (se3lib.py:38-51).

These are the host-side (numpy) versions used by data adapters, decoding
and evaluation. Batched, jit-compatible jnp versions of the hot subset
live in `ursonet_tpu.se3jax` and are cross-checked against this module in
tests/test_se3.py.

All functions accept plain lists / 1-D arrays for single items and return
numpy arrays (never np.matrix).
"""

from __future__ import annotations

import numpy as np

_DEG = np.pi / 180.0


# ---------------------------------------------------------------------------
# Euler angles -> SO(3) / quaternion
# ---------------------------------------------------------------------------

def euler2SO3_unreal(pitch, yaw, roll):
    """Euler (deg) -> rotation matrix, Unreal-engine order (se3lib.py:8-21).

    Returns the transpose of the row-stacked Unreal basis, as the reference
    does.
    """
    cp, sp = np.cos(pitch * _DEG), np.sin(pitch * _DEG)
    cy, sy = np.cos(yaw * _DEG), np.sin(yaw * _DEG)
    cr, sr = np.cos(roll * _DEG), np.sin(roll * _DEG)
    R = np.array([
        [cp * cy, cp * sy, sp],
        [sr * sp * cy - cr * sy, sr * sp * sy + cr * cy, -sr * cp],
        [-(cr * sp * cy + sr * sy), cy * sr - cr * sp * sy, cr * cp],
    ])
    return R.T


def euler2SO3(pitch, yaw, roll):
    """Euler (deg) -> rotation matrix, XYZ order (se3lib.py:23-36)."""
    cp, sp = np.cos(pitch * _DEG), np.sin(pitch * _DEG)
    cy, sy = np.cos(yaw * _DEG), np.sin(yaw * _DEG)
    cr, sr = np.cos(roll * _DEG), np.sin(roll * _DEG)
    return np.array([
        [cy * cr, -sp * sy * cr - cp * sr, -cp * sy * cr + sp * sr],
        [cy * sr, -sp * sy * sr + cp * cr, -cp * sy * sr - sp * cr],
        [sy, sp * cy, cp * cy],
    ])


def euler2SO3_left(pitch, yaw, roll):
    """Euler (deg) -> rotation matrix, left-handed XYZ order (se3lib.py:38-51).

    This is the variant used throughout the reference for augmentation and
    Euler-regression decoding.
    """
    cp, sp = np.cos(pitch * _DEG), np.sin(pitch * _DEG)
    cy, sy = np.cos(yaw * _DEG), np.sin(yaw * _DEG)
    cr, sr = np.cos(roll * _DEG), np.sin(roll * _DEG)
    return np.array([
        [cy * cr, sp * sy * cr - cp * sr, cp * sy * cr + sp * sr],
        [cy * sr, sp * sy * sr + cp * cr, cp * sy * sr - sp * cr],
        [-sy, sp * cy, cp * cy],
    ])


def euler2quat(pitch, yaw, roll):
    """Euler (deg) -> scalar-last quaternion (se3lib.py:53-67).

    Accepts scalars or same-shape arrays; returns (..., 4).
    """
    pitch = np.asarray(pitch, dtype=np.float64)
    half = _DEG / 2.0
    cp, sp = np.cos(pitch * half), np.sin(pitch * half)
    cy, sy = np.cos(np.asarray(yaw) * half), np.sin(np.asarray(yaw) * half)
    cr, sr = np.cos(np.asarray(roll) * half), np.sin(np.asarray(roll) * half)
    q = np.stack([
        sy * sr * cp - cy * cr * sp,
        -sy * cr * cp - cy * sr * sp,
        -cy * sr * cp + sy * cr * sp,
        cy * cr * cp + sy * sr * sp,
    ], axis=-1)
    return q


def composeSE3(R, t):
    """Rotation matrix + translation -> 4x4 SE(3) matrix (se3lib.py:69-75)."""
    R = np.asarray(R, dtype=np.float64)
    t = np.asarray(t, dtype=np.float64).reshape(3)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


# ---------------------------------------------------------------------------
# SO(3) <-> quaternion
# ---------------------------------------------------------------------------

def SO32quat(R):
    """Rotation matrix -> scalar-last JPL quaternion (se3lib.py:77-115).

    Shepperd-style four-case selection matching the reference's branch
    ordering exactly.
    """
    R = np.asarray(R, dtype=np.float64)
    q = np.zeros(4)
    tr = R[0, 0] + R[1, 1] + R[2, 2]
    if tr > 0:
        Z = np.sqrt(tr + 1.0) * 2.0
        q[3] = 0.25 * Z
        q[0] = (R[1, 2] - R[2, 1]) / Z
        q[1] = (R[2, 0] - R[0, 2]) / Z
        q[2] = (R[0, 1] - R[1, 0]) / Z
    elif (R[0, 0] > R[1, 1]) and (R[0, 0] > R[2, 2]):
        Z = np.sqrt(1.0 + 2.0 * R[0, 0] - tr) * 2.0
        q[3] = (R[1, 2] - R[2, 1]) / Z
        q[0] = 0.25 * Z
        q[1] = (R[0, 1] + R[1, 0]) / Z
        q[2] = (R[0, 2] + R[2, 0]) / Z
    elif R[1, 1] > R[2, 2]:
        Z = np.sqrt(1.0 + 2.0 * R[1, 1] - tr) * 2.0
        q[3] = (R[2, 0] - R[0, 2]) / Z
        q[0] = (R[0, 1] + R[1, 0]) / Z
        q[1] = 0.25 * Z
        q[2] = (R[1, 2] + R[2, 1]) / Z
    else:
        Z = np.sqrt(1.0 + 2.0 * R[2, 2] - tr) * 2.0
        q[3] = (R[0, 1] - R[1, 0]) / Z
        q[0] = (R[0, 2] + R[2, 0]) / Z
        q[1] = (R[1, 2] + R[2, 1]) / Z
        q[2] = 0.25 * Z
    return q


def quat2SO3(q):
    """Scalar-last JPL quaternion -> rotation matrix (se3lib.py:136-144)."""
    q = np.asarray(q, dtype=np.float64).reshape(4)
    x, y, z, w = q
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * (x * y + z * w), 2 * (x * z - y * w)],
        [2 * (x * y - z * w), 1 - 2 * x * x - 2 * z * z, 2 * (y * z + x * w)],
        [2 * (x * z + y * w), 2 * (y * z - x * w), 1 - 2 * x * x - 2 * y * y],
    ])


def SO32euler(R):
    """Rotation matrix -> Euler (pitch, yaw, roll) in degrees (se3lib.py:117-133)."""
    R = np.asarray(R, dtype=np.float64)
    if R[2, 0] > 0.998:
        yaw = -np.pi / 2
        roll = 0.0
        pitch = np.arctan2(R[0, 1], R[0, 2])
    elif R[2, 0] < -0.998:
        yaw = np.pi / 2
        roll = 0.0
        pitch = np.arctan2(R[0, 1], R[0, 2])
    else:
        yaw = np.arcsin(-R[2, 0])
        pitch = np.arctan2(R[2, 1], R[2, 2])
        roll = np.arctan2(R[1, 0], R[0, 0])
    return pitch / _DEG, yaw / _DEG, roll / _DEG


# ---------------------------------------------------------------------------
# Quaternion <-> angle-axis, Euler
# ---------------------------------------------------------------------------

def quat2angleaxis(q):
    """Quaternion -> (axis, angle) (se3lib.py:146-157)."""
    q = np.asarray(q, dtype=np.float64).reshape(4)
    theta = 2.0 * np.arccos(np.clip(q[3], -1.0, 1.0))
    if abs(q[3]) >= 1.0:
        v = np.array([0.0, 0.0, 1.0])
    else:
        den = np.sin(theta / 2.0)
        v = q[:3] / den
    return v, theta


def angleaxis2quat(v, theta):
    """Angle-axis -> scalar-last quaternion (se3lib.py:159-162)."""
    v = np.asarray(v, dtype=np.float64).reshape(3)
    s = np.sin(theta / 2.0)
    return np.array([v[0] * s, v[1] * s, v[2] * s, np.cos(theta / 2.0)])


def quat_mult(a, b):
    """Quaternion product (JPL composition) with unit renormalisation
    (se3lib.py:164-179). `a`, `b` scalar-last; returns unit quaternion.
    """
    a = np.asarray(a, dtype=np.float64).reshape(4)
    b = np.asarray(b, dtype=np.float64).reshape(4)
    c = np.array([
        a[3] * b[0] + a[2] * b[1] - a[1] * b[2] + a[0] * b[3],
        -a[2] * b[0] + a[3] * b[1] + a[0] * b[2] + a[1] * b[3],
        a[1] * b[0] - a[0] * b[1] + a[3] * b[2] + a[2] * b[3],
        -a[0] * b[0] - a[1] * b[1] - a[2] * b[2] + a[3] * b[3],
    ])
    return c / np.linalg.norm(c)


def quat_inv(q):
    """Quaternion conjugate/inverse for unit quaternions (se3lib.py:181-183)."""
    q = np.asarray(q, dtype=np.float64).reshape(4)
    return np.array([-q[0], -q[1], -q[2], q[3]])


def quat2euler(q):
    """Scalar-last quaternion -> Euler (pitch, yaw, roll) degrees
    (se3lib.py:185-211) with the reference's pole-singularity handling.
    """
    q = np.asarray(q, dtype=np.float64).reshape(4)
    x, y, z, w = q
    sqx, sqy, sqz = x * x, y * y, z * z
    test = x * z + y * w
    if test > 0.499:  # north-pole singularity
        pitch = 2.0 * np.arctan2(x, w)
        yaw = -np.pi / 2
        roll = 0.0
    elif test < -0.499:  # south-pole singularity
        pitch = -2.0 * np.arctan2(x, w)
        yaw = np.pi / 2
        roll = 0.0
    else:
        pitch = np.arctan2(2 * (y * z - x * w), 1 - 2 * sqx - 2 * sqy)
        yaw = np.arcsin(np.clip(-2 * (x * z + y * w), -1.0, 1.0))
        roll = np.arctan2(2 * (x * y - z * w), 1 - 2 * sqy - 2 * sqz)

    if pitch > np.pi:
        pitch = 2 * np.pi - pitch
    if pitch < -np.pi:
        pitch = 2 * np.pi + pitch
    return pitch / _DEG, yaw / _DEG, roll / _DEG


def angle_between_quats(q1, q2):
    """Angular distance in degrees, 2*arccos(|<q1,q2>|) (se3lib.py:213-215).

    Broadcasts: q1 (..., 4) against q2 (..., 4) -> (q1_rows, q2_rows) when
    both are 2-D, matching the reference's matrix-product semantics.
    """
    q1 = np.atleast_2d(np.asarray(q1, dtype=np.float64))
    q2 = np.atleast_2d(np.asarray(q2, dtype=np.float64))
    dots = q1 @ q2.T
    return 2.0 * np.arccos(np.clip(np.abs(dots), 0.0, 1.0)) / _DEG


def quat_weighted_avg(Q, W):
    """Weighted quaternion average (Markley et al. 2007) (se3lib.py:217-260).

    Builds the 4x4 accumulator A = sum_i w_i q_i q_i^T and returns the
    eigenvector of its largest eigenvalue plus A^-1 as the ML uncertainty.
    Vectorised (no Python loop, unlike the reference).
    """
    Q = np.asarray(Q, dtype=np.float64)
    W = np.asarray(W, dtype=np.float64).reshape(-1)
    A = (Q * W[:, None]).T @ Q
    s, v = np.linalg.eigh(A)
    q_avg = v[:, -1]
    q_avg = q_avg / np.linalg.norm(q_avg)
    # pinv: A is rank-deficient when the weights concentrate on a single
    # bin (e.g. a sharply converged GMM responsibility) — the average is
    # still well-defined, only the uncertainty becomes degenerate.
    H_inv = np.linalg.pinv(A)
    return q_avg, H_inv


def rodrigues(x):
    """Angle-axis 3-vector -> rotation matrix via exponential map
    (se3lib.py:262-274)."""
    x = np.asarray(x, dtype=np.float64).reshape(3)
    theta = np.linalg.norm(x)
    if theta < np.finfo(np.float32).eps:
        return np.eye(3)
    e = x / theta
    e_skew = np.array([[0, -e[2], e[1]], [e[2], 0, -e[0]], [-e[1], e[0], 0]])
    return np.eye(3) + e_skew * np.sin(theta) + e_skew @ e_skew * (1 - np.cos(theta))


def pose_3Dto3D(P1, P2, t=None):
    """Closed-form 3D-3D pose from keypoint matches (Kabsch/SVD)
    (se3lib.py:277-318). P1, P2 are 3xN matrices of corresponding points.
    """
    P1 = np.asarray(P1, dtype=np.float64)
    P2 = np.asarray(P2, dtype=np.float64)
    if t is None:
        C1 = np.mean(P1, axis=1, keepdims=True)
        C2 = np.mean(P2, axis=1, keepdims=True)
        H = (P1 - C1) @ (P2 - C2).T
        U, S, Vh = np.linalg.svd(H)
        Aux = np.eye(3)
        Aux[-1, -1] = np.linalg.det(U) * np.linalg.det(Vh.T)
        R = U @ Aux @ Vh
        t = (C2 - R @ C1).reshape(3)
    else:
        C1 = P1[:, 2:3]
        C2 = np.asarray(t, dtype=np.float64).reshape(3, 1)
        P2_shifted = P2 - C2
        P2_shifted[:, 0] = P2_shifted[:, 0] / np.linalg.norm(P2_shifted[:, 0])
        P2_shifted[:, 1] = P2_shifted[:, 1] / np.linalg.norm(P2_shifted[:, 1])
        H = (P1 - C1) @ P2_shifted.T
        U, S, Vh = np.linalg.svd(H)
        Aux = np.eye(3)
        Aux[-1, -1] = np.linalg.det(U) * np.linalg.det(Vh.T)
        R = U @ Aux @ Vh
        t = np.asarray(t, dtype=np.float64).reshape(3)
    return t, R
