"""Batched, jit-safe (branchless) JAX versions of the SE(3) math.

Same conventions as `ursonet_tpu.se3` (scalar-last JPL quaternions, Euler
pitch/yaw/roll in degrees, left-handed XYZ order — reference se3lib.py).
Every function here takes arrays with arbitrary leading batch dimensions
and is safe to call under jit / vmap / shard_map: all reference branches
(Shepperd case selection, pole singularities) are replaced with
`jnp.where` selection.

Cross-checked against the numpy module in tests/test_se3.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DEG = jnp.pi / 180.0


def euler2quat(pitch, yaw, roll):
    """Euler (deg) -> scalar-last quaternion, batched (se3lib.py:53-67)."""
    half = _DEG / 2.0
    cp, sp = jnp.cos(pitch * half), jnp.sin(pitch * half)
    cy, sy = jnp.cos(yaw * half), jnp.sin(yaw * half)
    cr, sr = jnp.cos(roll * half), jnp.sin(roll * half)
    return jnp.stack([
        sy * sr * cp - cy * cr * sp,
        -sy * cr * cp - cy * sr * sp,
        -cy * sr * cp + sy * cr * sp,
        cy * cr * cp + sy * sr * sp,
    ], axis=-1)


def euler2SO3_left(pitch, yaw, roll):
    """Euler (deg) -> rotation matrix, left-handed XYZ order, batched
    (se3lib.py:38-51). Returns (..., 3, 3)."""
    cp, sp = jnp.cos(pitch * _DEG), jnp.sin(pitch * _DEG)
    cy, sy = jnp.cos(yaw * _DEG), jnp.sin(yaw * _DEG)
    cr, sr = jnp.cos(roll * _DEG), jnp.sin(roll * _DEG)
    rows = [
        jnp.stack([cy * cr, sp * sy * cr - cp * sr, cp * sy * cr + sp * sr], -1),
        jnp.stack([cy * sr, sp * sy * sr + cp * cr, cp * sy * sr - sp * cr], -1),
        jnp.stack([-sy, sp * cy, cp * cy], -1),
    ]
    return jnp.stack(rows, axis=-2)


def SO32quat(R):
    """Rotation matrix -> scalar-last JPL quaternion, batched & branchless
    (se3lib.py:77-115). R: (..., 3, 3) -> (..., 4)."""
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = r00 + r11 + r22

    def pack(q0, q1, q2, q3):
        return jnp.stack([q0, q1, q2, q3], axis=-1)

    # Case w: trace positive
    Zw = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2.0
    qw = pack((r12 - r21) / Zw, (r20 - r02) / Zw, (r01 - r10) / Zw, 0.25 * Zw)
    # Case x
    Zx = jnp.sqrt(jnp.maximum(1.0 + 2.0 * r00 - tr, 1e-12)) * 2.0
    qx = pack(0.25 * Zx, (r01 + r10) / Zx, (r02 + r20) / Zx, (r12 - r21) / Zx)
    # Case y
    Zy = jnp.sqrt(jnp.maximum(1.0 + 2.0 * r11 - tr, 1e-12)) * 2.0
    qy = pack((r01 + r10) / Zy, 0.25 * Zy, (r12 + r21) / Zy, (r20 - r02) / Zy)
    # Case z
    Zz = jnp.sqrt(jnp.maximum(1.0 + 2.0 * r22 - tr, 1e-12)) * 2.0
    qz = pack((r02 + r20) / Zz, (r12 + r21) / Zz, 0.25 * Zz, (r01 - r10) / Zz)

    cond_w = (tr > 0)[..., None]
    cond_x = ((r00 > r11) & (r00 > r22))[..., None]
    cond_y = (r11 > r22)[..., None]
    return jnp.where(cond_w, qw, jnp.where(cond_x, qx, jnp.where(cond_y, qy, qz)))


def quat2SO3(q):
    """Scalar-last quaternion -> rotation matrix, batched (se3lib.py:136-144)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = [
        jnp.stack([1 - 2 * y * y - 2 * z * z, 2 * (x * y + z * w), 2 * (x * z - y * w)], -1),
        jnp.stack([2 * (x * y - z * w), 1 - 2 * x * x - 2 * z * z, 2 * (y * z + x * w)], -1),
        jnp.stack([2 * (x * z + y * w), 2 * (y * z - x * w), 1 - 2 * x * x - 2 * y * y], -1),
    ]
    return jnp.stack(rows, axis=-2)


def quat_mult(a, b):
    """Quaternion product with renormalisation, batched (se3lib.py:164-179)."""
    a0, a1, a2, a3 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    b0, b1, b2, b3 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    c = jnp.stack([
        a3 * b0 + a2 * b1 - a1 * b2 + a0 * b3,
        -a2 * b0 + a3 * b1 + a0 * b2 + a1 * b3,
        a1 * b0 - a0 * b1 + a3 * b2 + a2 * b3,
        -a0 * b0 - a1 * b1 - a2 * b2 + a3 * b3,
    ], axis=-1)
    return c / jnp.linalg.norm(c, axis=-1, keepdims=True)


def quat_inv(q):
    """Conjugate of unit quaternion, batched (se3lib.py:181-183)."""
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat2euler(q):
    """Scalar-last quaternion -> Euler (pitch, yaw, roll) degrees, batched
    & branchless (se3lib.py:185-211)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sqx, sqy, sqz = x * x, y * y, z * z
    test = x * z + y * w

    pitch_n = jnp.arctan2(2 * (y * z - x * w), 1 - 2 * sqx - 2 * sqy)
    yaw_n = jnp.arcsin(jnp.clip(-2 * (x * z + y * w), -1.0, 1.0))
    roll_n = jnp.arctan2(2 * (x * y - z * w), 1 - 2 * sqy - 2 * sqz)

    pitch_pole = 2.0 * jnp.arctan2(x, w)
    north = test > 0.499
    south = test < -0.499
    pole = north | south

    pitch = jnp.where(pole, jnp.where(north, pitch_pole, -pitch_pole), pitch_n)
    yaw = jnp.where(pole, jnp.where(north, -jnp.pi / 2, jnp.pi / 2), yaw_n)
    roll = jnp.where(pole, 0.0, roll_n)

    pitch = jnp.where(pitch > jnp.pi, 2 * jnp.pi - pitch, pitch)
    pitch = jnp.where(pitch < -jnp.pi, 2 * jnp.pi + pitch, pitch)
    return jnp.stack([pitch / _DEG, yaw / _DEG, roll / _DEG], axis=-1)


def angle_between_quats(q1, q2):
    """Angular distance in degrees along the last axis, batched
    (se3lib.py:213-215)."""
    dots = jnp.sum(q1 * q2, axis=-1)
    return 2.0 * jnp.arccos(jnp.clip(jnp.abs(dots), 0.0, 1.0)) / _DEG


def quat_weighted_avg(Q, W):
    """Weighted quaternion average via eigen-decomposition of the 4x4
    accumulator (se3lib.py:217-260), batched.

    Q: (..., n, 4), W: (..., n) -> (q_avg (..., 4), A (..., 4, 4)).
    Returns the accumulator A instead of its inverse (the reference returns
    A^-1 as uncertainty; invert outside if needed).
    """
    A = jnp.einsum('...ni,...n,...nj->...ij', Q, W, Q)
    _, v = jnp.linalg.eigh(A)
    q_avg = v[..., :, -1]
    q_avg = q_avg / jnp.linalg.norm(q_avg, axis=-1, keepdims=True)
    return q_avg, A


def quat_weighted_avg_power(Q, W, iters: int = 30):
    """Weighted quaternion average via power iteration.

    With non-negative weights (a PMF), A = Σ w_i q_i q_iᵀ is PSD, so power
    iteration converges to the dominant eigenvector — the same solution as
    `quat_weighted_avg`'s eigh, without a 4x4 eigendecomposition per sample.
    Used for high-throughput batched decode (SURVEY.md §7 "hard parts").
    Convergence rate is (λ2/λ1)^iters; for the peaked PMFs produced by a
    trained model the gap is large and 30 iterations are ample.
    Q: (..., n, 4), W: (..., n) -> (..., 4).
    """
    A = jnp.einsum('...ni,...n,...nj->...ij', Q, W, Q)
    v = jnp.ones(A.shape[:-1], dtype=A.dtype)

    def body(_, v):
        v = jnp.einsum('...ij,...j->...i', A, v)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    return jax.lax.fori_loop(0, iters, body, v)
