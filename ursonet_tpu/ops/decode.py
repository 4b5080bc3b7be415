"""Pose decoding: network head outputs -> (location, quaternion).

Re-designs the reference decode path (pose_estimator.py:376-409, repeated
at 239-315 and 487-527) as batched, jit-compiled array ops:

  * classification heads: stable softmax over bins (utils.py:26-28), then
    - location  = PMF first moment × histogram_3D_map (pose_estimator.py:383)
    - orientation = weighted quaternion average over the bin quaternion map
      (pose_estimator.py:409 → se3lib.quat_weighted_avg) — computed with
      power iteration on the 4×4 accumulator for throughput, with an eigh
      fallback.
  * regression heads: quaternion passthrough (already L2-normalized by the
    model), euler→SO3→quat, angle-axis norm/axis split
    (pose_estimator.py:393-403).

Everything operates on batches [B, ...] and is jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

from ursonet_tpu import se3jax


def stable_softmax(x, axis=-1):
    """Numerically-stable softmax (reference utils.py:26-28), batched."""
    e = jnp.exp(x - jnp.max(x, axis=axis, keepdims=True))
    return e / jnp.sum(e, axis=axis, keepdims=True)


def decode_loc_pmf(loc_logits, histogram_3d_map):
    """Location from a classification head: softmax first moment
    (pose_estimator.py:380-383). loc_logits [B, bins³] -> [B, 3]."""
    pmf = stable_softmax(loc_logits.astype(jnp.float32))
    return pmf @ jnp.asarray(histogram_3d_map, dtype=jnp.float32)


def decode_loc_encoded(pmf, histogram_3d_map):
    """First moment of an already-normalized PMF (used for the GT
    quantization-error metrics, pose_estimator.py:386)."""
    return jnp.asarray(pmf, jnp.float32) @ jnp.asarray(histogram_3d_map,
                                                       jnp.float32)


def decode_ori_pmf(ori_logits, ori_histogram_map, power_iters: int = 50,
                   use_eigh: bool = False):
    """Orientation from a classification head: softmax, then weighted
    quaternion average over the bin map (pose_estimator.py:406-409).
    ori_logits [B, bins³] -> unit quaternions [B, 4]."""
    pmf = stable_softmax(ori_logits.astype(jnp.float32))
    return decode_ori_encoded(pmf, ori_histogram_map, power_iters, use_eigh)


def decode_ori_encoded(pmf, ori_histogram_map, power_iters: int = 50,
                       use_eigh: bool = False):
    """Weighted quaternion average of a normalized PMF (also used for the
    GT encoding-error metrics, pose_estimator.py:429)."""
    Q = jnp.asarray(ori_histogram_map, dtype=jnp.float32)
    Q = jnp.broadcast_to(Q, pmf.shape[:-1] + Q.shape)
    if use_eigh:
        q, _ = se3jax.quat_weighted_avg(Q, pmf)
        return q
    return se3jax.quat_weighted_avg_power(Q, pmf, iters=power_iters)


def decode_ori_regression(ori_out, orientation_param: str):
    """Orientation from a regression head (pose_estimator.py:393-403).
    ori_out [B, 4] (quaternion) or [B, 3] (euler_angles / angle_axis)."""
    ori_out = ori_out.astype(jnp.float32)
    if orientation_param == 'quaternion':
        return ori_out / jnp.linalg.norm(ori_out, axis=-1, keepdims=True)
    if orientation_param == 'euler_angles':
        R = se3jax.euler2SO3_left(ori_out[..., 0], ori_out[..., 1],
                                  ori_out[..., 2])
        return se3jax.SO32quat(R)
    if orientation_param == 'angle_axis':
        theta = jnp.linalg.norm(ori_out, axis=-1, keepdims=True)
        v = jnp.where(theta < 1e-6, jnp.zeros_like(ori_out), ori_out / theta)
        s = jnp.sin(theta / 2.0)
        return jnp.concatenate([v * s, jnp.cos(theta / 2.0)], axis=-1)
    raise ValueError(f"unknown orientation param {orientation_param}")


# ---------------------------------------------------------------------------
# Error metrics (batched)
# ---------------------------------------------------------------------------

def angular_error_deg(q_est, q_gt):
    """2·arccos|⟨q,q̂⟩| in degrees (pose_estimator.py:434)."""
    d = jnp.abs(jnp.sum(q_est * q_gt, axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(d, 0.0, 1.0)) * 180.0 / jnp.pi


def location_error(loc_est, loc_gt):
    """L2 location error (pose_estimator.py:438)."""
    return jnp.linalg.norm(loc_est - loc_gt, axis=-1)


def esa_score(loc_est, loc_gt, q_est, q_gt):
    """ESA challenge score: ‖t−t̂‖/‖t‖ + 2·arccos|⟨q,q̂⟩| in radians
    (pose_estimator.py:445)."""
    rel = location_error(loc_est, loc_gt) / jnp.linalg.norm(loc_gt, axis=-1)
    ang = jnp.abs(jnp.sum(q_est * q_gt, axis=-1))
    return rel + 2.0 * jnp.arccos(jnp.clip(ang, 0.0, 1.0))
