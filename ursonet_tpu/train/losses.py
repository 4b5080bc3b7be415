"""Loss functions, numerically matching the reference graphs
(net.py:705-762) including their quirks:

  * softmax_loss: softmax cross-entropy against *soft* PMF targets, applied
    to the head's ReLU-activated outputs used as logits (an odd but
    load-bearing detail — net.py:318,350,710).
  * one_minus_dot: 1 − |⟨q, q̂⟩| for quaternion regression (net.py:724-733).
  * rel_loss: ‖Y−Ŷ‖_F / ‖Y‖_F over the whole batch tensor — the reference's
    tf.norm((y_gt−y_pred)/tf.norm(y_gt)) computes Frobenius norms of the
    full [B,3] matrices, not per-row (net.py:750-762).
  * mse_loss: mean over all elements (net.py:735-748).
  * arcos: angular error loss (defined in the reference, unused in the
    build — net.py:713-722); provided for completeness.
  * l2_regularization: WEIGHT_DECAY · Σ‖w‖² / size(w) over trainable params
    excluding BatchNorm gamma/beta, matching the per-tensor size division
    (net.py:1008-1012).

All losses compute in float32 regardless of the activation dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_loss(y_gt, y_pred):
    """Soft-target softmax cross-entropy, mean over batch (net.py:705-711).

    Equivalent to tf.losses.softmax_cross_entropy(onehot_labels=y_gt,
    logits=y_pred) with soft labels.
    """
    y_gt = y_gt.astype(jnp.float32)
    logits = y_pred.astype(jnp.float32)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(y_gt * log_p, axis=-1)
    return jnp.mean(ce)


def one_minus_dot_loss(y_true, y_pred):
    """1 − |⟨y_true, y_pred⟩| mean over batch (net.py:724-733)."""
    d = jnp.sum(y_true.astype(jnp.float32) * y_pred.astype(jnp.float32),
                axis=-1, keepdims=True)
    return jnp.mean(1.0 - jnp.abs(d))


def arcos_loss(y_true, y_pred):
    """arccos|⟨y_true, y_pred⟩| mean over batch (net.py:713-722)."""
    d = jnp.sum(y_true.astype(jnp.float32) * y_pred.astype(jnp.float32),
                axis=-1, keepdims=True)
    return jnp.mean(jnp.arccos(jnp.clip(jnp.abs(d), 0.0, 1.0)))


def mse_loss(y_gt, y_pred):
    """Mean squared error over all elements (net.py:735-748)."""
    diff = y_gt.astype(jnp.float32) - y_pred.astype(jnp.float32)
    return jnp.mean(jnp.square(diff))


def rel_loss(y_gt, y_pred):
    """Frobenius-relative location loss (net.py:750-762): the norms run
    over the entire batch tensor, reproducing tf.norm semantics."""
    y_gt = y_gt.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    return jnp.linalg.norm((y_gt - y_pred) / jnp.linalg.norm(y_gt))


def _is_bn_param(path) -> bool:
    """True for BatchNorm scale/bias — the reference excludes params whose
    Keras name contains 'gamma'/'beta' (net.py:1011), i.e. exactly the BN
    affine params. Our BN params live under modules named '...bn...'
    ('bn_conv1', 'bn2a_branch2a', 'stage1_unit1_bn2', 'loc_bn_0') with leaf
    names scale/bias, always below a FrozenAwareBN submodule named 'bn'.
    """
    keys = [k.key if hasattr(k, 'key') else str(k) for k in path]
    if 'loss_log_vars' in keys:  # Kendall log-variances: never regularized
        return True
    return len(keys) >= 2 and keys[-2] == 'bn'


def l2_regularization(params, weight_decay: float, trainable=None):
    """Σ wd·‖w‖²/size(w) over non-BN *trainable* params (net.py:1008-1012).

    Note the reference's keras.regularizers.l2(wd) computes wd·Σw² and each
    term is divided by the tensor's element count — i.e. wd·mean(w²).
    `trainable` is an optional static bool tree (train/state.trainable_mask)
    — the reference regularizes model.trainable_weights only (net.py:1008).
    """
    leaves = jax.tree_util.tree_leaves_with_path(params)
    flags = (jax.tree_util.tree_leaves(trainable)
             if trainable is not None else [True] * len(leaves))
    total = jnp.asarray(0.0, jnp.float32)
    for (path, w), keep in zip(leaves, flags):
        if _is_bn_param(path) or not keep:
            continue
        w = w.astype(jnp.float32)
        total = total + weight_decay * jnp.mean(jnp.square(w))
    return total


def compute_losses(outputs, batch, config, log_vars=None):
    """Assemble the weighted loss dict for a batch (reference build +
    compile: net.py:656-669, 993-1000).

    outputs: model output dict; batch: dict with 'gt_loc', 'gt_ori' or
    'gt_loc','gt_k1','gt_k2'. Returns (total, dict-of-parts) where parts
    are the *unweighted* named losses (metrics parity, net.py:1019-1028).

    log_vars: optional dict of learnable log-variances sₖ (Kendall-style
    uncertainty weighting — the reference's experimental
    LEARNABLE_LOSS_WEIGHTS, net.py:648-654, 708-719):
    total = Σ exp(−sₖ)·wₖ·Lₖ + sₖ.
    """
    parts = {}
    if config.REGRESS_KEYPOINTS:
        parts['loc_loss'] = mse_loss(batch['gt_loc'], outputs['loc'])
        parts['k2_loss'] = mse_loss(batch['gt_k1'], outputs['k1'])
        parts['k3_loss'] = mse_loss(batch['gt_k2'], outputs['k2'])
    else:
        if config.REGRESS_LOC:
            parts['loc_loss'] = rel_loss(batch['gt_loc'], outputs['loc'])
        else:
            parts['loc_loss'] = softmax_loss(batch['gt_loc'], outputs['loc'])
        if config.REGRESS_ORI:
            parts['ori_loss'] = one_minus_dot_loss(batch['gt_ori'],
                                                   outputs['ori'])
        else:
            parts['ori_loss'] = softmax_loss(batch['gt_ori'], outputs['ori'])

    total = jnp.asarray(0.0, jnp.float32)
    for name, value in parts.items():
        w = config.LOSS_WEIGHTS.get(name, 1.0)
        if log_vars is not None and name in log_vars:
            s = log_vars[name].astype(jnp.float32)
            total = total + jnp.exp(-s) * w * value + s
        else:
            total = total + value * w
    return total, parts
