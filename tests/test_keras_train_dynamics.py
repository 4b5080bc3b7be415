"""Training-dynamics gate vs a REAL Keras/TensorFlow reference stack.

test_keras_golden.py gates the *forward* against real Keras; this module
gates the *training dynamics* — the strongest parity claim available in a
zero-egress environment. Both stacks start from the SAME weights (the
Keras init exported through the h5 bridge), consume the SAME synthetic
batch stream, and train with the reference's compile semantics
(/root/reference/net.py:973-1028):

  * SGD momentum 0.9 with gradient clipping at GRADIENT_CLIP_NORM=5.0 —
    the reference's Keras-2 `clipnorm` computed the GLOBAL norm across
    all gradients (keras/optimizers.py get_gradients), so the TF twin
    uses `global_clipnorm` and ours uses optax.clip_by_global_norm;
  * Keras momentum placement: v ← m·v − lr·g ; w ← w + v;
  * loss = Σ LOSS_WEIGHTS[k]·mean(L_k) + Σ wd·‖w‖²/size(w) over
    trainable weights excluding BN gamma/beta (net.py:993-1012);
  * frozen BatchNorm (TRAIN_BN=False — inference stats both sides).

The TF twin trains with tf.GradientTape + tf.keras.optimizers.SGD (real
Keras autodiff/optimizer, loss assembled exactly as compile() does); our
side trains through the production train step (train/step.make_train_step
+ train/optim.make_optimizer) — no test-only re-implementation on either
side. Loss trajectories are asserted to track step-by-step.

Tolerances: both stacks run float32 on CPU; residual divergence is op-
ordering noise (~1e-7/step) amplified by the training dynamics. On these
recipes the measured agreement is ~1e-6 early and stays <1e-3 at 200
steps; the asserts leave ~10x headroom (1e-3 for the first 50 steps,
1e-2 thereafter, 1e-2 on the final held-out eval loss).
"""

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

import jax  # noqa: E402
import flax.linen as nn  # noqa: E402

from ursonet_tpu.checkpoint.h5_import import load_keras_h5  # noqa: E402
from ursonet_tpu.models.ursonet import build_model  # noqa: E402
from ursonet_tpu.train.optim import make_optimizer  # noqa: E402
from ursonet_tpu.train.state import TrainState  # noqa: E402
from ursonet_tpu.train.step import make_eval_step, make_train_step  # noqa: E402

from tests.test_keras_golden import (  # noqa: E402
    H, W, build_reference_keras, export_keras2_h5, make_config,
    randomize_weights)

pytestmark = pytest.mark.slow

BATCH = 4
N_BATCHES = 4  # distinct batches, cycled — a deterministic "epoch"


def make_stream(cfg, seed):
    """Identical synthetic batch stream for both stacks."""
    rng = np.random.RandomState(seed)
    batches = []
    for _ in range(N_BATCHES):
        b = {'images': rng.uniform(-120, 120,
                                   (BATCH, H, W, 3)).astype(np.float32)}
        if cfg.REGRESS_LOC:
            loc = rng.normal(0, 1, (BATCH, 3)).astype(np.float32)
            b['gt_loc'] = loc * 10.0 / np.linalg.norm(loc, axis=1,
                                                      keepdims=True)
        else:
            p = rng.uniform(0, 1, (BATCH, cfg.LOC_BINS_PER_DIM ** 3))
            b['gt_loc'] = (p / p.sum(1, keepdims=True)).astype(np.float32)
        if cfg.REGRESS_ORI:
            q = rng.normal(0, 1, (BATCH, 4)).astype(np.float32)
            b['gt_ori'] = q / np.linalg.norm(q, axis=1, keepdims=True)
        else:
            p = rng.uniform(0, 1, (BATCH, cfg.ORI_BINS_PER_DIM ** 3))
            b['gt_ori'] = (p / p.sum(1, keepdims=True)).astype(np.float32)
        batches.append(b)
    return batches


# --- the reference training semantics in real TF --------------------------

def tf_losses(cfg, outs, batch):
    loc, ori = outs
    parts = {}
    if cfg.REGRESS_LOC:
        # rel_loss_graph (net.py:750-762): Frobenius norms over the batch
        gt = tf.constant(batch['gt_loc'])
        parts['loc_loss'] = tf.norm((gt - loc) / tf.norm(gt))
    else:
        parts['loc_loss'] = tf.reduce_mean(
            tf.nn.softmax_cross_entropy_with_logits(
                labels=tf.constant(batch['gt_loc']), logits=loc))
    if cfg.REGRESS_ORI:
        d = tf.reduce_sum(tf.constant(batch['gt_ori']) * ori, axis=-1)
        parts['ori_loss'] = tf.reduce_mean(1.0 - tf.abs(d))
    else:
        parts['ori_loss'] = tf.reduce_mean(
            tf.nn.softmax_cross_entropy_with_logits(
                labels=tf.constant(batch['gt_ori']), logits=ori))
    total = tf.add_n([tf.cast(v, tf.float32) * cfg.LOSS_WEIGHTS.get(k, 1.0)
                      for k, v in parts.items()])
    return total, parts


def tf_l2_reg(model, weight_decay):
    """net.py:1008-1012: wd·Σw²/size over trainable weights, skipping BN
    gamma/beta by name."""
    terms = []
    for w in model.trainable_weights:
        name = w.name if hasattr(w, 'name') else w.path
        if 'gamma' in name or 'beta' in name:
            continue
        terms.append(weight_decay * tf.reduce_sum(tf.square(w))
                     / tf.cast(tf.size(w), tf.float32))
    return tf.add_n(terms)


def train_tf(cfg, keras_model, stream, steps, lr):
    opt = tf.keras.optimizers.SGD(learning_rate=lr,
                                  momentum=cfg.LEARNING_MOMENTUM,
                                  global_clipnorm=cfg.GRADIENT_CLIP_NORM)
    losses = []
    for i in range(steps):
        batch = stream[i % N_BATCHES]
        with tf.GradientTape() as tape:
            outs = keras_model(tf.constant(batch['images']), training=False)
            total, _ = tf_losses(cfg, outs, batch)
            total = total + tf_l2_reg(keras_model, cfg.WEIGHT_DECAY)
        grads = tape.gradient(total, keras_model.trainable_variables)
        opt.apply_gradients(zip(grads, keras_model.trainable_variables))
        losses.append(float(total))
    return np.array(losses)


def eval_tf(cfg, keras_model, batch):
    outs = keras_model(tf.constant(batch['images']), training=False)
    total, _ = tf_losses(cfg, outs, batch)
    return float(total)


# --- our production train step --------------------------------------------

def train_ours(cfg, params, stats, stream, steps):
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    state = TrainState(step=0, params=params, batch_stats=stats,
                       opt_state=tx.init(params))
    step_fn = make_train_step(model, cfg, tx, jit=True)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(steps):
        batch = {k: np.asarray(v) for k, v in stream[i % N_BATCHES].items()}
        state, metrics = step_fn(state, batch, key)
        # metrics['loss'] is the full training objective incl. l2_reg
        losses.append(float(metrics['loss']))
    return np.array(losses), state


def eval_ours(cfg, state, batch):
    model = build_model(cfg)
    ev = make_eval_step(model, cfg, jit=True)
    metrics = ev(state, {k: np.asarray(v) for k, v in batch.items()},
                 jax.random.PRNGKey(1))
    return float(metrics['loss'])


# --- the gate ---------------------------------------------------------------

def run_gate(cfg, seed, steps, lr):
    cfg.LEARNING_RATE = lr
    keras_model = build_reference_keras(cfg)
    randomize_weights(keras_model, seed)

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 'init.h5')
        export_keras2_h5(keras_model, path)
        model = build_model(cfg)
        variables = nn.unbox(model.init(
            jax.random.PRNGKey(7), np.zeros((1, H, W, 3), np.float32),
            training=False))
        params, stats, report = load_keras_h5(
            path, variables['params'], variables['batch_stats'])
    assert not report['mismatched'] and not report['unmatched']

    stream = make_stream(cfg, seed + 100)
    held_out = make_stream(cfg, seed + 200)[0]

    ours, state = train_ours(cfg, params, stats, stream, steps)
    theirs = train_tf(cfg, keras_model, stream, steps, lr)

    rel = np.abs(ours - theirs) / np.maximum(np.abs(theirs), 1e-6)
    # step-by-step trajectory agreement (early steps are the sharpest
    # test of optimizer semantics: any lr/momentum/clip mismatch shows
    # up immediately and grows monotonically)
    assert rel[:50].max() <= 1e-3, (
        f'early trajectory diverged: max rel {rel[:50].max():.2e} '
        f'at step {rel[:50].argmax()}')
    assert rel.max() <= 1e-2, (
        f'trajectory diverged: max rel {rel.max():.2e} '
        f'at step {rel.argmax()}')
    # both stacks must actually have TRAINED (not agree-by-standstill)
    assert theirs[-1] < 0.7 * theirs[0], (
        f'reference stack did not train: {theirs[0]:.4f} -> {theirs[-1]:.4f}')

    # final held-out eval agreement
    e_ours = eval_ours(cfg, state, held_out)
    e_tf = eval_tf(cfg, keras_model, held_out)
    assert abs(e_ours - e_tf) / max(abs(e_tf), 1e-6) <= 1e-2, (
        f'final eval mismatch: ours {e_ours:.6f} vs keras {e_tf:.6f}')
    return rel, e_ours, e_tf


def test_train_dynamics_sgd_regression():
    """200 steps, quaternion+loc regression, resnet18 — SGD momentum,
    global-norm clip, per-size L2, rel/one-minus-dot losses."""
    cfg = make_config(BACKBONE='resnet18', REGRESS_LOC=True,
                      REGRESS_ORI=True, ORIENTATION_PARAM='quaternion')
    run_gate(cfg, seed=11, steps=200, lr=1e-3)


def test_train_dynamics_sgd_classification():
    """120 steps, soft-PMF classification heads (the flagship mode) —
    exercises the softmax-on-ReLU-logits quirk under training."""
    cfg = make_config(BACKBONE='resnet18', REGRESS_LOC=False,
                      REGRESS_ORI=False, LOC_BINS_PER_DIM=4,
                      ORI_BINS_PER_DIM=4)
    run_gate(cfg, seed=12, steps=120, lr=1e-3)
