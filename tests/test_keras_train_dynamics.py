"""Training-dynamics gate vs a REAL Keras/TensorFlow reference stack.

test_keras_golden.py gates the *forward* against real Keras; this module
gates the *training dynamics* — the strongest parity claim available in a
zero-egress environment. Both stacks consume the SAME synthetic batch
stream and train with the reference's compile semantics
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
side.

Tolerance design — why the gate compares UPDATES from re-synced states,
not free-running loss trajectories: both stacks run float32 on CPU, so
per-step op-ordering noise is ~1e-7 relative, but deep-ResNet SGD is
chaotic (ReLU boundary flips; the clipped update has FIXED norm lr·5.0,
so direction perturbations never damp), and the measured amplification
on these recipes is ~×10–80 per step: two stacks that agree to 1e-6 for
the first ~8 steps drift to percent level by step ~12 and O(1) by step
~30 — with PROVABLY identical update semantics (the same divergence
occurs between two runs of the same stack with perturbed summation
order). No tolerance on a free 200-step trajectory can distinguish a
semantics bug from that chaos, so the gate is:

  phase A (exact): every chunk re-syncs our params from the live TF
    weights through the h5 bridge (fresh momentum both sides), runs
    K lockstep steps (K=1: plain clipped-SGD semantics; K=2: the
    momentum term engages), re-exports the TF weights, and compares
    parameter trees in UPDATE units: ‖w_ours − w_tf‖ / ‖w_tf − w_0‖,
    both norms over the whole tree. Measured noise floor ≤1.3e-4 (the
    per-tensor version of the metric is ill-conditioned — BN tensors
    with near-zero updates show noise/upd up to 2e-2 — so the global
    norm, dominated by the tensors that actually move, is the
    instrument); the bound is max(3e-3 for K=1 / 6e-3 for K=2, 20× an
    IN-SITU noise baseline: the same K steps replayed on our stack from
    1e-7-jittered weights — at trained classification weights the
    ReLU-logit heads sit near their boundaries and two float32
    implementations legitimately disagree by ~1e-3–1e-2 in gradient
    direction, which the baseline measures rather than hard-codes) while
    any lr/momentum/clip/L2 mismatch lands ≥10%. The synced-state
    forward loss must also match to 1e-4 (measured ≤6e-6). Chunks are
    separated
    by TF-only training so later chunks gate progressively trained
    weights — clipping is ACTIVE throughout (global grad norm 500–1200
    vs clip 5.0 on these recipes).
  phase B (envelope): from the final synced state both stacks train
    independently; both must actually learn (final < 0.7×initial) and
    land within 50% of each other — a deliberately loose bound that the
    measured chaos satisfies while catching gross dynamics divergence.

(The per-size L2 BN-exclusion itself is separately unit-tested in
tests/test_losses_optim.py; its per-tensor effect on BN updates is below
this gate's noise floor by construction.)
"""

import os
import tempfile

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

import jax  # noqa: E402
import flax.linen as nn  # noqa: E402

from ursonet_tpu.checkpoint.h5_import import load_keras_h5  # noqa: E402
from ursonet_tpu.models.ursonet import build_model  # noqa: E402
from ursonet_tpu.train.optim import make_optimizer  # noqa: E402
from ursonet_tpu.train.state import TrainState  # noqa: E402
from ursonet_tpu.train.step import make_train_step  # noqa: E402

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


def tf_step(cfg, keras_model, opt, batch):
    """One reference train step (compile semantics); returns the loss."""
    with tf.GradientTape() as tape:
        outs = keras_model(tf.constant(batch['images']), training=False)
        total, _ = tf_losses(cfg, outs, batch)
        total = total + tf_l2_reg(keras_model, cfg.WEIGHT_DECAY)
    grads = tape.gradient(total, keras_model.trainable_variables)
    opt.apply_gradients(zip(grads, keras_model.trainable_variables))
    return float(total)


def fresh_tf_opt(cfg, lr):
    return tf.keras.optimizers.SGD(learning_rate=lr,
                                   momentum=cfg.LEARNING_MOMENTUM,
                                   global_clipnorm=cfg.GRADIENT_CLIP_NORM)


def eval_tf(cfg, keras_model, batch):
    outs = keras_model(tf.constant(batch['images']), training=False)
    total, _ = tf_losses(cfg, outs, batch)
    return float(total)


# --- bridging the live TF weights into our production stack ----------------

def import_tf_weights(keras_model, model):
    """Export the CURRENT TF weights through the production h5 bridge."""
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 'sync.h5')
        export_keras2_h5(keras_model, path)
        variables = nn.unbox(model.init(
            jax.random.PRNGKey(7), np.zeros((1, H, W, 3), np.float32),
            training=False))
        params, stats, report = load_keras_h5(
            path, variables['params'], variables['batch_stats'])
    assert not report['mismatched'] and not report['unmatched']
    return params, stats


# --- the gate ---------------------------------------------------------------

def _tree_flat(tree):
    kz = jax.tree_util.keystr
    return {kz(p): np.asarray(v)
            for p, v in jax.tree_util.tree_leaves_with_path(tree)}


def run_gate(cfg, seed, lr, chunks=6, advance_steps=8, free_steps=60):
    cfg.LEARNING_RATE = lr
    keras_model = build_reference_keras(cfg)
    randomize_weights(keras_model, seed)

    model = build_model(cfg)
    tx = make_optimizer(cfg)
    step_fn = make_train_step(model, cfg, tx, jit=True)  # compiled once
    key = jax.random.PRNGKey(0)
    stream = make_stream(cfg, seed + 100)
    held_out = make_stream(cfg, seed + 200)[0]

    def our_state():
        params, stats = import_tf_weights(keras_model, model)
        return TrainState(step=0, params=params, batch_stats=stats,
                          opt_state=tx.init(params))

    # phase B first (from the random init, where a working optimizer
    # provably makes large progress): both stacks free-run on the same
    # stream; each must actually train, and the time-averaged final
    # losses must agree. Time-averaging (last 20 steps) is the stable
    # functional here: clipped SGD takes FIXED-norm steps (lr·5.0), so
    # per-step losses bounce and two chaotic trajectories peak-disagree
    # transiently even with identical semantics.
    state = our_state()
    opt = fresh_tf_opt(cfg, lr)
    tf_tr, our_tr = [], []
    for i in range(free_steps):
        batch = stream[i % N_BATCHES]
        tf_tr.append(tf_step(cfg, keras_model, opt, batch))
        state, metrics = step_fn(
            state, {k: np.asarray(v) for k, v in batch.items()}, key)
        our_tr.append(float(metrics['loss']))
    tf_end = float(np.mean(tf_tr[-20:]))
    our_end = float(np.mean(our_tr[-20:]))
    assert tf_end < 0.7 * tf_tr[0], (
        f'reference stack did not train: {tf_tr[0]:.4f} -> {tf_end:.4f}')
    assert our_end < 0.7 * our_tr[0], (
        f'our stack did not train: {our_tr[0]:.4f} -> {our_end:.4f}')
    env = abs(our_end - tf_end) / max(abs(tf_end), 1e-6)
    assert env <= 0.4, (
        f'free-running losses left the chaos envelope: ours {our_end:.4f}'
        f' vs keras {tf_end:.4f} (rel {env:.2f})')

    # phase A: re-synced K-step update parity at progressively trained
    # weights (K alternates 1/2: plain clipped step, then momentum
    # engaged); the TF stack arrives here 'free_steps' trained
    t = 0
    for c in range(chunks):
        K = 1 if c % 2 == 0 else 2
        params0, stats0 = import_tf_weights(keras_model, model)
        w0 = _tree_flat(params0)
        batches = [
            {k: np.asarray(v)
             for k, v in stream[(t + i) % N_BATCHES].items()}
            for i in range(K)]

        def run_ours(params_init):
            st = TrainState(step=0, params=params_init, batch_stats=stats0,
                            opt_state=tx.init(params_init))
            first = None
            for b in batches:
                st, m = step_fn(st, b, key)
                first = float(m['loss']) if first is None else first
            return st, first

        state, loss0_ours = run_ours(params0)
        # in-situ noise baseline: the SAME K steps from 1e-7-jittered
        # weights measure this recipe's gradient-direction conditioning
        # (at trained weights the ReLU-logit heads sit near boundaries,
        # so two float32 implementations legitimately disagree by the
        # same amount two jittered runs of ONE implementation do)
        jittered = jax.tree_util.tree_map(
            lambda a: (np.asarray(a) * (1 + 1e-7)).astype(np.float32),
            params0)
        state_j, _ = run_ours(jittered)

        opt = fresh_tf_opt(cfg, lr)  # fresh momentum on BOTH sides
        loss0_tf = None
        for b in batches:
            lt = tf_step(cfg, keras_model, opt, b)
            loss0_tf = lt if loss0_tf is None else loss0_tf
            t += 1
        rel0 = abs(loss0_ours - loss0_tf) / max(abs(loss0_tf), 1e-6)
        assert rel0 <= 1e-4, (
            f'synced-state loss diverged (chunk {c}): rel {rel0:.2e} '
            f'— forward or loss semantics mismatch')

        w_tf = _tree_flat(import_tf_weights(keras_model, model)[0])
        w_ours = _tree_flat(state.params)
        w_j = _tree_flat(state_j.params)

        def _rel(wa, wb):
            diff_sq = sum(float(np.sum((wa[k] - wb[k]) ** 2)) for k in w0)
            upd_sq = sum(float(np.sum((w_tf[k] - w0[k]) ** 2)) for k in w0)
            return (diff_sq / max(upd_sq, 1e-30)) ** 0.5

        upd_rel = _rel(w_ours, w_tf)
        noise = _rel(w_j, w_ours)
        bound = max(3e-3 if K == 1 else 6e-3, 20.0 * noise)
        assert upd_rel <= bound, (
            f'update semantics diverged (chunk {c}, K={K}): global '
            f'update-rel {upd_rel:.2e} > {bound:.2e} (in-situ noise '
            f'baseline {noise:.2e}) — check lr/momentum/global clip/L2 '
            f'wiring')
        # advance the TF stack alone so the next chunk gates at new weights
        for _ in range(advance_steps):
            tf_step(cfg, keras_model, opt, stream[t % N_BATCHES])
            t += 1

    # final held-out forward parity at the last synced state (uses the
    # eval semantics, not the train step)
    state = our_state()
    e_tf = eval_tf(cfg, keras_model, held_out)
    out = model.apply({'params': state.params,
                       'batch_stats': state.batch_stats},
                      held_out['images'], training=False)
    import tensorflow as _tf  # noqa: F401 (tf already imported)
    t_loss, _ = tf_losses(cfg, [np.asarray(v) for v in out]
                          if isinstance(out, (list, tuple)) else
                          [np.asarray(out['loc']), np.asarray(out['ori'])],
                          held_out)
    rel_eval = abs(float(t_loss) - e_tf) / max(abs(e_tf), 1e-6)
    assert rel_eval <= 1e-4, (
        f'held-out loss mismatch at synced weights: rel {rel_eval:.2e}')
    return env


def test_train_dynamics_sgd_regression():
    """Quaternion+loc regression, resnet18 — SGD momentum, global-norm
    clip (active: grad norm ~1000 vs 5.0), per-size L2, rel/one-minus-dot
    losses; 6 resynced K=1/K=2 parity chunks spanning ~57 TF steps + 60
    free-running envelope steps."""
    cfg = make_config(BACKBONE='resnet18', REGRESS_LOC=True,
                      REGRESS_ORI=True, ORIENTATION_PARAM='quaternion')
    run_gate(cfg, seed=11, lr=1e-3)


def test_train_dynamics_sgd_classification():
    """Soft-PMF classification heads (the flagship mode) — exercises the
    softmax-on-ReLU-logits quirk under training."""
    cfg = make_config(BACKBONE='resnet18', REGRESS_LOC=False,
                      REGRESS_ORI=False, LOC_BINS_PER_DIM=4,
                      ORI_BINS_PER_DIM=4)
    run_gate(cfg, seed=12, lr=1e-3, chunks=4, free_steps=80)
