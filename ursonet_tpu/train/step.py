"""Jitted train / eval steps over the device mesh.

One XLA program per step: (optional) on-device augmentation + mold →
forward (bf16 under F16) → losses (f32) → backward → global-norm clip →
optimizer update. The batch arrives sharded over the 'data' mesh axis and
params replicated (heads optionally sharded over 'model'), so XLA inserts
the gradient all-reduce / TP collectives itself — the TPU-native
replacement for the reference's (commented-out) multi-GPU ParallelModel
(reference net.py:694-697).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ursonet_tpu.train import losses as L
from ursonet_tpu.train.state import TrainState, mask_grads


def make_train_step(model, config, tx,
                    trainable=None,
                    preprocess: Optional[Callable] = None,
                    jit: bool = True):
    """Build the jitted train step.

    trainable: optional static bool tree (train/state.trainable_mask);
    preprocess: optional jit-safe fn (key, raw_batch) -> model batch
    (data/loader.make_device_preprocess) fused into the same program.
    Returns fn(state, batch, key) -> (state, metrics).
    """
    update_bn = config.TRAIN_BN is None or config.TRAIN_BN is True

    def step_fn(state: TrainState, batch, key):
        if preprocess is not None:
            key, sub = jax.random.split(key)
            batch = preprocess(sub, batch)

        def loss_fn(params):
            log_vars = params.get('loss_log_vars')
            model_params = {k: v for k, v in params.items()
                            if k != 'loss_log_vars'}
            variables = {'params': model_params}
            if state.batch_stats is not None:
                variables['batch_stats'] = state.batch_stats
            if update_bn:
                outputs, mutated = model.apply(
                    variables, batch['images'], training=True,
                    mutable=['batch_stats'])
                new_stats = mutated.get('batch_stats')
            else:
                outputs = model.apply(variables, batch['images'],
                                      training=True)
                new_stats = state.batch_stats
            total, parts = L.compute_losses(outputs, batch, config,
                                            log_vars=log_vars)
            reg = L.l2_regularization(params, config.WEIGHT_DECAY, trainable)
            return total + reg, (parts, reg, new_stats)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (parts, reg, new_stats)), grads = grad_fn(state.params)
        if trainable is not None:
            grads = mask_grads(grads, trainable)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_stats,
                                  opt_state=opt_state)
        metrics = dict(parts)
        metrics['loss'] = loss
        metrics['l2_reg'] = reg
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,)) if jit else step_fn


def make_resident_train_step(model, config, tx, n_images: int,
                             trainable=None,
                             preprocess: Optional[Callable] = None,
                             batch_sharding=None):
    """Train step over a device-resident dataset
    (data/loader.load_dataset_resident): the batch is gathered from the
    resident arrays by an on-device index slice of a per-epoch device
    permutation, so a step performs ZERO host->device transfers (the
    per-step batch shipping of the streaming path both costs dispatch
    time and, on remote-tunnel platforms, pins host memory per transfer
    — PERF.md axon leak note).

    Returns fn(state, data, perm, i, base_key) -> (state, i+1, metrics)
    where `perm` is a device [n_images] permutation, `i` a device int32
    step-in-epoch counter, and `base_key` a device PRNG key folded with
    the global step for per-step randomness.
    """
    base = make_train_step(model, config, tx, trainable=trainable,
                           preprocess=preprocess, jit=False)
    bsz = int(config.BATCH_SIZE)
    steps = max(n_images // bsz, 1)

    def step_fn(state: TrainState, data, perm, i, base_key):
        # wraparound, like the reference generator cycling image_ids
        # (net.py:195-198) — also covers datasets smaller than a batch
        pos = ((i % steps) * bsz + jnp.arange(bsz)) % n_images
        idx = jnp.take(perm, pos, axis=0)
        batch = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
        if batch_sharding is not None:
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, batch_sharding), batch)
        key = jax.random.fold_in(base_key, state.step)
        new_state, metrics = base(state, batch, key)
        return new_state, i + 1, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_resident_eval_step(model, config, n_images: int,
                            preprocess: Optional[Callable] = None,
                            batch_sharding=None):
    """Validation twin of make_resident_train_step: sequential batches
    from resident arrays. Returns fn(state, data, i, base_key) ->
    (i+1, metrics)."""
    base = make_eval_step(model, config, preprocess=preprocess, jit=False)
    bsz = int(config.BATCH_SIZE)
    steps = max(n_images // bsz, 1)

    def step_fn(state: TrainState, data, i, base_key):
        pos = ((i % steps) * bsz + jnp.arange(bsz)) % n_images
        batch = {k: jnp.take(v, pos, axis=0) for k, v in data.items()}
        if batch_sharding is not None:
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, batch_sharding), batch)
        key = jax.random.fold_in(base_key, i)
        metrics = base(state, batch, key)
        return i + 1, metrics

    return jax.jit(step_fn)


def make_eval_step(model, config, preprocess: Optional[Callable] = None,
                   jit: bool = True):
    """Jitted validation step: forward + losses, no updates
    (reference validation pass of fit_generator, net.py:1152-1161)."""

    def step_fn(state: TrainState, batch, key):
        if preprocess is not None:
            key, sub = jax.random.split(key)
            batch = preprocess(sub, batch)
        log_vars = state.params.get('loss_log_vars')
        variables = {'params': {k: v for k, v in state.params.items()
                                if k != 'loss_log_vars'}}
        if state.batch_stats is not None:
            variables['batch_stats'] = state.batch_stats
        outputs = model.apply(variables, batch['images'], training=False)
        total, parts = L.compute_losses(outputs, batch, config,
                                        log_vars=log_vars)
        metrics = dict(parts)
        metrics['loss'] = total
        return metrics

    return jax.jit(step_fn) if jit else step_fn


def make_predict_fn(model, config):
    """Jitted inference forward pass: molded images -> head outputs
    (reference keras_model.predict, net.py:1251)."""

    @partial(jax.jit, static_argnames=())
    def predict(params, batch_stats, images):
        variables = {'params': {k: v for k, v in params.items()
                                if k != 'loss_log_vars'}}
        if batch_stats is not None:
            variables['batch_stats'] = batch_stats
        return model.apply(variables, images, training=False)

    return predict
