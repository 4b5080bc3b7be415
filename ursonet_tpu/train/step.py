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
                    preprocess: Optional[Callable] = None):
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

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(model, config, preprocess: Optional[Callable] = None):
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

    return jax.jit(step_fn)


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
