"""Optimizers and LR schedules.

Matches the reference optimizer semantics (net.py:973-1028):
  * global-norm gradient clipping at GRADIENT_CLIP_NORM (Keras legacy
    clipnorm computes the global norm over all grads);
  * Keras-style SGD with momentum: v ← m·v − lr_t·g; w ← w + v — the
    learning rate multiplies only the *current* gradient, so a time-varying
    LR (cyclical schedule) behaves exactly like the reference CLR callback
    (clr_callback.py) updating lr per batch;
  * Adam(amsgrad) alternative.

The cyclical LR policies (triangular / triangular2 / exp_range) are
implemented as pure step→lr schedules (clr_callback.py:104-111).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


class KerasSGDState(NamedTuple):
    velocity: optax.Updates
    count: jnp.ndarray


def keras_sgd(learning_rate: Union[float, Schedule],
              momentum: float = 0.9) -> optax.GradientTransformation:
    """SGD with Keras-legacy momentum semantics (lr inside the velocity).

    v_t = momentum·v_{t-1} − lr_t·g_t ;  update = v_t.
    """

    def lr_at(count):
        if callable(learning_rate):
            return learning_rate(count)
        return jnp.asarray(learning_rate)

    def init_fn(params):
        return KerasSGDState(
            velocity=jax.tree.map(jnp.zeros_like, params),
            count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        del params
        lr = lr_at(state.count)
        new_v = jax.tree.map(
            lambda v, g: momentum * v - lr * g.astype(v.dtype),
            state.velocity, updates)
        return new_v, KerasSGDState(new_v, state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def clr_schedule(base_lr: float, max_lr: float, step_size: int,
                 mode: str = 'triangular', gamma: float = 1.0) -> Schedule:
    """Cyclical learning rate (clr_callback.py:104-111).

    triangular:  lr = base + (max-base)·max(0, 1-x)
    triangular2: amplitude halves each cycle
    exp_range:   amplitude scales by gamma^iterations
    """

    def schedule(count):
        it = jnp.asarray(count, jnp.float32)
        cycle = jnp.floor(1.0 + it / (2.0 * step_size))
        x = jnp.abs(it / step_size - 2.0 * cycle + 1.0)
        amp = jnp.maximum(0.0, 1.0 - x)
        if mode == 'triangular':
            scale = 1.0
        elif mode == 'triangular2':
            scale = 1.0 / (2.0 ** (cycle - 1.0))
        elif mode == 'exp_range':
            scale = gamma ** it
        else:
            raise ValueError(f"unknown CLR mode {mode}")
        return base_lr + (max_lr - base_lr) * amp * scale

    return schedule


def make_optimizer(config) -> optax.GradientTransformation:
    """Build the optax chain from a Config (reference compile,
    net.py:978-983 + CLR wiring net.py:1125-1130)."""
    if config.CLR:
        lr: Union[float, Schedule] = clr_schedule(
            config.BASE_LEARNING_RATE, config.MAX_LEARNING_RATE,
            config.CLR_STEP_SIZE, mode='triangular')
    else:
        lr = config.LEARNING_RATE

    clip = optax.clip_by_global_norm(config.GRADIENT_CLIP_NORM)
    if config.OPTIMIZER.upper() == 'SGD':
        opt = keras_sgd(lr, config.LEARNING_MOMENTUM)
    else:
        # Keras Adam(amsgrad=True) (net.py:983)
        if callable(lr):
            opt = optax.inject_hyperparams(
                lambda learning_rate: optax.amsgrad(learning_rate))(
                    learning_rate=lr)
        else:
            opt = optax.amsgrad(lr)
    return optax.chain(clip, opt)
