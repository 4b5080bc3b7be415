"""Training state: params + BN stats + optimizer state, sharded on the mesh,
plus the reference's layer-freezing machinery.

Replaces the reference's Keras-model mutable `layer.trainable` flags
(set_trainable, reference net.py:1030-1066) with a pure boolean mask over
the param tree: frozen params get zero gradient and are excluded from the
L2 regularizer, exactly reproducing what Keras does when a layer is
non-trainable.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from ursonet_tpu.parallel.sharding import variable_shardings


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


# Predefined layer-selection regexes (reference net.py:1084-1097). The
# reference matches Keras *layer names*; ours match the same names derived
# from param paths (see `layer_name_of`). 'fpn_' entries of the reference
# regexes are vestigial Mask-RCNN leftovers with no matching layers.
LAYER_REGEX = {
    "heads": r"(ori\_.*)|(loc\_.*)|(k\d\_.*)|(bottleneck_layer)",
    "3+": r"(res3.*)|(bn3.*)|(res4.*)|(bn4.*)|(res5.*)|(bn5.*)"
          r"|(loc\_.*)|(ori\_.*)|(k\d\_.*)|(bottleneck_layer)",
    "4+": r"(res4.*)|(bn4.*)|(res5.*)|(bn5.*)"
          r"|(loc\_.*)|(ori\_.*)|(k\d\_.*)|(bottleneck_layer)",
    "5+": r"(res5.*)|(bn5.*)|(loc\_.*)|(ori\_.*)|(k\d\_.*)|(bottleneck_layer)",
    "all": ".*",
}


def layer_name_of(path) -> str:
    """Keras-equivalent layer name for a param path.

    Param paths look like ('backbone','res3a','res3a_branch2a','kernel') or
    ('backbone','bn_conv1','bn','scale') or ('loc_head','loc_dense_0',
    'kernel'): the layer name is the module owning the leaf — the component
    before the leaf, skipping the synthetic 'bn' submodule of FrozenAwareBN.
    """
    keys = [k.key if hasattr(k, 'key') else str(k) for k in path]
    i = len(keys) - 2
    if i >= 0 and keys[i] == 'bn':
        i -= 1
    return keys[i] if i >= 0 else keys[-1]


def trainable_mask(params, layers: str):
    """Boolean mask tree: True where the param's layer matches the regex
    (preset name or raw regex — reference net.py:1068-1097)."""
    regex = LAYER_REGEX.get(layers, layers)
    flat = jax.tree_util.tree_leaves_with_path(params)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [bool(re.fullmatch(regex, layer_name_of(p))) for p, _ in flat])


def mask_grads(grads, mask):
    return jax.tree.map(
        lambda g, m: g if m else jnp.zeros_like(g), grads, mask)


def create_train_state(model, config, tx, mesh, rng,
                       sample_images) -> TrainState:
    """Initialize a sharded TrainState on the mesh.

    Params are pinned to their annotated shardings (TP head kernels on
    'model', everything else replicated); the optimizer state inherits the
    params' layout through XLA sharding propagation.
    """
    img_shape = jax.ShapeDtypeStruct(sample_images.shape,
                                     sample_images.dtype)
    abstract = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros(img_shape.shape, img_shape.dtype),
                             training=False), rng)
    var_sh = variable_shardings(mesh, abstract)

    def init_fn(r):
        variables = nn.unbox(
            model.init(r, jnp.zeros(img_shape.shape, img_shape.dtype),
                       training=False))
        params = jax.lax.with_sharding_constraint(
            variables['params'], var_sh['params'])
        if getattr(config, 'LEARNABLE_LOSS_WEIGHTS', False):
            # Kendall-style log-variances ride the param tree (stripped
            # before model.apply in train/step.py).
            names = (('loc_loss', 'k2_loss', 'k3_loss')
                     if config.REGRESS_KEYPOINTS
                     else ('loc_loss', 'ori_loss'))
            params = dict(params)
            params['loss_log_vars'] = {
                n: jnp.zeros([], jnp.float32) for n in names}
        opt_state = tx.init(params)
        return TrainState(
            step=jnp.zeros([], jnp.int32),
            params=params,
            batch_stats=variables.get('batch_stats'),
            opt_state=opt_state)

    with mesh:
        return jax.jit(init_fn)(rng)


def state_from_params(params, batch_stats, tx, step: int = 0) -> TrainState:
    """Wrap restored/imported params into a fresh-optimizer TrainState."""
    return TrainState(
        step=jnp.asarray(step, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params))
