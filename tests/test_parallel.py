"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: the fake-backend capability the reference lacks).

Verifies: mesh construction, param/batch shardings, that a full train step
compiles and runs under data×tensor parallelism, that gradients are
correctly all-reduced (DP+TP result == single-device result), and the
layer-freezing mask semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ursonet_tpu import parallel
from ursonet_tpu.config import Config
from ursonet_tpu.models.ursonet import build_model
from ursonet_tpu.train.optim import make_optimizer
from ursonet_tpu.train.state import (create_train_state, layer_name_of,
                                     trainable_mask)
from ursonet_tpu.train.step import make_train_step


class TinyConfig(Config):
    BACKBONE = 'resnet18'
    BOTTLENECK_WIDTH = 8
    BRANCH_SIZE = 16
    IMAGE_RESIZE_MODE = 'square'
    IMAGE_MAX_DIM = 64
    IMAGE_MIN_DIM = 64
    REGRESS_LOC = True
    REGRESS_ORI = True
    ORIENTATION_PARAM = 'quaternion'
    ROT_AUG = False


def _batch(rng, n):
    q = rng.randn(n, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return {
        'images': jnp.asarray(rng.rand(n, 64, 64, 3), jnp.float32),
        'gt_loc': jnp.asarray(rng.randn(n, 3) + 10.0, jnp.float32),
        'gt_ori': jnp.asarray(q, jnp.float32),
    }


def _run_steps(cfg, batch, n_steps=2):
    mesh = parallel.make_mesh(cfg)
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    state = create_train_state(model, cfg, tx, mesh,
                               jax.random.PRNGKey(0), batch['images'])
    step = make_train_step(model, cfg, tx)
    sharded = parallel.shard_batch(mesh, batch)
    with mesh:
        for i in range(n_steps):
            state, metrics = step(state, sharded, jax.random.PRNGKey(i))
    return state, {k: float(v) for k, v in metrics.items()}


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    cfg = TinyConfig()
    cfg.MESH_DATA, cfg.MESH_MODEL = 4, 2
    cfg.update()
    assert cfg.GPU_COUNT == 8
    mesh = parallel.make_mesh(cfg)
    assert mesh.shape == {'data': 4, 'model': 2}


def test_dp_tp_matches_single_device(rng):
    batch = _batch(rng, 8)

    cfg1 = TinyConfig()
    cfg1.IMAGES_PER_GPU = 8
    cfg1.update()
    state1, m1 = _run_steps(cfg1, batch)

    cfg8 = TinyConfig()
    cfg8.IMAGES_PER_GPU = 2
    cfg8.MESH_DATA, cfg8.MESH_MODEL = 4, 2
    cfg8.update()
    state8, m8 = _run_steps(cfg8, batch)

    # Same initial params (same PRNG key) + same global batch =>
    # identical losses and updated params up to reduction order.
    assert m1['loss'] == pytest.approx(m8['loss'], rel=1e-5)
    p1 = jax.tree.leaves(state1.params)
    p8 = jax.tree.leaves(jax.device_get(state8.params))
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_tp_head_kernel_is_sharded(rng):
    cfg = TinyConfig()
    cfg.IMAGES_PER_GPU = 2
    cfg.MESH_DATA, cfg.MESH_MODEL = 2, 4
    cfg.update()
    batch = _batch(rng, 4)
    mesh = parallel.make_mesh(cfg)
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    state = create_train_state(model, cfg, tx, mesh,
                               jax.random.PRNGKey(0), batch['images'])
    k = state.params['loc_head']['loc_dense_0']['kernel']
    spec = k.sharding.spec
    # Column-parallel hidden dense: output dim sharded over 'model'.
    assert tuple(spec) == (None, 'model')
    # Shard shape is 1/4 of the full kernel along the last axis.
    shard_shape = k.sharding.shard_shape(k.shape)
    assert shard_shape[-1] * 4 == k.shape[-1]


def test_detect_sharded_matches_single_device(rng, tmp_path):
    """Inference is data-parallel over the mesh: engine.detect under a
    4×2 mesh must reproduce single-device outputs from the same
    weights (float and int8 paths)."""
    from ursonet_tpu.engine import UrsoNet

    def make_engine(mesh_data, mesh_model, per_gpu):
        cfg = TinyConfig()
        cfg.IMAGES_PER_GPU = per_gpu
        cfg.MESH_DATA, cfg.MESH_MODEL = mesh_data, mesh_model
        cfg.IMAGE_RESIZE_MODE = 'none'
        cfg.update()
        eng = UrsoNet('inference', cfg, str(tmp_path))
        eng.initialize(seed=0)
        return eng

    images = [np.asarray(rng.rand(64, 64, 3) * 255, np.float32)
              for _ in range(8)]
    e1 = make_engine(1, 1, 8)
    ref = e1.detect(images)
    e8 = make_engine(4, 2, 2)
    out = e8.detect(images)
    for r, o in zip(ref, out):
        for k in r:
            np.testing.assert_allclose(o[k], r[k], rtol=2e-4, atol=2e-5)

    # int8 path under the mesh
    e8.quantize()
    qout = e8.detect(images)
    for r, o in zip(ref, qout):
        rel = (np.linalg.norm(o['loc'] - r['loc'])
               / (np.linalg.norm(r['loc']) + 1e-9))
        assert rel < 0.2

    # Uneven batch through the public predict path: 3 images on a
    # 4-row data mesh must pad to the mesh rows and trim the outputs
    # (previously crashed inside device_put).
    molded, _, _ = e8.mold_inputs(images[:3])
    out3 = e8.predict_molded(molded)
    for k in out3:
        assert np.shape(out3[k])[0] == 3


def test_trainable_mask_presets(rng):
    cfg = TinyConfig()
    cfg.BACKBONE = 'resnet50'
    cfg.update()
    model = build_model(cfg)
    variables = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 64, 64, 3)), training=False),
        jax.random.PRNGKey(0))
    import flax.linen as nn
    params = nn.unbox(variables)['params']

    mask_all = trainable_mask(params, 'all')
    assert all(jax.tree.leaves(mask_all))

    mask_heads = trainable_mask(params, 'heads')
    flat = jax.tree_util.tree_leaves_with_path(mask_heads)
    for path, m in flat:
        name = layer_name_of(path)
        in_backbone = any(
            (hasattr(k, 'key') and k.key == 'backbone') for k in path)
        assert m == (not in_backbone), (name, m)

    mask5 = trainable_mask(params, '5+')
    flat5 = jax.tree_util.tree_leaves_with_path(mask5)
    for path, m in flat5:
        name = layer_name_of(path)
        expect = (name.startswith('res5') or name.startswith('bn5')
                  or not any((hasattr(k, 'key') and k.key == 'backbone')
                             for k in path))
        assert m == expect, (name, m)


@pytest.mark.parametrize('mode', [True, 'wgrad8'])
def test_dp_tp_actq_matches_single_device(rng, mode):
    """TRAIN_ACT_Q8 (int8 saved-activation convs) under DP×TP must
    reproduce single-device actq numerics: the per-sample x-scale is
    batch-local, and the wgrad8 g-scale is a GSPMD-global max (same
    value sharded or not)."""
    batch = _batch(rng, 8)

    cfg1 = TinyConfig()
    cfg1.IMAGES_PER_GPU = 8
    cfg1.TRAIN_ACT_Q8 = mode
    cfg1.update()
    state1, m1 = _run_steps(cfg1, batch)

    cfg8 = TinyConfig()
    cfg8.IMAGES_PER_GPU = 2
    cfg8.MESH_DATA, cfg8.MESH_MODEL = 4, 2
    cfg8.TRAIN_ACT_Q8 = mode
    cfg8.update()
    state8, m8 = _run_steps(cfg8, batch)

    assert m1['loss'] == pytest.approx(m8['loss'], rel=1e-5)
    p1 = jax.tree.leaves(state1.params)
    p8 = jax.tree.leaves(jax.device_get(state8.params))
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
