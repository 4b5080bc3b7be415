"""Model graph tests: output shapes for every head mode, reference layer
naming (h5-import contract), BN-freeze semantics, dtype policy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ursonet_tpu.config import Config
from ursonet_tpu.models import build_model


def tiny_config(**overrides):
    cfg = Config()
    cfg.BACKBONE = 'resnet18'
    cfg.IMAGE_RESIZE_MODE = 'square'
    cfg.IMAGE_MAX_DIM = 128
    cfg.IMAGE_MIN_DIM = 128
    cfg.BOTTLENECK_WIDTH = 8
    cfg.BRANCH_SIZE = 32
    cfg.NR_DENSE_LAYERS = 1
    cfg.LOC_BINS_PER_DIM = 4
    cfg.ORI_BINS_PER_DIM = 4
    for k, v in overrides.items():
        setattr(cfg, k, v)
    cfg.update()
    return cfg


def init_and_apply(cfg, batch=2, training=False):
    model = build_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(42), (batch, *cfg.IMAGE_SHAPE))
    variables = model.init(jax.random.PRNGKey(0), x, training=False)
    out = model.apply(variables, x, training=training,
                      mutable=['batch_stats'] if training else False)
    if training:
        out = out[0]
    return model, variables, out


def test_regression_heads_shapes():
    cfg = tiny_config(REGRESS_LOC=True, REGRESS_ORI=True,
                      ORIENTATION_PARAM='quaternion')
    _, variables, out = init_and_apply(cfg)
    assert out['loc'].shape == (2, 3)
    assert out['ori'].shape == (2, 4)
    # quaternion output is L2-normalized (reference net.py:346)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out['ori']), axis=-1),
                               1.0, atol=1e-5)


def test_classification_heads_shapes():
    cfg = tiny_config(REGRESS_LOC=False, REGRESS_ORI=False)
    _, _, out = init_and_apply(cfg)
    assert out['loc'].shape == (2, 4 ** 3)
    assert out['ori'].shape == (2, 4 ** 3)
    # ReLU final activation → non-negative (net.py:318,350)
    assert np.asarray(out['loc']).min() >= 0
    assert np.asarray(out['ori']).min() >= 0


def test_euler_and_angleaxis_heads():
    for param in ('euler_angles', 'angle_axis'):
        cfg = tiny_config(ORIENTATION_PARAM=param)
        _, _, out = init_and_apply(cfg)
        assert out['ori'].shape == (2, 3)


def test_keypoint_heads():
    cfg = tiny_config(REGRESS_KEYPOINTS=True)
    _, _, out = init_and_apply(cfg)
    assert set(out) == {'loc', 'k1', 'k2'}
    for v in out.values():
        assert v.shape == (2, 3)


def test_resnet50_layer_names_match_reference():
    cfg = tiny_config(BACKBONE='resnet50')
    model = build_model(cfg)
    x = jnp.zeros((1, *cfg.IMAGE_SHAPE), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, training=False))
    params = variables['params']
    bb = params['backbone']
    # Reference names (net.py:161-199)
    assert 'conv1' in bb and 'bn_conv1' in bb
    assert 'res2a' in bb and 'res2a_branch2a' in bb['res2a']
    assert 'res4f' in bb  # resnet50 stage4 has blocks a..f
    assert 'res4g' not in bb
    assert 'res5c' in bb
    assert 'bottleneck_layer' in params
    assert 'loc_final' in params['loc_head']
    assert 'ori_q' in params['ori_head']
    # conv_block shortcut conv present only on 'a' blocks
    assert 'res2a_branch1' in bb['res2a']
    assert all('branch1' not in k for k in bb['res2b'])


def test_resnet101_depth():
    cfg = tiny_config(BACKBONE='resnet101')
    model = build_model(cfg)
    x = jnp.zeros((1, *cfg.IMAGE_SHAPE), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, training=False))
    bb = variables['params']['backbone']
    # stage-4 has 1 conv block + 22 identity blocks (net.py:188)
    stage4 = [k for k in bb if k.startswith('res4')]
    assert len(stage4) == 23


def test_resnet18_layer_names():
    cfg = tiny_config(BACKBONE='resnet18')
    model = build_model(cfg)
    x = jnp.zeros((1, *cfg.IMAGE_SHAPE), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, training=False))
    bb = variables['params']['backbone']
    assert 'conv0' in bb and 'bn_conv0' in bb
    assert 'stage1_unit1' in bb
    u = bb['stage1_unit1']
    assert 'stage1_unit1_conv1' in u and 'stage1_unit1_conv2' in u
    assert 'stage1_unit1_bn2' in u           # single BN (net.py:232)
    assert 'stage1_unit1_sc' in u            # post cut on first block
    # bias-free convs (net.py:245-247)
    assert 'bias' not in u['stage1_unit1_conv1']
    # stage4 of resnet18 has 2 units
    assert 'stage4_unit2' in bb and 'stage4_unit3' not in bb


def test_bottleneck_feature_count_matches_reference_formula():
    cfg = tiny_config(BACKBONE='resnet18', BOTTLENECK_WIDTH=8)
    model, variables, _ = init_and_apply(cfg)
    # loc_dense_0 kernel input dim == B*H*W/64² (net.py:640)
    k = variables['params']['loc_head']['loc_dense_0']['kernel']
    k = k.value if hasattr(k, 'value') else k
    assert k.shape[0] == cfg.head_input_features() == 8 * 128 * 128 // 4096


def test_frozen_bn_does_not_update_stats():
    cfg = tiny_config(TRAIN_BN=False)
    model = build_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, *cfg.IMAGE_SHAPE))
    variables = model.init(jax.random.PRNGKey(0), x, training=False)
    out, mutated = model.apply(variables, x, training=True,
                               mutable=['batch_stats'])
    # Frozen BN: running stats unchanged by a training step
    before = jax.tree.leaves(variables['batch_stats'])
    after = jax.tree.leaves(mutated['batch_stats'])
    for b, a in zip(before, after):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_trainable_bn_updates_stats():
    cfg = tiny_config(TRAIN_BN=None)
    model = build_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, *cfg.IMAGE_SHAPE)) * 3 + 1
    variables = model.init(jax.random.PRNGKey(0), x, training=False)
    out, mutated = model.apply(variables, x, training=True,
                               mutable=['batch_stats'])
    before = np.concatenate([np.asarray(v).ravel() for v in
                             jax.tree.leaves(variables['batch_stats'])])
    after = np.concatenate([np.asarray(v).ravel() for v in
                            jax.tree.leaves(mutated['batch_stats'])])
    assert not np.allclose(before, after)


def test_bf16_policy_outputs_f32():
    cfg = tiny_config(F16=True)
    _, variables, out = init_and_apply(cfg)
    assert out['loc'].dtype == jnp.float32  # outputs cast back to f32
    # params stay f32 master copies
    k = variables['params']['loc_head']['loc_final']['kernel']
    k = k.value if hasattr(k, 'value') else k
    assert k.dtype == jnp.float32


def test_image_shape_validation():
    cfg = tiny_config()
    cfg.IMAGE_MAX_DIM = 100
    cfg.IMAGE_MIN_DIM = 100
    cfg.update()
    with pytest.raises(ValueError):
        build_model(cfg)


def test_remat_matches_no_remat_grads():
    """REMAT recomputes activations but must give identical loss/grads."""
    import jax
    import jax.numpy as jnp

    from ursonet_tpu.config import Config
    from ursonet_tpu.models.ursonet import build_model

    class Cfg(Config):
        BACKBONE = 'resnet18'
        BOTTLENECK_WIDTH = 8
        BRANCH_SIZE = 16
        IMAGE_RESIZE_MODE = 'square'
        IMAGE_MAX_DIM = 64
        IMAGE_MIN_DIM = 64

    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                    jnp.float32)

    def loss_of(remat):
        cfg = Cfg()
        cfg.REMAT = remat
        cfg.update()
        model = build_model(cfg)
        import flax.linen as nn
        v = nn.unbox(model.init(jax.random.PRNGKey(0), x, training=False))

        def loss_fn(params):
            out = model.apply({'params': params,
                               'batch_stats': v['batch_stats']}, x,
                              training=True)
            return jnp.sum(out['loc'] ** 2) + jnp.sum(out['ori'] ** 2)

        val, grads = jax.value_and_grad(loss_fn)(v['params'])
        return float(val), grads

    v0, g0 = loss_of(False)
    # every checkpoint POLICY must give identical numerics — only the
    # save/recompute schedule may differ (tools/sweep_remat.py times them)
    for policy in (True, 'narrow', 'dots'):
        v1, g1 = loss_of(policy)
        assert v0 == pytest.approx(v1, rel=1e-6), policy
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_remat_policies_bottleneck_backbone():
    """The 'narrow' policy path on the resnet50 bottleneck blocks (where
    the checkpoint_name tags live) matches no-remat numerics."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from ursonet_tpu.config import Config
    from ursonet_tpu.models.ursonet import build_model

    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3),
                    jnp.float32)
    vals = {}
    for remat in (False, 'narrow'):
        cfg = Config()
        cfg.BACKBONE = 'resnet50'
        cfg.BOTTLENECK_WIDTH = 8
        cfg.BRANCH_SIZE = 16
        cfg.IMAGE_RESIZE_MODE = 'square'
        cfg.IMAGE_MAX_DIM = cfg.IMAGE_MIN_DIM = 64
        cfg.REMAT = remat
        cfg.update()
        model = build_model(cfg)
        v = nn.unbox(model.init(jax.random.PRNGKey(0), x, training=False))

        def loss_fn(params):
            out = model.apply({'params': params,
                               'batch_stats': v['batch_stats']}, x,
                              training=True)
            return jnp.sum(out['loc'] ** 2)

        val, grads = jax.value_and_grad(loss_fn)(v['params'])
        vals[remat] = (float(val), grads)
    v0, g0 = vals[False]
    v1, g1 = vals['narrow']
    assert v0 == pytest.approx(v1, rel=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_actq_conv_matches_nn_conv():
    """ConvQ8 (int8 saved-activation conv, models/actq.py): forward and
    input gradient are EXACT vs nn.Conv; only the weight gradient sees
    8-bit rounding of the saved input (small relative noise). Param
    trees are interchangeable (checkpoint compatibility)."""
    import flax.linen as nn

    from ursonet_tpu.models.actq import ConvQ8

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 8), jnp.float32)
    ref = nn.Conv(12, (3, 3), strides=(2, 2), padding='SAME',
                  use_bias=True)
    q8 = ConvQ8(12, (3, 3), (2, 2), 'SAME', True, jnp.float32)
    v = ref.init(key, x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(q8.init(key, x)))

    np.testing.assert_array_equal(np.asarray(ref.apply(v, x)),
                                  np.asarray(q8.apply(v, x)))

    gx_ref = jax.grad(lambda t: jnp.sum(ref.apply(v, t) ** 2))(x)
    gx_q8 = jax.grad(lambda t: jnp.sum(q8.apply(v, t) ** 2))(x)
    np.testing.assert_array_equal(np.asarray(gx_ref), np.asarray(gx_q8))

    gw_ref = jax.grad(lambda p: jnp.sum(ref.apply(p, x) ** 2))(v)
    gw_q8 = jax.grad(lambda p: jnp.sum(q8.apply(p, x) ** 2))(v)
    k_ref = np.asarray(gw_ref['params']['kernel'])
    k_q8 = np.asarray(gw_q8['params']['kernel'])
    rel = np.linalg.norm(k_ref - k_q8) / np.linalg.norm(k_ref)
    assert rel < 0.02, rel
    # bias grad does not involve the activation: exact
    np.testing.assert_array_equal(np.asarray(gw_ref['params']['bias']),
                                  np.asarray(gw_q8['params']['bias']))


def test_actq_wgrad8_conv_matches_nn_conv():
    """The 'wgrad8' mode (explicit int8×int8→int32 weight-gradient
    conv, no bf16 rematerialization): forward and dx still exact;
    dw noise bounded despite the extra g-quantization."""
    import flax.linen as nn

    from ursonet_tpu.models.actq import ConvQ8

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 8), jnp.float32)
    for strides, pad, k in (((1, 1), 'SAME', 3), ((2, 2), 'SAME', 3),
                            ((2, 2), ((3, 3), (3, 3)), 7),
                            ((1, 1), 'VALID', 1)):
        ref = nn.Conv(12, (k, k), strides=strides, padding=pad,
                      use_bias=False)
        q8 = ConvQ8(12, (k, k), strides, pad, False, jnp.float32,
                    mode='wgrad8')
        v = ref.init(key, x)
        np.testing.assert_array_equal(np.asarray(ref.apply(v, x)),
                                      np.asarray(q8.apply(v, x)))
        gx_ref = jax.grad(lambda t: jnp.sum(ref.apply(v, t) ** 2))(x)
        gx_q8 = jax.grad(lambda t: jnp.sum(q8.apply(v, t) ** 2))(x)
        np.testing.assert_array_equal(np.asarray(gx_ref),
                                      np.asarray(gx_q8))
        gw_ref = jax.grad(lambda p: jnp.sum(ref.apply(p, x) ** 2))(v)
        gw_q8 = jax.grad(lambda p: jnp.sum(q8.apply(p, x) ** 2))(v)
        a = np.asarray(gw_ref['params']['kernel'])
        b = np.asarray(gw_q8['params']['kernel'])
        rel = np.linalg.norm(a - b) / np.linalg.norm(a)
        assert rel < 0.03, (strides, pad, k, rel)


@pytest.mark.parametrize('mode', [True, 'wgrad8'])
@pytest.mark.parametrize('backbone', ['resnet18', 'resnet50'])
def test_actq_model_forward_exact_grads_close(backbone, mode):
    """TRAIN_ACT_Q8 keeps the forward pass and param tree identical to
    the standard path; full-model gradients agree to ~1% relative."""
    import flax.linen as nn

    from ursonet_tpu.models.ursonet import build_model as _build

    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                    jnp.float32)

    def run(act_q8):
        cfg = Config()
        cfg.BACKBONE = backbone
        cfg.BOTTLENECK_WIDTH = 8
        cfg.BRANCH_SIZE = 16
        cfg.IMAGE_RESIZE_MODE = 'square'
        cfg.IMAGE_MAX_DIM = cfg.IMAGE_MIN_DIM = 64
        cfg.TRAIN_ACT_Q8 = act_q8
        cfg.update()
        model = _build(cfg)
        v = nn.unbox(model.init(jax.random.PRNGKey(0), x, training=False))

        def loss_fn(params):
            out = model.apply({'params': params,
                               'batch_stats': v['batch_stats']}, x,
                              training=True)
            return jnp.sum(out['loc'] ** 2) + jnp.sum(out['ori'] ** 2)

        val, grads = jax.value_and_grad(loss_fn)(v['params'])
        return v, float(val), grads

    v0, l0, g0 = run(False)
    v1, l1, g1 = run(mode)
    assert (jax.tree_util.tree_structure(v0)
            == jax.tree_util.tree_structure(v1))
    # forward (hence loss) is exact — only wgrads differ
    assert l0 == pytest.approx(l1, rel=1e-6)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    worst = 0.0
    for path, a in flat0:
        b = flat1[path]
        a, b = np.asarray(a), np.asarray(b)
        denom = np.linalg.norm(a)
        if denom > 1e-8:
            worst = max(worst, float(np.linalg.norm(a - b) / denom))
    assert worst < 0.05, worst


def test_actq_wgrad8_int32_guard_falls_back():
    """wgrad8 contractions whose worst case could wrap int32
    (N·Ho·Wo > ~133k) must take the bf16-dequant fallback — same
    compression, unconditional correctness."""
    import flax.linen as nn

    from ursonet_tpu.models.actq import _INT32_SAFE_ACC, ConvQ8

    key = jax.random.PRNGKey(0)
    # 8 * 144 * 144 = 165,888 > 133,152: the guard must trigger
    x = jax.random.normal(key, (8, 144, 144, 2), jnp.float32)
    assert x.shape[0] * x.shape[1] * x.shape[2] > _INT32_SAFE_ACC

    ref = nn.Conv(4, (3, 3), strides=(1, 1), padding='SAME',
                  use_bias=False)
    q8 = ConvQ8(4, (3, 3), (1, 1), 'SAME', False, jnp.float32,
                mode='wgrad8')
    v = ref.init(key, x)
    gx_ref = jax.grad(lambda t: jnp.sum(ref.apply(v, t) ** 2))(x)
    gx_q8 = jax.grad(lambda t: jnp.sum(q8.apply(v, t) ** 2))(x)
    np.testing.assert_array_equal(np.asarray(gx_ref), np.asarray(gx_q8))
    gw_ref = jax.grad(lambda p: jnp.sum(ref.apply(p, x) ** 2))(v)
    gw_q8 = jax.grad(lambda p: jnp.sum(q8.apply(p, x) ** 2))(v)
    a = np.asarray(gw_ref['params']['kernel'])
    b = np.asarray(gw_q8['params']['kernel'])
    # fallback is the dequant wgrad: only x-rounding noise, no g noise
    assert np.linalg.norm(a - b) / np.linalg.norm(a) < 0.02


# ---------------------------------------------------------------------------
# Reduced-FLOP serving variant (round 4): INNER_WIDTH_MULT + prune_inner
# ---------------------------------------------------------------------------

def _small_r50(mult, h=64, w=64):
    from ursonet_tpu.config import Config
    from ursonet_tpu.models.ursonet import build_model

    c = Config()
    c.BACKBONE = 'resnet50'
    c.BOTTLENECK_WIDTH = 32
    c.BRANCH_SIZE = 64
    c.NR_DENSE_LAYERS = 1
    c.IMAGE_RESIZE_MODE = 'none'
    c.IMAGE_MIN_DIM = h
    c.IMAGE_MAX_DIM = w
    c.IMAGES_PER_GPU = 2
    c.INNER_WIDTH_MULT = mult
    c.update()
    return c, build_model(c)


def test_inner_width_mult_scales_inner_only():
    import flax.linen as nn
    import jax

    c, m = _small_r50(0.5)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    v = jax.eval_shape(lambda r: m.init(r, imgs, training=False),
                       jax.random.PRNGKey(0))
    p = nn.unbox(v)['params']['backbone']
    # inner widths halve; stream widths and names are untouched
    assert p['res3a']['res3a_branch2b']['kernel'].shape == (3, 3, 64, 64)
    assert p['res3a']['res3a_branch2c']['kernel'].shape == (1, 1, 64, 512)
    assert p['res3a']['res3a_branch1']['kernel'].shape == (1, 1, 256, 512)
    assert p['res5c']['res5c_branch2b']['kernel'].shape == (3, 3, 256, 256)
    assert p['conv1']['kernel'].shape == (7, 7, 3, 64)


def test_inner_width_mult_rejected_for_basic_blocks():
    from ursonet_tpu.config import Config
    from ursonet_tpu.models.ursonet import build_model

    c = Config()
    c.BACKBONE = 'resnet18'
    c.INNER_WIDTH_MULT = 0.5
    c.IMAGE_RESIZE_MODE = 'none'
    c.IMAGE_MIN_DIM = c.IMAGE_MAX_DIM = 64
    c.update()
    import jax
    import pytest as _pytest
    m = build_model(c)
    with _pytest.raises(ValueError, match='INNER_WIDTH_MULT'):
        jax.eval_shape(
            lambda r: m.init(r, jnp.zeros((1, 64, 64, 3)), training=False),
            jax.random.PRNGKey(0))


@pytest.mark.slow
def test_prune_inner_identity_and_reduction():
    """mult=1.0 pruning is a bit-exact no-op; mult=0.5 pruning produces a
    tree that loads exactly into the INNER_WIDTH_MULT=0.5 architecture."""
    import copy
    import os
    import sys

    import flax.linen as nn
    import jax
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'tools'))
    from prune_inner import prune_tree

    c1, m1 = _small_r50(1.0)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 60
    v = nn.unbox(m1.init(jax.random.PRNGKey(0), imgs, training=False))
    tree = {'params': jax.tree.map(np.asarray, v['params']),
            'batch_stats': jax.tree.map(np.asarray, v['batch_stats'])}

    t1 = copy.deepcopy(tree)
    assert len(prune_tree(t1, 1.0)) == 32  # 16 blocks x 2 inner spaces
    ref = m1.apply(v, imgs, training=False)
    out = m1.apply(t1, imgs, training=False)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(ref[k]),
                                      np.asarray(out[k]))

    t5 = copy.deepcopy(tree)
    prune_tree(t5, 0.5)
    c5, m5 = _small_r50(0.5)
    shapes = jax.eval_shape(lambda r: m5.init(r, imgs, training=False),
                            jax.random.PRNGKey(0))
    want = jax.tree.leaves(jax.tree.map(
        lambda a: a.shape, nn.unbox(shapes)['params']))
    got = jax.tree.leaves(jax.tree.map(
        lambda a: np.asarray(a).shape, t5['params']))
    assert want == got
    out5 = m5.apply(t5, imgs, training=False)
    assert set(out5) == set(ref)
