"""Output-fidelity gate vs an ACTUAL Keras build of the reference graph.

Round-1 only validated the h5 bridge by round-tripping its own files —
self-consistency. This test builds the reference architecture in real
Keras/TensorFlow (faithfully following /root/reference/net.py:85-352:
identity_block/conv_block, resnet_shallow_graph, ZeroPadding stems,
bottleneck conv, dense heads, the l2-normalize quaternion lambda),
randomizes every weight INCLUDING BatchNorm moving statistics, exports a
Keras-2-layout h5, imports it through checkpoint/h5_import.load_keras_h5
(the by-name contract, reference net.py:816-852), and asserts the Flax
forward matches the Keras forward to <=1e-4 in every head mode.

This catches what the self-round-trip cannot: BN epsilon/momentum/frozen
semantics, stem ZeroPadding-vs-SAME alignment, asymmetric SAME padding of
the stride-2 bottleneck conv, NHWC flatten order, and head activation
placement.
"""

import os

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

import jax  # noqa: E402

from ursonet_tpu.checkpoint.h5_import import load_keras_h5  # noqa: E402
from ursonet_tpu.config import Config  # noqa: E402
from ursonet_tpu.models.ursonet import build_model  # noqa: E402

L = tf.keras.layers

H = W = 64  # smallest %64-valid shape — keeps the TF CPU forward cheap


# --- reference graph in real Keras (spec: /root/reference/net.py) -----------

def _bottleneck_block(x, filters, stage, block, strides=(1, 1),
                      conv_shortcut=False):
    """identity_block / conv_block (net.py:85-158): 1x1(strided) -> BN ->
    relu -> 3x3 same -> BN -> relu -> 1x1 -> BN; (+ strided 1x1+BN
    shortcut); add; relu. use_bias=True."""
    f1, f2, f3 = filters
    c = f'res{stage}{block}_branch'
    b = f'bn{stage}{block}_branch'
    y = L.Conv2D(f1, 1, strides=strides, name=c + '2a')(x)
    y = L.BatchNormalization(name=b + '2a')(y, training=False)
    y = L.Activation('relu')(y)
    y = L.Conv2D(f2, 3, padding='same', name=c + '2b')(y)
    y = L.BatchNormalization(name=b + '2b')(y, training=False)
    y = L.Activation('relu')(y)
    y = L.Conv2D(f3, 1, name=c + '2c')(y)
    y = L.BatchNormalization(name=b + '2c')(y, training=False)
    if conv_shortcut:
        sc = L.Conv2D(f3, 1, strides=strides, name=c + '1')(x)
        sc = L.BatchNormalization(name=b + '1')(sc, training=False)
    else:
        sc = x
    return L.Activation('relu')(L.Add()([y, sc]))


def _resnet50_c5(x):
    """resnet_graph with stage5 (net.py:161-199)."""
    x = L.ZeroPadding2D((3, 3))(x)
    x = L.Conv2D(64, 7, strides=2, name='conv1', use_bias=True)(x)
    x = L.BatchNormalization(name='bn_conv1')(x, training=False)
    x = L.Activation('relu')(x)
    x = L.MaxPooling2D(3, strides=2, padding='same')(x)
    x = _bottleneck_block(x, (64, 64, 256), 2, 'a', (1, 1), True)
    for blk in 'bc':
        x = _bottleneck_block(x, (64, 64, 256), 2, blk)
    x = _bottleneck_block(x, (128, 128, 512), 3, 'a', (2, 2), True)
    for blk in 'bcd':
        x = _bottleneck_block(x, (128, 128, 512), 3, blk)
    x = _bottleneck_block(x, (256, 256, 1024), 4, 'a', (2, 2), True)
    for i in range(5):
        x = _bottleneck_block(x, (256, 256, 1024), 4, chr(98 + i))
    x = _bottleneck_block(x, (512, 512, 2048), 5, 'a', (2, 2), True)
    for blk in 'bc':
        x = _bottleneck_block(x, (512, 512, 2048), 5, blk)
    return x


def _basic_block(x, filters, stage, block, strides=(1, 1), cut='pre'):
    """residual_basic_block (net.py:216-240): ZeroPad+3x3(strided) ->
    single BN named '<base>bn2' -> relu -> ZeroPad+3x3 -> add -> relu;
    'post' cut = strided 1x1 shortcut conv; all convs bias-free."""
    base = f'stage{stage + 1}_unit{block + 1}_'
    if cut == 'post':
        sc = L.Conv2D(filters, 1, strides=strides, name=base + 'sc',
                      use_bias=False)(x)
    else:
        sc = x
    y = L.ZeroPadding2D((1, 1))(x)
    y = L.Conv2D(filters, 3, strides=strides, name=base + 'conv1',
                 use_bias=False)(y)
    y = L.BatchNormalization(name=base + 'bn2')(y, training=False)
    y = L.Activation('relu')(y)
    y = L.ZeroPadding2D((1, 1))(y)
    y = L.Conv2D(filters, 3, name=base + 'conv2', use_bias=False)(y)
    return L.Activation('relu')(L.Add()([y, sc]))


def _resnet18_c5(x):
    """resnet_shallow_graph (net.py:242-282)."""
    x = L.ZeroPadding2D((3, 3))(x)
    x = L.Conv2D(64, 7, strides=2, name='conv0', use_bias=False)(x)
    x = L.BatchNormalization(name='bn_conv0')(x, training=False)
    x = L.Activation('relu')(x)
    x = L.MaxPooling2D(3, strides=2, padding='same')(x)
    for stage, rep in enumerate([2, 2, 2, 2]):
        for block in range(rep):
            filters = 64 * (2 ** stage)
            if block == 0 and stage == 0:
                x = _basic_block(x, filters, stage, block, (1, 1), 'post')
            elif block == 0:
                x = _basic_block(x, filters, stage, block, (2, 2), 'post')
            else:
                x = _basic_block(x, filters, stage, block, (1, 1), 'pre')
    return x


def _head(x, prefix, cfg, finals):
    """build_loc_graph / build_ori_graph dense stack (net.py:288-352)."""
    for i in range(cfg.NR_DENSE_LAYERS):
        x = L.Dense(cfg.BRANCH_SIZE, name=f'{prefix}_dense_{i}')(x)
        x = L.Activation('relu')(x)
    outs = []
    for name, feats, act in finals:
        y = L.Dense(feats, activation=act, name=name)(x)
        if act == 'l2norm':  # placeholder handled below
            raise AssertionError
        outs.append(y)
    return outs


def build_reference_keras(cfg):
    """The full reference graph in Keras for cfg's head mode."""
    inp = tf.keras.Input(shape=(H, W, 3))
    c5 = _resnet50_c5(inp) if cfg.BACKBONE == 'resnet50' \
        else _resnet18_c5(inp)
    c6 = L.Conv2D(cfg.BOTTLENECK_WIDTH, 3, strides=2, padding='same',
                  name='bottleneck_layer')(c5)
    nr_features = int(cfg.BOTTLENECK_WIDTH * H * W / 64 ** 2)
    flat = L.Reshape((nr_features,))(c6)

    if cfg.REGRESS_KEYPOINTS:
        outs = _head(flat, 'loc', cfg,
                     [('k1_final', 3, 'linear'), ('k2_final', 3, 'linear'),
                      ('k3_final', 3, 'linear')])
        return tf.keras.Model(inp, outs)

    if cfg.REGRESS_LOC:
        (loc,) = _head(flat, 'loc', cfg, [('loc_final', 3, 'linear')])
    else:
        (loc,) = _head(flat, 'loc', cfg,
                       [('loc_final', cfg.LOC_BINS_PER_DIM ** 3, 'relu')])
    if cfg.REGRESS_ORI:
        if cfg.ORIENTATION_PARAM == 'quaternion':
            x = flat
            for i in range(cfg.NR_DENSE_LAYERS):
                x = L.Dense(cfg.BRANCH_SIZE, name=f'ori_dense_{i}')(x)
                x = L.Activation('relu')(x)
            q = L.Dense(4, activation='linear', name='ori_q')(x)
            ori = L.Lambda(
                lambda t: tf.math.l2_normalize(t, axis=-1))(q)
        else:
            (ori,) = _head(flat, 'ori', cfg, [('ori_final', 3, 'linear')])
    else:
        (ori,) = _head(flat, 'ori', cfg,
                       [('ori_final', cfg.ORI_BINS_PER_DIM ** 3, 'relu')])
    return tf.keras.Model(inp, [loc, ori])


# --- golden transfer machinery ----------------------------------------------

def randomize_weights(model, seed=0):
    """Non-trivial values for EVERY weight, BN moving stats included —
    defaulted stats (mean 0 / var 1) would mask epsilon and frozen-stats
    bugs."""
    rng = np.random.RandomState(seed)
    for v in model.weights:
        shape = tuple(v.shape)
        n = v.name  # e.g. 'conv1/kernel:0' or plain 'kernel' in Keras 3
        if 'moving_variance' in n:
            val = rng.uniform(0.5, 2.0, shape)
        elif 'moving_mean' in n:
            val = rng.normal(0.0, 0.5, shape)
        elif 'gamma' in n:
            val = rng.uniform(0.5, 1.5, shape)
        elif 'beta' in n or 'bias' in n:
            val = rng.normal(0.0, 0.1, shape)
        else:  # conv/dense kernels
            val = rng.normal(0.0, 0.05, shape)
        v.assign(val.astype(np.float32))


_BN_ORDER = ('gamma', 'beta', 'moving_mean', 'moving_variance')


def export_keras2_h5(model, path):
    """Write the model weights in the legacy Keras-2 HDF5 layout the
    released UrsoNet/ImageNet files use (layer groups + weight_names
    attrs) — Keras 3 no longer writes it natively."""
    import h5py
    with h5py.File(path, 'w') as f:
        layer_names = []
        for layer in model.layers:
            ws = layer.get_weights()
            if not ws:
                continue
            if isinstance(layer, L.BatchNormalization):
                leaves = _BN_ORDER
            elif len(ws) == 2:
                leaves = ('kernel', 'bias')
            else:
                leaves = ('kernel',)
            g = f.create_group(layer.name)
            wnames = []
            for leaf, arr in zip(leaves, ws):
                wname = f'{layer.name}/{leaf}:0'
                g.create_dataset(wname, data=arr.astype(np.float32))
                wnames.append(wname.encode())
            g.attrs['weight_names'] = wnames
            layer_names.append(layer.name.encode())
        f.attrs['layer_names'] = layer_names
    return path


def make_config(**over):
    cfg = Config()
    cfg.BACKBONE = 'resnet50'
    cfg.BOTTLENECK_WIDTH = 8
    cfg.BRANCH_SIZE = 32
    cfg.NR_DENSE_LAYERS = 1
    cfg.IMAGE_RESIZE_MODE = 'square'
    cfg.IMAGE_MIN_DIM = cfg.IMAGE_MAX_DIM = H
    cfg.IMAGES_PER_GPU = 2
    cfg.TRAIN_BN = False
    for k, v in over.items():
        setattr(cfg, k, v)
    cfg.update()
    return cfg


def assert_golden(cfg, tmp_path, seed=0, tol=1e-4):
    keras_model = build_reference_keras(cfg)
    randomize_weights(keras_model, seed)
    path = str(tmp_path / 'golden.h5')
    export_keras2_h5(keras_model, path)

    model = build_model(cfg)
    import flax.linen as nn
    variables = nn.unbox(model.init(
        jax.random.PRNGKey(7), np.zeros((1, H, W, 3), np.float32),
        training=False))
    params, stats, report = load_keras_h5(
        path, variables['params'], variables['batch_stats'])
    assert not report['mismatched'], report['mismatched']
    assert not report['unmatched'], report['unmatched']

    rng = np.random.RandomState(seed + 1)
    images = rng.uniform(-120, 120, (2, H, W, 3)).astype(np.float32)

    keras_out = keras_model(images, training=False)
    if not isinstance(keras_out, (list, tuple)):
        keras_out = [keras_out]
    keras_out = [np.asarray(t) for t in keras_out]

    flax_out = model.apply({'params': params, 'batch_stats': stats},
                           images, training=False)
    if cfg.REGRESS_KEYPOINTS:
        ours = [flax_out['loc'], flax_out['k1'], flax_out['k2']]
    else:
        ours = [flax_out['loc'], flax_out['ori']]

    assert len(ours) == len(keras_out)
    for k_arr, f_arr in zip(keras_out, ours):
        denom = np.maximum(np.abs(k_arr), 1.0)
        err = np.max(np.abs(np.asarray(f_arr) - k_arr) / denom)
        assert err <= tol, f'forward mismatch: rel-err {err}'


# --- the four head modes + both backbone families ---------------------------

def test_golden_resnet50_regression_quaternion(tmp_path):
    cfg = make_config(REGRESS_LOC=True, REGRESS_ORI=True,
                      ORIENTATION_PARAM='quaternion')
    assert_golden(cfg, tmp_path)


def test_golden_resnet18_classification(tmp_path):
    cfg = make_config(BACKBONE='resnet18', REGRESS_LOC=False,
                      REGRESS_ORI=False, LOC_BINS_PER_DIM=4,
                      ORI_BINS_PER_DIM=4)
    assert_golden(cfg, tmp_path, seed=1)


def test_golden_resnet18_euler(tmp_path):
    cfg = make_config(BACKBONE='resnet18', REGRESS_LOC=True,
                      REGRESS_ORI=True, ORIENTATION_PARAM='euler_angles')
    assert_golden(cfg, tmp_path, seed=2)


def test_golden_resnet18_keypoints(tmp_path):
    cfg = make_config(BACKBONE='resnet18', REGRESS_LOC=True,
                      REGRESS_KEYPOINTS=True)
    assert_golden(cfg, tmp_path, seed=3)


def test_golden_resnet50_stem_s2d_matches_keras(tmp_path):
    """The space-to-depth stem rewrite must still match the reference
    7x7/2 Keras stem bit-for-bit in function (h5 kernels are remapped by
    stem_kernel_to_s2d on import)."""
    cfg = make_config(REGRESS_LOC=True, REGRESS_ORI=True,
                      ORIENTATION_PARAM='quaternion',
                      STEM_SPACE_TO_DEPTH=True)
    assert_golden(cfg, tmp_path, seed=4)
