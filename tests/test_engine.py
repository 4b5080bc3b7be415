"""Engine tests: train loop, checkpoint/resume contract, h5 import,
inference — the L4 layer (SURVEY.md §2 #18-21, §5.3/5.4)."""

import glob
import json
import os

import numpy as np
import pytest

from ursonet_tpu.config import Config
from ursonet_tpu.data.synthetic import make_urso_dataset
from ursonet_tpu.data.urso import Urso
from ursonet_tpu.engine import UrsoNet


class TinyConfig(Config):
    NAME = 'tiny'
    BACKBONE = 'resnet18'
    BOTTLENECK_WIDTH = 8
    BRANCH_SIZE = 16
    IMAGE_RESIZE_MODE = 'square'
    IMAGE_MAX_DIM = 64
    IMAGE_MIN_DIM = 64
    IMAGES_PER_GPU = 2
    STEPS_PER_EPOCH = 3
    VALIDATION_STEPS = 1
    ROT_AUG = False
    SIM2REAL_AUG = False


@pytest.fixture(scope='module')
def urso_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp('urso')
    make_urso_dataset(str(d), subsets=('train', 'val', 'test'),
                      n_per_subset=8, width=96, height=72)
    return str(d)


def _load(urso_dir, cfg, subset):
    ds = Urso()
    ds.load_dataset(urso_dir, cfg, subset)
    return ds


def test_train_checkpoint_resume_detect(urso_dir, tmp_path):
    cfg = TinyConfig()
    model_dir = str(tmp_path / 'logs')
    train_ds = _load(urso_dir, cfg, 'train')
    val_ds = _load(urso_dir, cfg, 'val')

    engine = UrsoNet('training', cfg, model_dir)
    engine.initialize()
    engine.quantize()  # training must invalidate this stale serving model
    means = engine.train(train_ds, val_ds, cfg.LEARNING_RATE, epochs=2,
                         layers='all', log_fn=lambda *a: None)
    assert engine._qmodel is None
    assert 'loss' in means and np.isfinite(means['loss'])
    assert 'val_loss' in means

    # Per-epoch snapshots + metrics JSONL + config dump exist.
    snaps = sorted(glob.glob(os.path.join(engine.log_dir, 'weights_*')))
    assert len(snaps) == 2
    with open(os.path.join(engine.log_dir, 'metrics.jsonl')) as f:
        records = [json.loads(l) for l in f]
    assert [r['epoch'] for r in records] == [0, 1]
    assert glob.glob(os.path.join(engine.log_dir, 'config_*.json'))

    # find_last discovers the newest snapshot; loading parses the epoch.
    engine2 = UrsoNet('training', cfg, model_dir)
    last = engine2.find_last()
    assert last == snaps[-1]
    engine2.load_weights(last)
    assert engine2.epoch == 2
    p1 = np.asarray(engine.state.params['bottleneck_layer']['kernel'])
    p2 = np.asarray(engine2.state.params['bottleneck_layer']['kernel'])
    np.testing.assert_array_equal(p1, p2)

    # Exact resume restores optimizer state + step counter.
    engine3 = UrsoNet('training', cfg, model_dir)
    engine3.initialize()
    assert engine3.resume_state(engine.log_dir)
    assert int(engine3.state.step) == int(engine.state.step)
    assert engine3.epoch == 2
    v1 = np.asarray(engine.state.opt_state[1].velocity[
        'bottleneck_layer']['kernel'])
    v3 = np.asarray(engine3.state.opt_state[1].velocity[
        'bottleneck_layer']['kernel'])
    np.testing.assert_allclose(v1, v3)

    # Inference path: detect on BATCH_SIZE raw images.
    test_ds = _load(urso_dir, cfg, 'test')
    imgs = [test_ds.load_image(i) for i in range(cfg.BATCH_SIZE)]
    results = engine2.detect(imgs)
    assert len(results) == cfg.BATCH_SIZE
    assert results[0]['loc'].shape == (3,)
    assert results[0]['ori'].shape == (4,)
    np.testing.assert_allclose(np.linalg.norm(results[0]['ori']), 1.0,
                               rtol=1e-5)


def test_partial_load_with_exclusion(urso_dir, tmp_path):
    cfg = TinyConfig()
    engine = UrsoNet('training', cfg, str(tmp_path / 'logs'))
    engine.initialize()
    wpath = str(tmp_path / 'w.msgpack')
    engine.save_weights(wpath)

    # Fresh engine with different head config: excluded layers keep their
    # fresh values, backbone layers load.
    cfg2 = TinyConfig()
    engine2 = UrsoNet('training', cfg2, str(tmp_path / 'logs2'))
    engine2.initialize()
    fresh_head = np.asarray(
        engine2.state.params['ori_head']['ori_q']['kernel']).copy()
    engine2.load_weights(wpath, exclude=[r'ori_.*', r'loc_.*'])
    bb1 = np.asarray(
        engine.state.params['backbone']['conv0']['kernel'])
    bb2 = np.asarray(
        engine2.state.params['backbone']['conv0']['kernel'])
    np.testing.assert_array_equal(bb1, bb2)
    head2 = np.asarray(engine2.state.params['ori_head']['ori_q']['kernel'])
    np.testing.assert_array_equal(fresh_head, head2)

    # loading weights invalidates a previously built quantized model
    engine2.quantize()
    assert engine2._qmodel is not None
    engine2.load_weights(wpath)
    assert engine2._qmodel is None


def test_h5_import_by_name(tmp_path):
    """A synthetic Keras-layout h5 maps into the Flax tree by layer name,
    incl. BN gamma/beta/moving stats split across params/batch_stats."""
    import h5py
    import jax

    from ursonet_tpu.checkpoint.h5_import import load_keras_h5
    from ursonet_tpu.models.ursonet import build_model

    cfg = TinyConfig()
    model = build_model(cfg)
    import flax.linen as nn
    import jax.numpy as jnp
    variables = nn.unbox(model.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3)),
                                    training=False))
    params = jax.device_get(variables['params'])
    stats = jax.device_get(variables['batch_stats'])

    kshape = np.shape(params['backbone']['conv0']['kernel'])
    kval = np.random.RandomState(0).randn(*kshape).astype('f4')
    gshape = np.shape(params['backbone']['bn_conv0']['bn']['scale'])
    gval = np.arange(gshape[0]).astype('f4')

    path = str(tmp_path / 'ref.h5')
    with h5py.File(path, 'w') as f:
        f.attrs['layer_names'] = [b'conv0', b'bn_conv0', b'fpn_nope']
        g = f.create_group('conv0')
        g.attrs['weight_names'] = [b'conv0/kernel:0']
        g.create_dataset('conv0/kernel:0', data=kval)
        g = f.create_group('bn_conv0')
        g.attrs['weight_names'] = [b'bn_conv0/gamma:0',
                                   b'bn_conv0/moving_mean:0']
        g.create_dataset('bn_conv0/gamma:0', data=gval)
        g.create_dataset('bn_conv0/moving_mean:0', data=gval * 2.0)
        g = f.create_group('fpn_nope')
        g.attrs['weight_names'] = [b'fpn_nope/kernel:0']
        g.create_dataset('fpn_nope/kernel:0', data=np.zeros((2, 2), 'f4'))

    new_params, new_stats, report = load_keras_h5(path, params, stats)
    np.testing.assert_array_equal(
        new_params['backbone']['conv0']['kernel'], kval)
    np.testing.assert_array_equal(
        new_params['backbone']['bn_conv0']['bn']['scale'], gval)
    np.testing.assert_array_equal(
        new_stats['backbone']['bn_conv0']['bn']['mean'], gval * 2.0)
    assert any('fpn_nope' in u for u in report['unmatched'])
    assert len(report['mismatched']) == 0

    excl, _, rep2 = load_keras_h5(path, params, stats, exclude=[r'conv0'])
    assert any('conv0/kernel' in e for e in rep2['excluded'])


def test_orbax_checkpoint_roundtrip(urso_dir, tmp_path):
    """CHECKPOINT_FORMAT='orbax': per-epoch directory snapshots are
    discovered by find_last and restore identically; exact resume works."""
    cfg = TinyConfig()
    cfg.CHECKPOINT_FORMAT = 'orbax'
    model_dir = str(tmp_path / 'logs')
    train_ds = _load(urso_dir, cfg, 'train')

    engine = UrsoNet('training', cfg, model_dir)
    engine.initialize()
    engine.train(train_ds, None, cfg.LEARNING_RATE, epochs=1,
                 layers='all', log_fn=lambda *a: None)
    snaps = glob.glob(os.path.join(engine.log_dir, 'weights_*.orbax'))
    assert len(snaps) == 1 and os.path.isdir(snaps[0])

    engine2 = UrsoNet('training', cfg, model_dir)
    last = engine2.find_last()
    assert last.endswith('.orbax')
    engine2.load_weights(last)
    assert engine2.epoch == 1
    p1 = np.asarray(engine.state.params['bottleneck_layer']['kernel'])
    p2 = np.asarray(engine2.state.params['bottleneck_layer']['kernel'])
    np.testing.assert_array_equal(p1, p2)

    engine3 = UrsoNet('training', cfg, model_dir)
    engine3.initialize()
    assert engine3.resume_state(engine.log_dir)
    assert int(engine3.state.step) == int(engine.state.step)


def test_h5_export_import_roundtrip(tmp_path):
    """save_keras_h5 -> load_keras_h5 reproduces every param and BN stat
    (weights round-trip with the reference's h5 format)."""
    import jax
    import flax.linen as nn
    import jax.numpy as jnp

    from ursonet_tpu.checkpoint.h5_import import (load_keras_h5,
                                                  save_keras_h5)
    from ursonet_tpu.models.ursonet import build_model

    for backbone in ('resnet18', 'resnet50'):
        cfg = TinyConfig()
        cfg.BACKBONE = backbone
        cfg.update()
        model = build_model(cfg)
        v = nn.unbox(model.init(jax.random.PRNGKey(1),
                                jnp.zeros((1, 64, 64, 3)), training=False))
        params = jax.tree.map(np.asarray, v['params'])
        stats = jax.tree.map(
            lambda a: a + 0.1 * np.random.RandomState(2)
            .rand(*a.shape).astype(a.dtype), v['batch_stats'])

        path = str(tmp_path / f'{backbone}.h5')
        save_keras_h5(path, params, stats)

        v2 = nn.unbox(model.init(jax.random.PRNGKey(99),
                                 jnp.zeros((1, 64, 64, 3)),
                                 training=False))
        p2, s2, report = load_keras_h5(
            path, jax.tree.map(np.asarray, v2['params']),
            jax.tree.map(np.asarray, v2['batch_stats']))
        assert not report['mismatched']
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(stats), jax.tree.leaves(s2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_use_resident_knobs(urso_dir):
    from ursonet_tpu.data import loader as L

    cfg = TinyConfig()
    cfg.update()
    ds = _load(urso_dir, cfg, 'train')
    assert L.use_resident(ds, cfg)  # 'auto' + tiny dataset
    cfg.DATA_ON_DEVICE = False
    assert not L.use_resident(ds, cfg)
    cfg.DATA_ON_DEVICE = 'auto'
    cfg.DATA_ON_DEVICE_MAX_MB = 0
    assert not L.use_resident(ds, cfg)
    cfg.DATA_ON_DEVICE = True
    cfg.AUGMENT_ON_DEVICE = False  # host-parity path cannot be resident
    assert not L.use_resident(ds, cfg)


def test_resident_step_matches_streaming(urso_dir):
    """The device-resident train step (on-device index gather) must
    produce the same update as the streaming step fed the identical
    batch and key."""
    import jax
    import jax.numpy as jnp

    from ursonet_tpu import parallel
    from ursonet_tpu.data import loader as L
    from ursonet_tpu.models.ursonet import build_model
    from ursonet_tpu.train.optim import make_optimizer
    from ursonet_tpu.train.state import create_train_state
    from ursonet_tpu.train.step import (make_resident_train_step,
                                        make_train_step)

    cfg = TinyConfig()
    cfg.update()
    ds = _load(urso_dir, cfg, 'train')
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    mesh = parallel.make_mesh(cfg)
    pre = L.make_device_preprocess(cfg, ds)
    data, n = L.load_dataset_resident(ds, cfg, mesh)
    assert n == len(ds.image_ids)

    host = {k: np.asarray(v) for k, v in data.items()}
    imgs = host['images_u8'][:cfg.BATCH_SIZE].astype(np.float32)

    def fresh_state():
        return create_train_state(model, cfg, tx, mesh,
                                  jax.random.PRNGKey(0), jnp.asarray(imgs))

    base_key = jax.random.PRNGKey(99)
    perm = jnp.arange(n)
    rstep = make_resident_train_step(model, cfg, tx, n, preprocess=pre)
    sstep = make_train_step(model, cfg, tx, preprocess=pre)
    with mesh:
        s1 = fresh_state()
        step0 = int(s1.step)
        s1, i1, m1 = rstep(s1, data, perm, jnp.zeros((), jnp.int32),
                           base_key)
        assert int(i1) == 1
        s2 = fresh_state()
        batch = {k: jnp.asarray(v[:cfg.BATCH_SIZE])
                 for k, v in host.items()}
        s2, m2 = sstep(s2, batch, jax.random.fold_in(base_key, step0))
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_resident_training_via_engine(urso_dir, tmp_path):
    """engine.train with DATA_ON_DEVICE forced on: loss finite, val runs,
    resident banner logged."""
    cfg = TinyConfig()
    cfg.DATA_ON_DEVICE = True
    model_dir = str(tmp_path / 'logs_res')
    train_ds = _load(urso_dir, cfg, 'train')
    val_ds = _load(urso_dir, cfg, 'val')
    lines = []
    engine = UrsoNet('training', cfg, model_dir)
    engine.initialize()
    means = engine.train(train_ds, val_ds, cfg.LEARNING_RATE, epochs=1,
                         layers='all', log_fn=lines.append)
    assert any('device-resident' in l for l in lines)
    assert np.isfinite(means['loss']) and 'val_loss' in means
