"""Skip-unless-present tests for REAL released artifacts and datasets
(VERDICT r2 #6: turnkey ingestion).

This environment has zero egress, so these skip by default. Drop the
files into models/ and datasets/ (layout: tools/verify_artifacts.py
docstring) and they activate with no code changes:

  * released UrsoNet .h5 (reference net.py:886-940): config check,
    by-name Keras import, one forward, finite outputs
  * COCO / ImageNet transfer sources (net.py:854-884): partial by-name
    load with head exclusion
  * real URSO / SPEED datasets: adapter load + one image decode + a
    1-step training run through the engine
"""

import os
import sys

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_MODELS = os.path.join(_ROOT, 'models')
_DATA = os.path.join(_ROOT, 'datasets')
sys.path.insert(0, os.path.join(_ROOT, 'tools'))


def _released(key):
    from ursonet_tpu.checkpoint.h5_import import find_released_file
    return find_released_file(_MODELS, key)


def _skip_unless(path, what):
    if not path or not os.path.exists(path):
        pytest.skip(f'{what} not present (see tools/verify_artifacts.py)')
    return path


@pytest.mark.parametrize('key', ['soyuz_hard', 'dragon_hard',
                                 'speed_528_32', 'speed_800_64'])
def test_released_ursonet_weights_forward(key):
    """Released-config assert + h5 import + forward (the reference's
    released-weight workflow, pose_estimator.py:884-913)."""
    _skip_unless(_released(key), f'released weights {key}')
    from verify_artifacts import _smoke_load
    note = _smoke_load(key, _released(key))
    assert 'forward ok' in note


def test_coco_transfer_load():
    path = _skip_unless(_released('coco'), 'mask_rcnn_coco.h5')
    from ursonet_tpu.checkpoint.h5_import import load_keras_h5
    from ursonet_tpu.config import Config
    from ursonet_tpu.models.ursonet import build_model
    import flax.linen as nn
    import jax

    config = Config()
    config.BACKBONE = 'resnet50'
    config.IMAGE_RESIZE_MODE = 'none'
    config.IMAGE_MIN_DIM = config.IMAGE_MAX_DIM = 128
    config.update()
    model = build_model(config)
    v = nn.unbox(model.init(jax.random.PRNGKey(0),
                            np.zeros((1, 128, 128, 3), np.float32),
                            training=False))
    params, batch_stats, report = load_keras_h5(
        path, jax.device_get(v['params']),
        jax.device_get(v['batch_stats']),
        exclude=["mrcnn_class_logits", "mrcnn_bbox_fc", "mrcnn_bbox",
                 "mrcnn_mask"])
    assert report['loaded'], 'no layers matched the COCO h5'


@pytest.mark.parametrize('backbone', ['resnet50', 'resnet18', 'resnet34'])
def test_imagenet_backbone_load(backbone):
    path = _skip_unless(_released(f'imagenet_{backbone}'),
                        f'ImageNet {backbone} weights')
    from verify_artifacts import _smoke_load
    assert 'forward ok' in _smoke_load(f'imagenet_{backbone}', path)


def _first_present_urso():
    for name in ('soyuz_easy', 'soyuz_hard', 'dragon_easy', 'dragon_hard'):
        d = os.path.join(_DATA, name)
        if os.path.exists(os.path.join(d, 'train_images.csv')):
            return d
    return None


def test_real_urso_dataset_loads_and_trains():
    d = _skip_unless(_first_present_urso(), 'a real URSO dataset')
    from ursonet_tpu.config import Config
    from ursonet_tpu.data.urso import Urso
    from ursonet_tpu.engine import UrsoNet

    cfg = Config()
    cfg.NAME = 'realurso'
    cfg.BACKBONE = 'resnet18'
    cfg.BOTTLENECK_WIDTH = 16
    cfg.BRANCH_SIZE = 32
    cfg.IMAGE_RESIZE_MODE = 'square'
    cfg.IMAGE_MIN_DIM = cfg.IMAGE_MAX_DIM = 128
    cfg.IMAGES_PER_GPU = 2
    cfg.STEPS_PER_EPOCH = 2
    cfg.VALIDATION_STEPS = 1
    cfg.REGRESS_ORI = True
    cfg.ORIENTATION_PARAM = 'quaternion'
    cfg.update()
    ds = Urso()
    ds.load_dataset(d, cfg, 'train')
    assert ds.num_images > 0
    img = ds.load_image(int(ds.image_ids[0]))
    assert img.ndim == 3 and img.shape[2] == 3  # RGBA/gray normalized

    engine = UrsoNet('training', cfg, '/tmp/real_urso_logs')
    engine.initialize(seed=0)
    means = engine.train(ds, None, cfg.LEARNING_RATE, epochs=1,
                         layers='all', log_fn=lambda *a: None)
    assert np.isfinite(means['loss'])


def test_real_speed_dataset_loads():
    d = os.path.join(_DATA, 'speed')
    _skip_unless(os.path.join(d, 'train.json')
                 if os.path.isdir(d) else None, 'the real SPEED dataset')
    from ursonet_tpu.config import Config
    from ursonet_tpu.data.speed import Speed

    cfg = Config()
    cfg.REGRESS_ORI = True
    cfg.update()
    ds = Speed()
    ds.load_dataset(d, cfg, 'train')
    assert ds.num_images > 0
    img = ds.load_image(int(ds.image_ids[0]))
    assert img.ndim == 3 and img.shape[2] == 3  # grayscale -> RGB


def test_find_released_file_resolution(tmp_path):
    """Always-run: the resolver finds canonical reference filenames AND
    this repo's short aliases, preferring the canonical name."""
    from ursonet_tpu.checkpoint.h5_import import find_released_file

    assert find_released_file(str(tmp_path), 'soyuz_hard') is None
    (tmp_path / 'ursonet_soyuz_hard.h5').touch()
    assert find_released_file(str(tmp_path), 'soyuz_hard').endswith(
        'ursonet_soyuz_hard.h5')
    (tmp_path / 'resnet50_soyuz_hard_128_24.h5').touch()
    assert find_released_file(str(tmp_path), 'soyuz_hard').endswith(
        'resnet50_soyuz_hard_128_24.h5')
    (tmp_path / 'imagenet_resnet18.h5').touch()
    assert find_released_file(str(tmp_path), 'imagenet_resnet18').endswith(
        'imagenet_resnet18.h5')
    assert find_released_file(str(tmp_path), 'coco') is None
