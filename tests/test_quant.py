"""int8 PTQ serving path (models/quant.py).

The float twin must reproduce UrsoNetModule exactly (BN-folded), and the
int8 pass must stay numerically close to the float pass — that is the
accuracy contract of the serving mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from ursonet_tpu.config import Config
from ursonet_tpu.models.quant import QuantizedModel
from ursonet_tpu.models.ursonet import build_model


def _make(backbone='resnet18', regress_loc=True, regress_ori=True,
          ori_param='quaternion', keypoints=False, h=64, w=64):
    config = Config()
    config.BACKBONE = backbone
    config.BOTTLENECK_WIDTH = 32
    config.BRANCH_SIZE = 64
    config.NR_DENSE_LAYERS = 1
    config.REGRESS_LOC = regress_loc
    config.REGRESS_ORI = regress_ori
    config.REGRESS_KEYPOINTS = keypoints
    config.ORIENTATION_PARAM = ori_param
    config.ORI_BINS_PER_DIM = 4
    config.LOC_BINS_PER_DIM = 4
    config.IMAGE_RESIZE_MODE = 'none'
    config.IMAGE_MIN_DIM = h
    config.IMAGE_MAX_DIM = w
    config.IMAGES_PER_GPU = 2
    config.update()
    model = build_model(config)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, 3)) * 60.0
    variables = nn.unbox(model.init(jax.random.PRNGKey(0), imgs,
                                    training=False))
    return config, model, variables, imgs


@pytest.mark.parametrize('backbone', ['resnet18', 'resnet50'])
def test_float_twin_matches_model(backbone):
    config, model, variables, imgs = _make(backbone)
    ref = model.apply(variables, imgs, training=False)
    qm = QuantizedModel.from_variables(
        config, variables['params'], variables['batch_stats'])
    twin = qm.float_twin(imgs)
    assert set(twin) == set(ref)
    for k in ref:
        np.testing.assert_allclose(np.asarray(twin[k]), np.asarray(ref[k]),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize('mode', ['classification', 'quaternion',
                                  'euler_angles', 'keypoints'])
def test_float_twin_head_modes(mode):
    kw = dict(backbone='resnet18')
    if mode == 'classification':
        kw.update(regress_loc=False, regress_ori=False)
    elif mode == 'keypoints':
        kw.update(keypoints=True)
    elif mode == 'euler_angles':
        kw.update(ori_param='euler_angles')
    config, model, variables, imgs = _make(**kw)
    ref = model.apply(variables, imgs, training=False)
    qm = QuantizedModel.from_variables(
        config, variables['params'], variables['batch_stats'])
    twin = qm.float_twin(imgs)
    for k in ref:
        np.testing.assert_allclose(np.asarray(twin[k]), np.asarray(ref[k]),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize('backbone,mode', [
    ('resnet18', 'regression'), ('resnet50', 'regression'),
    ('resnet18', 'classification')])
def test_int8_close_to_float(backbone, mode):
    kw = {} if mode == 'regression' \
        else dict(regress_loc=False, regress_ori=False)
    config, model, variables, imgs = _make(backbone, **kw)
    qm = QuantizedModel.from_variables(
        config, variables['params'], variables['batch_stats'])
    ref = {k: np.asarray(v) for k, v in qm.float_twin(imgs).items()}
    qm.calibrate(imgs)
    out = {k: np.asarray(v) for k, v in qm(imgs).items()}
    for k in ref:
        denom = np.linalg.norm(ref[k]) + 1e-9
        rel = np.linalg.norm(out[k] - ref[k]) / denom
        assert rel < 0.15, f'{k}: relative L2 error {rel:.3f}'


def test_calibrate_running_max():
    config, model, variables, imgs = _make('resnet18')
    qm = QuantizedModel.from_variables(
        config, variables['params'], variables['batch_stats'])
    s1 = dict(qm.calibrate(imgs))
    s2 = qm.calibrate(imgs * 2.0)  # larger inputs -> scales only grow
    assert all(s2[k] >= s1[k] - 1e-6 for k in s1)


def test_quant_requires_calibration():
    config, model, variables, imgs = _make('resnet18')
    qm = QuantizedModel.from_variables(
        config, variables['params'], variables['batch_stats'])
    with pytest.raises(RuntimeError):
        qm(imgs)


@pytest.mark.parametrize('mode', ['regression', 'classification'])
def test_quant_store_roundtrip(tmp_path, mode):
    kw = {} if mode == 'regression' \
        else dict(regress_loc=False, regress_ori=False)
    config, model, variables, imgs = _make('resnet18', **kw)
    from ursonet_tpu.checkpoint.quant_store import load_quantized, \
        save_quantized
    qm = QuantizedModel.from_variables(
        config, variables['params'], variables['batch_stats'])
    qm.calibrate(imgs)
    ref = {k: np.asarray(v) for k, v in qm(imgs).items()}
    path = str(tmp_path / 'model_int8.msgpack')
    save_quantized(path, qm)
    qm2 = load_quantized(path, config)
    out = {k: np.asarray(v) for k, v in qm2(imgs).items()}
    for k in ref:  # int8-kernel storage pins the exact quantized weights
        rel = (np.linalg.norm(out[k] - ref[k])
               / (np.linalg.norm(ref[k]) + 1e-9))
        assert rel < 1e-5, f'{k}: {rel}'
    # config mismatch is rejected
    config.BACKBONE = 'resnet50'
    with pytest.raises(ValueError):
        load_quantized(path, config)


def test_quant_store_requires_calibration(tmp_path):
    config, model, variables, imgs = _make('resnet18')
    from ursonet_tpu.checkpoint.quant_store import save_quantized
    qm = QuantizedModel.from_variables(
        config, variables['params'], variables['batch_stats'])
    with pytest.raises(ValueError):
        save_quantized(str(tmp_path / 'x.msgpack'), qm)


def test_quant_rejects_train_bn():
    config, model, variables, imgs = _make('resnet18')
    config.TRAIN_BN = True
    with pytest.raises(NotImplementedError):
        QuantizedModel.from_variables(
            config, variables['params'], variables['batch_stats'])


def test_calibration_on_zero_activations_is_safe():
    """A site calibrating to max|x| == 0 (e.g. all-black batch) must not
    divide by zero — outputs stay finite (bias-only), never NaN."""
    config, model, variables, imgs = _make('resnet18')
    qm = QuantizedModel.from_variables(
        config, variables['params'], variables['batch_stats'])
    zeros = jnp.zeros_like(imgs)
    qm.calibrate(zeros)
    out = qm(zeros)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
