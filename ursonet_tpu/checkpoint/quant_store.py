"""Quantized-serving artifact: save/load a calibrated int8 model.

Stores, per conv/dense site, the ALREADY-QUANTIZED int8 kernel with its
per-channel f32 scale and f32 bias, plus the calibrated activation
scales — so a serving process loads and runs the int8 path
(models/quant.py) without re-folding BN or re-running calibration, and
the artifact pins the exact int8 weights (requantization of the
dequantized kernel reproduces them bit-for-bit: every channel's max
|w8| is 127 by construction, so the recomputed scale equals the stored
one). Sites that execute in FLOAT at serving time (the final head
denses, models/quant.py dense_final) store f32 kernels — tiny and
accuracy-critical. File size ≈ 1 byte/backbone-weight.

No reference counterpart (the reference serves f16 Keras h5 weights,
net.py:589-593); this is the serving-deployment format of the
TPU framework.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
from flax import serialization

from ursonet_tpu.checkpoint.store import _atomic_write


def save_quantized(path: str, qmodel, float_dtype=np.float32) -> None:
    """Write a calibrated QuantizedModel to `path` (msgpack, atomic).

    float_dtype: storage dtype for the FLOAT sites' kernels (the final
    head denses). np.float16 halves flagship-scale artifacts; the loader
    upcasts to f32, and under F16 serving the compute dtype (bf16) is
    coarser than the f16 storage rounding anyway."""
    from ursonet_tpu.models.quant import float_sites, quantize_weight
    if qmodel.act_scales is None:
        raise ValueError('calibrate() the model before saving')
    fsites = float_sites(qmodel._mcfg)
    flat_out = {}
    for site, (w, b) in qmodel.flat.items():
        w = np.asarray(w, np.float32)
        b = np.asarray(b, np.float32)
        if site in fsites:
            flat_out[site] = {'kernel': w.astype(float_dtype), 'bias': b}
        else:  # the exact scheme Int8Ops applies at serving time
            w8, sw = quantize_weight(w)
            flat_out[site] = {'kernel_q': w8, 'scale': sw, 'bias': b}
    tree = {
        'format': 'ursonet-int8-ptq-v1',
        'mcfg': {k: list(v) if isinstance(v, tuple) else v
                 for k, v in qmodel._mcfg.items()},  # msgpack: no tuples
        'act_scales': {k: np.float32(v)
                       for k, v in qmodel.act_scales.items()},
        'flat': flat_out,
    }
    if getattr(qmodel, 'bias_delta', None):
        # bias_correct() corrections — int8-path-only additive bias
        # terms; kept OUT of 'flat' so the float twin stays the
        # uncorrected reference at load time (models/quant.py)
        tree['bias_delta'] = {k: np.asarray(v, np.float32)
                              for k, v in qmodel.bias_delta.items()}
    _atomic_write(path, serialization.msgpack_serialize(tree))


def load_quantized(path: str, config):
    """Load a serving artifact saved by save_quantized; returns a ready
    (calibrated) QuantizedModel."""
    from ursonet_tpu.models.quant import QuantizedModel
    with open(path, 'rb') as f:
        tree = serialization.msgpack_restore(f.read())
    if tree.get('format') != 'ursonet-int8-ptq-v1':
        raise ValueError(f'not an int8-PTQ artifact: {path}')
    mcfg = tree['mcfg']
    _missing = object()

    def _norm(v):
        if isinstance(v, (list, tuple, np.ndarray)):
            return tuple(float(x) for x in v)
        return v

    for key, val in mcfg.items():
        ckey = _CONFIG_KEYS.get(key)
        if ckey is None:
            # informational mcfg entries with no config counterpart —
            # e.g. 'stem_s2d' is derived from the stored stem kernel's
            # shape at reconstruction (models/quant.py), never from a
            # config knob
            continue
        want = getattr(config, ckey, _missing)
        want, val = (_norm(want), _norm(val)) if want is not _missing \
            else (want, val)
        if want is _missing:
            # A config that cannot even express the knob would fail
            # later (or decode wrongly) — fail fast at load instead.
            raise ValueError(
                f'artifact/config mismatch: config has no '
                f'{ckey} (artifact {key}={val!r})')
        if want != val:
            raise ValueError(
                f'artifact/config mismatch on {key}: {val!r} != {want!r}')
    flat = {}
    for site, node in tree['flat'].items():
        b = np.asarray(node['bias'], np.float32)
        if 'kernel_q' in node:
            # dequantize; Int8Ops re-quantizes this exactly (see module
            # docstring)
            w = (np.asarray(node['kernel_q'], np.float32)
                 * np.asarray(node['scale'], np.float32))
        else:
            w = np.asarray(node['kernel'], np.float32)
        flat[site] = (w, b)
    qm = QuantizedModel(config, flat)
    qm.act_scales = {k: float(v) for k, v in tree['act_scales'].items()}
    if 'bias_delta' in tree:
        qm.bias_delta = {k: np.asarray(v, np.float32)
                         for k, v in tree['bias_delta'].items()}
    return qm


_CONFIG_KEYS: Dict[str, str] = {
    'backbone': 'BACKBONE',
    'nr_dense_layers': 'NR_DENSE_LAYERS',
    'regress_loc': 'REGRESS_LOC',
    'regress_ori': 'REGRESS_ORI',
    'regress_keypoints': 'REGRESS_KEYPOINTS',
    'orientation_param': 'ORIENTATION_PARAM',
    'loc_bins': 'LOC_BINS_PER_DIM',
    'ori_bins': 'ORI_BINS_PER_DIM',
    'mean_pixel': 'MEAN_PIXEL',
    'bf16_stem': 'QUANT_BF16_STEM',
    # artifacts record whether the classification finals were
    # calibrated as float sites; loading with a mismatched config
    # would leave their requant scales missing (or stale)
    'float_cls_final': 'QUANT_FLOAT_CLS_FINAL',
    # same for the float metric-regression heads (round 5)
    'float_reg_head': 'QUANT_FLOAT_REG_HEAD',
}
