"""Post-training int8 quantization (PTQ) for serving.

TPU-native serving-path optimization with no reference counterpart (the
reference's fastest inference mode is Keras f16, net.py:589-593). The
UrsoNet forward at the flagship shape is MXU+HBM bound; int8 halves the
HBM traffic of every convolution AND runs the 3x3 convs at the v5e
double-rate int8 MXU mode (~230 TOPS, 1.55-1.6x the bf16 rate — PERF.md
round-2 roofline), measuring 1.8x end-to-end over bf16 serving.

Scheme (standard symmetric PTQ):
  * weights   per-output-channel int8:  s_w[o] = max|W[..,o]| / 127
  * activations per-tensor int8, calibrated: s_x = max|x| / 127 over a
    calibration batch (max-abs observer)
  * conv/dense: int8 x int8 -> int32, dequantized in the epilogue as
    y = acc * (s_x*s_w) + b; residual adds and ReLU in float; the next
    site's quantize fuses into the same epilogue (one int8 store).

The same *twin* graph function drives three phases through an ops
object — a float reference (`F32Ops`), a max-abs calibration pass
(`CalibOps`), and the int8 serving pass (`Int8Ops`) — so the three can
never structurally diverge. The twin reproduces UrsoNetModule
(models/ursonet.py) exactly on BN-folded parameters; equivalence is
unit-tested (tests/test_quant.py).

Usage:
    qmodel = QuantizedModel.from_variables(config, params, batch_stats)
    qmodel.calibrate(molded_images)          # one representative batch
    outputs = qmodel(molded_images)          # jitted int8 forward
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ursonet_tpu.models.folding import _bn_name_for, fold_bn

# Accuracy-gate thresholds — the single source of truth shared by
# bench.py, tests/test_quant.py and tools/make_gate_artifact.py
# (ADVICE r2: the three had drifted to 0.05/0.07/0.08).
TRAINED_GATE_REL = 0.08     # int8 vs float twin, committed trained artifact
TRAINED_GATE_DRIFT = 0.005  # int8 vs export-time golden (precision tripwire)
RANDOM_INIT_GATE_REL = 0.15  # int8 vs float twin, random-init flagship


# --------------------------------------------------------------------------
# Folded parameter flattening: {site_name: (kernel, effective_bias)}
# --------------------------------------------------------------------------

def flatten_folded(params, batch_stats, config) -> Dict[str, tuple]:
    """Fold BN and flatten the param tree into per-site (kernel, bias).

    Site names match the twin graph's conv/dense call sites; head sites
    get a 'loc_head/' / 'ori_head/' prefix, backbone conv names are
    globally unique already (models/resnet.py naming). BN running stats
    are folded into the conv kernel; the BN shift becomes part of the
    site bias, so the twin needs no BN ops at all.
    """
    if getattr(config, 'TRAIN_BN', False):
        raise NotImplementedError(
            'int8 PTQ supports the TRAIN_BN=False default only')
    params, batch_stats = fold_bn(jax.device_get(params),
                                  jax.device_get(batch_stats or {}))
    flat: Dict[str, tuple] = {}

    def add(site, node, parent):
        k = np.asarray(node['kernel'], np.float32)
        b = np.asarray(node['bias'], np.float32) if 'bias' in node \
            else np.zeros((k.shape[-1],), np.float32)
        bn = _bn_name_for(site.split('/')[-1])
        if bn and bn in parent:  # folded BN shift (folding.py)
            b = b + np.asarray(parent[bn]['bn']['bias'], np.float32)
        flat[site] = (k, b)

    def walk(node, prefix):
        for name, sub in node.items():
            if not isinstance(sub, dict):
                continue
            if 'kernel' in sub:
                add(prefix + name if prefix else name, sub, node)
            else:
                # heads keep their module prefix; backbone block
                # submodules don't (conv names are already unique)
                child_prefix = f'{name}/' if name.endswith('_head') \
                    else prefix
                walk(sub, child_prefix)

    walk(params, '')
    return flat


# --------------------------------------------------------------------------
# Phase ops
# --------------------------------------------------------------------------

def _conv_dn(x_shape, w_shape):
    return jax.lax.conv_dimension_numbers(x_shape, w_shape,
                                          ('NHWC', 'HWIO', 'NHWC'))


class F32Ops:
    """Float twin of UrsoNetModule on folded params (reference semantics:
    conv -> +bias(+BN shift) -> ReLU; Dense likewise)."""

    def __init__(self, flat, compute_dtype=jnp.float32, mean_pixel=None):
        self.flat = flat
        self.dt = compute_dtype
        self.mean_pixel = mean_pixel

    def _mold_maybe(self, x):
        """uint8 input = raw network-resolution pixels: fold the mold's
        mean-subtract in here so the serving host ships 1 byte/px instead
        of a 4-byte molded float (engine.mold_inputs stays the float
        path). float input = already molded."""
        if x.dtype == jnp.uint8:
            assert self.mean_pixel is not None
            mean = jnp.asarray(self.mean_pixel, jnp.float32)
            if x.shape[-1] == 4 * mean.shape[0]:
                # host-s2d input ([B,H/2,W/2,4C], channel order (dy,dx,c)
                # — resnet.space_to_depth2): tile the per-channel mean
                # across the four spatial phases.
                mean = jnp.tile(mean, 4)
            return x.astype(jnp.float32) - mean
        return x

    def input(self, x):
        return self._mold_maybe(x).astype(self.dt)

    def conv(self, x, site, stride=1, padding='SAME'):
        w, b = self.flat[site]
        y = jax.lax.conv_general_dilated(
            x, jnp.asarray(w, self.dt), (stride, stride), padding,
            dimension_numbers=_conv_dn(x.shape, w.shape))
        return y + jnp.asarray(b, self.dt)

    def dense(self, x, site):
        w, b = self.flat[site]
        return x @ jnp.asarray(w, self.dt) + jnp.asarray(b, self.dt)

    def dense_final(self, x, site):
        return self.dense(x, site)

    def relu(self, x, site=None):
        # `site` marks a requantization point for the int8 phase.
        return jax.nn.relu(x)

    def requant(self, x, site):
        # `site` marks the int8 phase's shortcut-branch requantization.
        return x

    def add(self, a, b):
        return a + b

    def maxpool(self, x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), 'SAME')

    def flatten(self, x, site):
        return x.reshape(x.shape[0], -1)

    def finalize(self, out):
        return {k: v.astype(jnp.float32) for k, v in out.items()}


class CalibOps(F32Ops):
    """F32 twin that also records max|x| at every quantize site."""

    def __init__(self, flat, compute_dtype=jnp.float32, mean_pixel=None):
        super().__init__(flat, compute_dtype, mean_pixel)
        self.maxabs: Dict[str, jnp.ndarray] = {}

    def _observe(self, name, x):
        self.maxabs[name] = jnp.max(jnp.abs(x)).astype(jnp.float32)
        return x

    def input(self, x):
        return self._observe('input', super().input(x))

    def relu(self, x, site=None):
        y = super().relu(x)
        if site:
            self._observe(site, y)
        return y

    def requant(self, x, site):
        return self._observe(site, x)

    def flatten(self, x, site):
        return self._observe(site, super().flatten(x, site))


def quantize_weight(w):
    """Per-output-channel symmetric int8 quantization of a kernel.
    Single source of truth shared by Int8Ops and the serving artifact
    (checkpoint/quant_store.py) — the artifact's bit-exact round-trip
    depends on both using the identical formula.
    Returns (w8 int8, scale f32[Cout])."""
    w = np.asarray(w, np.float32)
    axes = tuple(range(w.ndim - 1))
    sw = np.maximum(np.abs(w).max(axis=axes), 1e-12) / 127.0
    w8 = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
    return w8, sw.astype(np.float32)


class _QT:
    """A quantized activation: int8 array + its dequantization scale.
    Scales travel WITH the tensor (a mutable current-scale would cross
    wires at graph forks, e.g. the two heads sharing `feats`)."""

    __slots__ = ('arr', 'scale')

    def __init__(self, arr, scale):
        self.arr, self.scale = arr, scale


class Int8Ops:
    """int8 serving phase. Activations ride between sites as _QT (int8 +
    scale); every conv/dense epilogue dequantizes (scale+bias) into
    `acc_dtype`, and relu(site=...) requantizes for the next consumer.
    Final head denses run in float (dense_final) — tiny compute, and it
    keeps the head outputs (e.g. the 4-float quaternion) clean."""

    def __init__(self, q, flat, act_scales, acc_dtype=jnp.float32,
                 mean_pixel=None, bf16_stem=False):
        """q: {site: (w8, sw, b)} from prepare(); flat: float kernels for
        the dense_final sites. Both may be jit tracers — the weight
        trees ride as ARGUMENTS of the jitted forward, not as baked-in
        constants (constants would force a recompile + a full-weights
        HLO upload for every new checkpoint)."""
        self.dt = acc_dtype
        self.mean_pixel = mean_pixel
        self.bf16_stem = bf16_stem
        # Clamp: a site whose calibration batch produced all-zero
        # activations (dead ReLU on a small batch) must not divide by 0.
        self.scales = {k: max(float(v), 1e-10)
                       for k, v in act_scales.items()}
        self.flat = flat
        self.q = q

    @staticmethod
    def prepare(flat):
        """Quantize a flat float tree into the {site: (w8, sw, b)}
        weight tree consumed by the int8 phase."""
        q = {}
        for site, (w, b) in flat.items():
            w8, sw = quantize_weight(w)
            q[site] = (w8, sw, np.asarray(b, np.float32))
        return q

    def _q8(self, x, site):
        s = self.scales[site] / 127.0
        y = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
        return _QT(y.astype(jnp.int8), s)

    def input(self, x):
        x = F32Ops._mold_maybe(self, x)
        if self.bf16_stem:
            # keep the molded pixels in bf16 and run the stem conv in
            # bf16 (see conv below): skips the input-quantize pass and
            # the s8 input relayout copy, and avoids XLA's slow
            # 3-input-channel int8 conv emitter (PERF.md stem audit).
            # Input pixels are integers <= 255, exact in bf16... up to
            # the 8-bit mantissa (max err 0.5 px ~= 1/3 of the int8
            # input step) — strictly more precise than the s8 input.
            return x.astype(jnp.bfloat16)
        return self._q8(x, 'input')

    def conv(self, x, site, stride=1, padding='SAME'):
        w8, sw, b = self.q[site]
        if not isinstance(x, _QT):
            # bf16 stem path: conv(x, w8)*sw + b with the SAME stored
            # int8 kernel (artifact-compatible; only the compute dtype
            # of this one conv differs)
            acc = jax.lax.conv_general_dilated(
                x, w8.astype(jnp.bfloat16), (stride, stride), padding,
                dimension_numbers=_conv_dn(x.shape, w8.shape),
                preferred_element_type=jnp.float32)
            return acc * sw.astype(jnp.float32) + b.astype(self.dt)
        acc = jax.lax.conv_general_dilated(
            x.arr, w8, (stride, stride), padding,
            dimension_numbers=_conv_dn(x.arr.shape, w8.shape),
            preferred_element_type=jnp.int32)
        scale = (sw * x.scale).astype(self.dt)
        return acc.astype(self.dt) * scale + b.astype(self.dt)

    def dense(self, x, site):
        w8, sw, b = self.q[site]
        acc = jax.lax.dot_general(x.arr, w8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        scale = (sw * x.scale).astype(self.dt)
        return acc.astype(self.dt) * scale + b.astype(self.dt)

    def dense_final(self, x, site):
        """Float final dense (accuracy-critical, compute-trivial)."""
        if isinstance(x, _QT):
            x = self.dequant(x)
        w, b = self.flat[site]
        return x @ jnp.asarray(w, self.dt) + jnp.asarray(b, self.dt)

    def relu(self, x, site=None):
        y = jax.nn.relu(x)
        if site:  # requantize for the next int8 consumer
            return self._q8(y, site)
        return y

    def requant(self, x, site):
        """Requantize a float branch (shortcut-conv output) back to s8.

        Without this, XLA materializes the shortcut conv's int32
        accumulator in HBM (4 bytes/elem) because its only consumer is
        the residual join in a different fusion — at C2 that is 2.7 GB
        of traffic for one conv (serving trace, PERF.md). Costs one
        extra quantization step on the shortcut branch only.
        Falls back to the float path for artifacts calibrated before
        this site existed."""
        if site not in self.scales:
            return x
        return self._q8(x, site)

    def add(self, a, b):
        # residual join: operands arrive as float or s8 (_QT)
        if isinstance(a, _QT):
            a = self.dequant(a)
        if isinstance(b, _QT):
            b = self.dequant(b)
        return a + b

    def maxpool(self, x):
        # monotonic => commutes with quantization; pool in int8 directly
        return _QT(jax.lax.reduce_window(
            x.arr, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            'SAME'), x.scale)

    def dequant(self, x):
        """int8 -> float (for residual forks consumed by float adds)."""
        return x.arr.astype(self.dt) * jnp.asarray(x.scale, self.dt)

    def flatten(self, x, site):
        return self._q8(x.reshape(x.shape[0], -1), site)

    def finalize(self, out):
        return {k: v.astype(jnp.float32) for k, v in out.items()}


def float_sites(mcfg) -> set:
    """Sites that run in FLOAT at serving time (the regression /
    quaternion / keypoint finals — see twin_forward's head(); the
    classification finals are int8 by default, or float under the
    QUANT_FLOAT_CLS_FINAL ablation knob)."""
    if mcfg['regress_keypoints']:
        return {'loc_head/k1_final', 'loc_head/k2_final',
                'loc_head/k3_final'}
    sites = set()
    if mcfg['regress_loc']:
        sites.add('loc_head/loc_final')
    elif mcfg.get('float_cls_final'):
        sites.add('loc_head/loc_final')
    if mcfg['regress_ori']:
        sites.add('ori_head/ori_q'
                  if mcfg['orientation_param'] == 'quaternion'
                  else 'ori_head/ori_final')
    elif mcfg.get('float_cls_final'):
        sites.add('ori_head/ori_final')
    return sites


# --------------------------------------------------------------------------
# The twin graph (mirrors models/ursonet.py + models/resnet.py exactly)
# --------------------------------------------------------------------------

def _dequant_maybe(ops, x):
    return ops.dequant(x) if isinstance(ops, Int8Ops) else x


def _stem(ops, x, mcfg, name):
    """Stem conv: 7×7/2 with (3,3) pad, or its exact space-to-depth
    rewrite (models/resnet.py:_stem_conv) when the folded kernel is in
    (4,4,4C,O) form — either because the model was built with
    STEM_SPACE_TO_DEPTH or because QuantizedModel rewrote it at init
    (QUANT_STEM_S2D serving knob)."""
    if mcfg.get('stem_s2d'):
        if not mcfg.get('host_s2d'):
            from ursonet_tpu.models.resnet import space_to_depth2
            if isinstance(x, _QT):
                x = _QT(space_to_depth2(x.arr), x.scale)
            else:
                x = space_to_depth2(x)
        # host_s2d: the serving host already shipped the batch in s2d
        # layout (engine.predict_molded), so no device relayout at all —
        # the transpose is what made device-side s2d a net loss (PERF.md
        # ablation: -3.6%).
        return ops.conv(x, name, 1, [(2, 1), (2, 1)])
    return ops.conv(x, name, 2, [(3, 3), (3, 3)])


def _bottleneck_backbone(ops, x, architecture, mcfg):
    """ResNet-50/101 (models/resnet.py ResNetBackbone)."""
    y = _stem(ops, x, mcfg, 'conv1')
    y = ops.relu(y, 'conv1/out')
    y = ops.maxpool(y)

    def block(y, stage, blk, strides, conv_shortcut):
        c = f'res{stage}{blk}_branch'
        # shortcut conv output requantizes to s8 (ops.requant) so the
        # residual join reads 1 byte/elem, not a 4-byte int32
        # accumulator materialized across fusion boundaries
        sc = ops.requant(ops.conv(y, c + '1', strides, 'VALID'),
                         c + '1/out') if conv_shortcut \
            else _dequant_maybe(ops, y)
        r = ops.conv(y, c + '2a', strides, 'VALID')
        r = ops.relu(r, c + '2a/out')
        r = ops.conv(r, c + '2b', 1, 'SAME')
        r = ops.relu(r, c + '2b/out')
        r = ops.conv(r, c + '2c', 1, 'VALID')
        return ops.relu(ops.add(r, sc), c + '/out')

    y = block(y, 2, 'a', 1, True)
    y = block(y, 2, 'b', 1, False)
    y = block(y, 2, 'c', 1, False)
    y = block(y, 3, 'a', 2, True)
    for b in 'bcd':
        y = block(y, 3, b, 1, False)
    y = block(y, 4, 'a', 2, True)
    n4 = {'resnet50': 5, 'resnet101': 22}[architecture]
    for i in range(n4):
        y = block(y, 4, chr(98 + i), 1, False)
    y = block(y, 5, 'a', 2, True)
    y = block(y, 5, 'b', 1, False)
    y = block(y, 5, 'c', 1, False)
    return y


def _basic_backbone(ops, x, architecture, mcfg):
    """ResNet-18/34 (models/resnet.py ResNetShallowBackbone; single-BN
    basic block, reference net.py:216-240)."""
    y = _stem(ops, x, mcfg, 'conv0')
    y = ops.relu(y, 'conv0/out')
    y = ops.maxpool(y)
    reps = [2, 2, 2, 2] if architecture == 'resnet18' else [3, 4, 6, 3]
    for stage, rep in enumerate(reps):
        for blk in range(rep):
            base = f'stage{stage + 1}_unit{blk + 1}_'
            strides = 2 if (blk == 0 and stage > 0) else 1
            cut = 'post' if blk == 0 else 'pre'
            sc = ops.requant(
                ops.conv(y, base + 'sc', strides, 'VALID'),
                base + 'sc/out') \
                if cut == 'post' else _dequant_maybe(ops, y)
            r = ops.conv(y, base + 'conv1', strides,
                         [(1, 1), (1, 1)])
            r = ops.relu(r, base + 'conv1/out')
            r = ops.conv(r, base + 'conv2', 1, [(1, 1), (1, 1)])
            y = ops.relu(ops.add(r, sc), base + '/out')
    return y


def _l2norm(x):
    """tf.nn.l2_normalize semantics (models/heads.py)."""
    sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return x.astype(jnp.float32) * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))


def twin_forward(ops, images, mcfg: dict) -> Dict[str, jnp.ndarray]:
    """Shared graph across all phases. `mcfg` is the model-config snapshot
    (see QuantizedModel._mcfg)."""
    x = ops.input(images)
    if mcfg['backbone'] in ('resnet50', 'resnet101'):
        y = _bottleneck_backbone(ops, x, mcfg['backbone'], mcfg)
    else:
        y = _basic_backbone(ops, x, mcfg['backbone'], mcfg)
    y = ops.conv(y, 'bottleneck_layer', 2, 'SAME')
    feats = ops.flatten(y, 'bottleneck/out')

    def dense_stack(prefix, quant_last):
        """Hidden dense stack. The LAST hidden relu requantizes only when
        the final dense runs int8 (quant_last); regression finals are
        float (Int8Ops.dense_final) and take the float relu output."""
        h = feats
        n = mcfg['nr_dense_layers']
        for i in range(n):
            site = f'{prefix}_head/{prefix}_dense_{i}'
            h = ops.dense(h, site)
            keep_q = quant_last or i < n - 1
            h = ops.relu(h, site + '/out' if keep_q else None)
        return h

    def head(prefix, final_site, final_act):
        # Classification finals (ReLU over bins³ logits — the LARGEST
        # matmul of those configs, e.g. 1024×64³, yet ~0.04% of flagship
        # FLOPs) quantize like any other layer by default; under
        # QUANT_FLOAT_CLS_FINAL they run float like the regression
        # finals. Measured accuracy-neutral on the trained 24³
        # checkpoint — the ablation localizing the classification int8
        # delta to backbone activations (PERF.md round 3).
        quant_final = (final_act == 'relu'
                       and not mcfg.get('float_cls_final'))
        h = dense_stack(prefix, quant_final)
        site = f'{prefix}_head/{final_site}'
        h = ops.dense(h, site) if quant_final else ops.dense_final(h, site)
        if final_act == 'relu':
            h = ops.relu(h)
        elif final_act == 'l2norm':
            h = _l2norm(h)
        return h

    out: Dict[str, jnp.ndarray] = {}
    if mcfg['regress_keypoints']:
        h = dense_stack('loc', quant_last=False)
        out['loc'] = ops.dense_final(h, 'loc_head/k1_final')
        out['k1'] = ops.dense_final(h, 'loc_head/k2_final')
        out['k2'] = ops.dense_final(h, 'loc_head/k3_final')
        return ops.finalize(out)

    out['loc'] = head('loc', 'loc_final',
                      'linear' if mcfg['regress_loc'] else 'relu')
    if mcfg['regress_ori']:
        if mcfg['orientation_param'] == 'quaternion':
            out['ori'] = head('ori', 'ori_q', 'l2norm')
        else:
            out['ori'] = head('ori', 'ori_final', 'linear')
    else:
        out['ori'] = head('ori', 'ori_final', 'relu')
    return ops.finalize(out)


# --------------------------------------------------------------------------
# Public facade
# --------------------------------------------------------------------------

class QuantizedModel:
    """Calibrated int8 serving model.

    from_variables() folds BN and flattens the tree; calibrate() runs the
    float twin once to set activation scales; __call__ is the jitted int8
    forward. `float_twin()` exposes the f32 reference twin for
    equivalence testing.
    """

    def __init__(self, config, flat_params):
        self.flat = flat_params
        stem = 'conv1' if config.BACKBONE in ('resnet50', 'resnet101') \
            else 'conv0'
        # Default must match Config.QUANT_STEM_S2D = False (the rewrite
        # measured -3.6% end-to-end and requires even H,W — ADVICE r2).
        if (getattr(config, 'QUANT_STEM_S2D', False)
                and self.flat[stem][0].shape[0] == 7):
            # Serving-time stem optimization: rewrite the 7x7/2 stem
            # kernel EXACTLY into its space-to-depth (4,4,4C,O)/1 form
            # (resnet.stem_kernel_to_s2d) regardless of how the model
            # was trained — the raw stem runs at ~4% MXU utilization
            # (3 input channels), the s2d form at 16%. Requires even
            # input H,W (all molded resize modes except odd-sized
            # 'none'); set config.QUANT_STEM_S2D = False to opt out.
            from ursonet_tpu.models.resnet import stem_kernel_to_s2d
            k, b = self.flat[stem]
            self.flat = dict(self.flat)
            self.flat[stem] = (stem_kernel_to_s2d(k), b)
        self._mcfg = dict(
            backbone=config.BACKBONE,
            nr_dense_layers=config.NR_DENSE_LAYERS,
            regress_loc=config.REGRESS_LOC,
            regress_ori=config.REGRESS_ORI,
            regress_keypoints=config.REGRESS_KEYPOINTS,
            orientation_param=config.ORIENTATION_PARAM,
            loc_bins=config.LOC_BINS_PER_DIM,
            ori_bins=config.ORI_BINS_PER_DIM,
            # derived from the kernel actually in `flat`, NOT the config
            # flag — an artifact saved post-rewrite stays self-describing
            stem_s2d=self.flat[stem][0].shape[0] == 4,
            # served inputs arrive pre-s2d from the host (engine wires
            # the reindex; only meaningful when the kernel is s2d form)
            host_s2d=(self.flat[stem][0].shape[0] == 4
                      and bool(getattr(config, 'QUANT_HOST_S2D', False))),
            # bf16 stem: serving ablation knob (input + stem conv in
            # bf16, everything else int8) — artifact-validated like the
            # other knobs so goldens stay reproducible
            bf16_stem=bool(getattr(config, 'QUANT_BF16_STEM', False)),
            # float classification finals (decode-critical logits)
            float_cls_final=bool(getattr(config, 'QUANT_FLOAT_CLS_FINAL',
                                         False)),
            mean_pixel=tuple(float(v) for v in config.MEAN_PIXEL),
        )
        self.act_scales: Optional[Dict[str, float]] = None
        self.acc_dtype = jnp.bfloat16 if getattr(config, 'F16', False) \
            else jnp.float32
        # Optional data-parallel serving mesh (shard_over)
        self.mesh = None
        # lazily-built device/jit state (reset by calibrate())
        self._fn: Optional[Callable] = None
        self._calib_fn: Optional[Callable] = None
        self._flat_dev = None
        self._q_dev = None
        self._ffinal_dev = None

    def shard_over(self, mesh):
        """Serve data-parallel over `mesh`'s 'data' axis: __call__ batch-
        shards the images (weights + activation scales replicated, XLA
        runs each shard independently — no collectives in the int8
        graph; the int8 body is shard-exact, the float final denses see
        a different matmul tiling per shard shape so outputs match
        single-device to f32 rounding only —
        tests/test_quant.py::test_int8_sharded_matches_single_device).
        Pass a 1-device mesh (or None) to revert. The engine wires this
        automatically when its mesh has >1 devices."""
        self.mesh = mesh if (mesh is not None
                             and mesh.shape.get('data', 1) > 1) else None
        self._fn = None
        self._q_dev = None
        self._ffinal_dev = None
        self._flat_dev = None
        return self

    @classmethod
    def from_variables(cls, config, params, batch_stats):
        return cls(config, flatten_folded(params, batch_stats, config))

    # -- phases ---------------------------------------------------------------

    def float_twin(self, images):
        return twin_forward(
            F32Ops(self._flat_f32(),
                   mean_pixel=self._mcfg['mean_pixel']),
            images, self._mcfg)

    def _flat_f32(self):
        """Device copy of the flat float tree (kernels as f32 jnp).
        Weight trees are passed as jit ARGUMENTS everywhere — baking
        them in as constants forces a recompile and a full-weights HLO
        upload per checkpoint (and overflows the remote-compile request
        size at flagship scale)."""
        if self._flat_dev is None:
            self._flat_dev = {
                s: (jnp.asarray(w, jnp.float32),
                    jnp.asarray(b, jnp.float32))
                for s, (w, b) in self.flat.items()}
        return self._flat_dev

    def calibrate(self, images, percentile_headroom: float = 1.0):
        """Max-abs calibration over one (or more) molded batches; call
        repeatedly to take the running max across batches."""
        mcfg = self._mcfg
        if self._calib_fn is None:
            def run(flat, imgs):
                ops = CalibOps(flat, mean_pixel=mcfg['mean_pixel'])
                twin_forward(ops, imgs, mcfg)
                return ops.maxabs
            self._calib_fn = jax.jit(run)

        maxabs = self._calib_fn(self._flat_f32(), jnp.asarray(images))
        maxabs = {k: float(v) * percentile_headroom
                  for k, v in maxabs.items()}
        if self.act_scales is None:
            self.act_scales = maxabs
        else:
            self.act_scales = {k: max(self.act_scales[k], v)
                               for k, v in maxabs.items()}
        self._fn = None
        return self.act_scales

    def __call__(self, images):
        if self.act_scales is None:
            raise RuntimeError('calibrate() before inference')
        if self._fn is None:
            mcfg = self._mcfg
            scales, acc = self.act_scales, self.acc_dtype

            def fn(q, flat, x):
                ops = Int8Ops(q, flat, scales, acc,
                              mean_pixel=mcfg['mean_pixel'],
                              bf16_stem=mcfg.get('bf16_stem', False))
                return twin_forward(ops, x, mcfg)

            fsites = float_sites(mcfg)
            flat_dev = self._flat_f32()
            ffinal = {s: flat_dev[s] for s in fsites if s in flat_dev}
            if self.mesh is not None:
                from ursonet_tpu import parallel
                rep = parallel.replicated(self.mesh)
                xsh = parallel.batch_sharding(self.mesh)
                self._fn = jax.jit(fn, in_shardings=(rep, rep, xsh))
                self._q_dev = jax.device_put(Int8Ops.prepare(self.flat),
                                             rep)
                self._ffinal_dev = jax.device_put(ffinal, rep)
            else:
                self._fn = jax.jit(fn)
                self._q_dev = jax.device_put(Int8Ops.prepare(self.flat))
                self._ffinal_dev = ffinal
        x = jnp.asarray(images)
        if self.mesh is not None:
            ndata = self.mesh.shape.get('data', 1)
            if x.shape[0] % ndata:
                raise ValueError(
                    f"batch {x.shape[0]} not divisible by the mesh's "
                    f"'data' axis ({ndata}); pad the batch (engine."
                    f"detect does) or serve unsharded")
        return self._fn(self._q_dev, self._ffinal_dev, x)
