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
        # when set to a dict, conv/dense record their per-channel output
        # mean (post-bias, pre-activation) — QuantizedModel.bias_correct
        self.capture: Optional[Dict[str, jnp.ndarray]] = None

    def _capture_maybe(self, site, y):
        if self.capture is not None:
            self.capture[site] = jnp.mean(
                y.astype(jnp.float32), axis=tuple(range(y.ndim - 1)))
        return y

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
        return self._capture_maybe(site, y + jnp.asarray(b, self.dt))

    def dense(self, x, site):
        w, b = self.flat[site]
        return self._capture_maybe(
            site, x @ jnp.asarray(w, self.dt) + jnp.asarray(b, self.dt))

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

    def join(self, r, sc, site):
        """Residual join: relu(r + sc) requantized at `site`. A single op
        so the int8 phase can fuse the whole join in the integer domain
        (QUANT_S8_JOIN)."""
        return self.relu(self.add(r, sc), site)

    def maxpool(self, x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), 'SAME')

    def flatten(self, x, site):
        return x.reshape(x.shape[0], -1)

    def finalize(self, out):
        return {k: v.astype(jnp.float32) for k, v in out.items()}


class CalibOps(F32Ops):
    """F32 twin that also records max|x| at every quantize site, plus the
    per-channel max (over batch and space) used by SmoothQuant-style scale
    migration (QuantizedModel.smooth)."""

    def __init__(self, flat, compute_dtype=jnp.float32, mean_pixel=None):
        super().__init__(flat, compute_dtype, mean_pixel)
        self.maxabs: Dict[str, jnp.ndarray] = {}
        self.chan_max: Dict[str, jnp.ndarray] = {}

    def _observe(self, name, x, per_channel=True):
        a = jnp.abs(x.astype(jnp.float32))
        self.maxabs[name] = jnp.max(a)
        if per_channel:
            self.chan_max[name] = jnp.max(
                a, axis=tuple(range(a.ndim - 1)))
        return x

    def input(self, x):
        # raw pixels have no producer to migrate into — per-tensor only
        return self._observe('input', super().input(x), per_channel=False)

    def relu(self, x, site=None):
        y = super().relu(x)
        if site:
            self._observe(site, y)
        return y

    def requant(self, x, site):
        return self._observe(site, x)

    def flatten(self, x, site):
        # channel stats must be per conv-output-channel (the LAST axis of
        # the pre-flatten [B,H,W,C]) — post-flatten the channel repeats
        # every C features (NHWC row-major)
        self._observe(site, x)
        return x.reshape(x.shape[0], -1)

    def join(self, r, sc, site):
        return self._observe(site, jax.nn.relu(r + sc))


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
                 mean_pixel=None, bf16_stem=False, s8_join=False):
        """q: {site: (w8, sw, b)} from prepare(); flat: float kernels for
        the dense_final sites. Both may be jit tracers — the weight
        trees ride as ARGUMENTS of the jitted forward, not as baked-in
        constants (constants would force a recompile + a full-weights
        HLO upload for every new checkpoint)."""
        self.dt = acc_dtype
        self.mean_pixel = mean_pixel
        self.bf16_stem = bf16_stem
        self.s8_join = s8_join
        # Clamp: a site whose calibration batch produced all-zero
        # activations (dead ReLU on a small batch) must not divide by 0.
        self.scales = {k: max(float(v), 1e-10)
                       for k, v in act_scales.items()}
        self.flat = flat
        self.q = q
        # see F32Ops.capture (QuantizedModel.bias_correct)
        self.capture: Optional[Dict[str, jnp.ndarray]] = None

    _capture_maybe = F32Ops._capture_maybe

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
            return self._capture_maybe(
                site, acc * sw.astype(jnp.float32) + b.astype(self.dt))
        acc = jax.lax.conv_general_dilated(
            x.arr, w8, (stride, stride), padding,
            dimension_numbers=_conv_dn(x.arr.shape, w8.shape),
            preferred_element_type=jnp.int32)
        scale = (sw * x.scale).astype(self.dt)
        return self._capture_maybe(
            site, acc.astype(self.dt) * scale + b.astype(self.dt))

    def dense(self, x, site):
        w8, sw, b = self.q[site]
        acc = jax.lax.dot_general(x.arr, w8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        scale = (sw * x.scale).astype(self.dt)
        return self._capture_maybe(
            site, acc.astype(self.dt) * scale + b.astype(self.dt))

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

    def join(self, r, sc, site):
        """Residual join. Default: float add + relu + requant (three
        elementwise steps XLA fuses into the expansion conv's epilogue,
        but whose operands travel at >=2 bytes/elem). Under QUANT_S8_JOIN
        the whole join runs in the output-scale integer domain:
        both operands round onto the `site` grid (s_out), the add+relu is
        an integer clip — one extra <=1-LSB rounding on each operand.

        MEASURED NEGATIVE (PERF.md round 4): -28.5% end-to-end vs the
        default path in the same-process A/B. The residual stream
        already arrives as s8 (_QT) with its dequant fused into the
        join epilogue, so the hoped-for traffic saving did not exist,
        and the integer grid-rounding chains break XLA's expansion-conv
        epilogue fusion. Kept as an ablation knob; default off."""
        if not (self.s8_join and site in self.scales):
            return self.relu(self.add(r, sc), site)
        s_out = self.scales[site] / 127.0
        r_i = jnp.round(r.astype(jnp.float32) / s_out)
        if isinstance(sc, _QT):
            sc_i = jnp.round(sc.arr.astype(jnp.float32)
                             * (sc.scale / s_out))
        else:
            sc_i = jnp.round(sc.astype(jnp.float32) / s_out)
        q = jnp.clip(r_i + sc_i, 0, 127)  # relu == the lower clip
        return _QT(q.astype(jnp.int8), s_out)

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
    """Sites that run in FLOAT at serving time: the regression /
    quaternion / keypoint finals, plus — under float_reg_head (default
    ON) — the hidden denses of metric-regression heads (see twin_forward
    head(); PERF.md round-5 flagship ablation). The classification
    finals are int8 by default, or float under the QUANT_FLOAT_CLS_FINAL
    ablation knob."""
    frh = mcfg.get('float_reg_head', False)

    def hidden(prefix):
        return {f'{prefix}_head/{prefix}_dense_{i}'
                for i in range(mcfg['nr_dense_layers'])} if frh else set()

    if mcfg['regress_keypoints']:
        return {'loc_head/k1_final', 'loc_head/k2_final',
                'loc_head/k3_final'} | hidden('loc')
    sites = set()
    if mcfg['regress_loc']:
        sites.add('loc_head/loc_final')
        sites |= hidden('loc')
    elif mcfg.get('float_cls_final'):
        sites.add('loc_head/loc_final')
    if mcfg['regress_ori']:
        sites.add('ori_head/ori_q'
                  if mcfg['orientation_param'] == 'quaternion'
                  else 'ori_head/ori_final')
        sites |= hidden('ori')
    elif mcfg.get('float_cls_final'):
        sites.add('ori_head/ori_final')
    return sites


def migration_groups(mcfg) -> list:
    """Channel-space groups for SmoothQuant-style scale migration.

    Each group names activation site(s) sharing one channel space, the
    conv/dense sites PRODUCING into that space (their output channels can
    be scaled by 1/m), and the sites CONSUMING it (their input channels
    absorb the m). Groups cover:
      * the stem output (consumed by the first block's convs),
      * every bottleneck/basic block's inner chain(s) (2a→2b, 2b→2c /
        conv1→conv2) — where the 3×3 convs live,
      * every stage's residual stream: ALL producers into the stream
        (block-a projection shortcut + every block's expansion conv)
        scale together, ALL consumers (next blocks' 2a convs, the next
        stage's entry convs, finally the bottleneck conv) compensate —
        valid because relu/maxpool/residual-add commute with a positive
        per-channel rescale applied consistently to every stream operand,
      * the flattened bottleneck output (consumed by the head denses,
        channel index repeating every C features — kind 'dense_flat'),
      * hidden head-dense chains whose next layer is also quantized.

    Consumer kinds: 'conv' (HWIO kernel, input axis -2), 'dense'
    (input axis 0), 'dense_flat' (dense over flattened NHWC features).
    """
    groups = []

    def grp(acts, producers, consumers):
        groups.append(dict(acts=list(acts), producers=list(producers),
                           consumers=list(consumers)))

    arch = mcfg['backbone']
    if arch in ('resnet50', 'resnet101'):
        n4 = {'resnet50': 5, 'resnet101': 22}[arch]
        stages = [(2, ['a', 'b', 'c']),
                  (3, ['a', 'b', 'c', 'd']),
                  (4, ['a'] + [chr(98 + i) for i in range(n4)]),
                  (5, ['a', 'b', 'c'])]
        grp(['conv1/out'], ['conv1'],
            [('res2a_branch2a', 'conv'), ('res2a_branch1', 'conv')])
        for si, (s, blocks) in enumerate(stages):
            stream_acts, stream_prod, stream_cons = [], [], []
            for b in blocks:
                c = f'res{s}{b}_branch'
                grp([c + '2a/out'], [c + '2a'], [(c + '2b', 'conv')])
                grp([c + '2b/out'], [c + '2b'], [(c + '2c', 'conv')])
                stream_prod.append(c + '2c')
                stream_acts.append(c + '/out')
                if b != 'a':
                    stream_cons.append((c + '2a', 'conv'))
            stream_prod.append(f'res{s}a_branch1')
            stream_acts.append(f'res{s}a_branch1/out')
            if si + 1 < len(stages):
                nxt = stages[si + 1][0]
                stream_cons += [(f'res{nxt}a_branch2a', 'conv'),
                                (f'res{nxt}a_branch1', 'conv')]
            else:
                stream_cons.append(('bottleneck_layer', 'conv'))
            grp(stream_acts, stream_prod, stream_cons)
    else:
        reps = [2, 2, 2, 2] if arch == 'resnet18' else [3, 4, 6, 3]
        grp(['conv0/out'], ['conv0'],
            [('stage1_unit1_conv1', 'conv'), ('stage1_unit1_sc', 'conv')])
        for stage, rep in enumerate(reps):
            stream_acts, stream_prod, stream_cons = [], [], []
            for blk in range(rep):
                base = f'stage{stage + 1}_unit{blk + 1}_'
                grp([base + 'conv1/out'], [base + 'conv1'],
                    [(base + 'conv2', 'conv')])
                stream_prod.append(base + 'conv2')
                stream_acts.append(base + '/out')
                if blk > 0:
                    stream_cons.append((base + 'conv1', 'conv'))
            first = f'stage{stage + 1}_unit1_'
            stream_prod.append(first + 'sc')
            stream_acts.append(first + 'sc/out')
            if stage + 1 < len(reps):
                nxt = f'stage{stage + 2}_unit1_'
                stream_cons += [(nxt + 'conv1', 'conv'), (nxt + 'sc', 'conv')]
            else:
                stream_cons.append(('bottleneck_layer', 'conv'))
            grp(stream_acts, stream_prod, stream_cons)

    # bottleneck flatten → first head denses
    head_prefixes = ['loc'] if mcfg['regress_keypoints'] else ['loc', 'ori']
    grp(['bottleneck/out'], ['bottleneck_layer'],
        [(f'{p}_head/{p}_dense_0', 'dense_flat') for p in head_prefixes])

    # hidden dense chains (act site exists only when the next layer is
    # quantized — twin_forward's keep_q; smooth() skips absent sites)
    fsites = float_sites(mcfg)
    n = mcfg['nr_dense_layers']
    for p in head_prefixes:
        finals = {'loc': ('loc_head/k1_final' if mcfg['regress_keypoints']
                          else 'loc_head/loc_final'),
                  'ori': ('ori_head/ori_q'
                          if mcfg['regress_ori']
                          and mcfg['orientation_param'] == 'quaternion'
                          else 'ori_head/ori_final')}[p]
        for i in range(n):
            site = f'{p}_head/{p}_dense_{i}'
            nxt = f'{p}_head/{p}_dense_{i + 1}' if i < n - 1 else finals
            if i == n - 1 and nxt in fsites:
                continue  # float final: last hidden relu isn't quantized
            grp([site + '/out'], [site], [(nxt, 'dense')])
    return groups


# --------------------------------------------------------------------------
# The twin graph (mirrors models/ursonet.py + models/resnet.py exactly)
# --------------------------------------------------------------------------

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
                         c + '1/out') if conv_shortcut else y
        r = ops.conv(y, c + '2a', strides, 'VALID')
        r = ops.relu(r, c + '2a/out')
        r = ops.conv(r, c + '2b', 1, 'SAME')
        r = ops.relu(r, c + '2b/out')
        r = ops.conv(r, c + '2c', 1, 'VALID')
        return ops.join(r, sc, c + '/out')

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
                if cut == 'post' else y
            r = ops.conv(y, base + 'conv1', strides,
                         [(1, 1), (1, 1)])
            r = ops.relu(r, base + 'conv1/out')
            r = ops.conv(r, base + 'conv2', 1, [(1, 1), (1, 1)])
            y = ops.join(r, sc, base + '/out')
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

    def dense_stack(prefix, quant_last, float_hidden=False):
        """Hidden dense stack. float_hidden runs the whole stack in
        float (metric-regression heads, float_reg_head — PERF.md round
        5). Otherwise the LAST hidden relu requantizes only when the
        final dense runs int8 (quant_last); regression finals are float
        (Int8Ops.dense_final) and take the float relu output."""
        h = feats
        n = mcfg['nr_dense_layers']
        for i in range(n):
            site = f'{prefix}_head/{prefix}_dense_{i}'
            if float_hidden:
                h = ops.relu(ops.dense_final(h, site))
                continue
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
        # delta to backbone activations (PERF.md round 3). Metric-
        # regression heads (linear/l2norm finals) run FULLY float under
        # float_reg_head: a 3-dim metric output has no redundancy
        # against activation-quant noise (PERF.md round-5 ablation).
        quant_final = (final_act == 'relu'
                       and not mcfg.get('float_cls_final'))
        float_head = (final_act != 'relu'
                      and mcfg.get('float_reg_head', False))
        h = dense_stack(prefix, quant_final, float_hidden=float_head)
        site = f'{prefix}_head/{final_site}'
        h = ops.dense(h, site) if quant_final else ops.dense_final(h, site)
        if final_act == 'relu':
            h = ops.relu(h)
        elif final_act == 'l2norm':
            h = _l2norm(h)
        return h

    out: Dict[str, jnp.ndarray] = {}
    if mcfg['regress_keypoints']:
        h = dense_stack('loc', quant_last=False,
                        float_hidden=mcfg.get('float_reg_head', False))
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
            # integer residual joins (serving bandwidth knob; PERF.md
            # round-4 measurement)
            s8_join=bool(getattr(config, 'QUANT_S8_JOIN', False)),
            # float classification finals (decode-critical logits)
            float_cls_final=bool(getattr(config, 'QUANT_FLOAT_CLS_FINAL',
                                         False)),
            # float METRIC-REGRESSION heads (hidden dense + final):
            # measured-negative ablation knob — the int8 dense head +
            # bias_correct acts as a learned linear recalibration that
            # absorbs backbone activation drift, which a float head
            # forfeits (PERF.md round-5 ablation). Default off.
            float_reg_head=bool(getattr(config, 'QUANT_FLOAT_REG_HEAD',
                                        False)),
            mean_pixel=tuple(float(v) for v in config.MEAN_PIXEL),
        )
        self.act_scales: Optional[Dict[str, float]] = None
        # per-channel |act| maxima from calibration (smooth() input)
        self.chan_max: Optional[Dict[str, np.ndarray]] = None
        # additive int8-path bias corrections (bias_correct); applied on
        # top of the float biases at prepare time, NEVER to the float twin
        self.bias_delta: Dict[str, np.ndarray] = {}
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
                return ops.maxabs, ops.chan_max
            self._calib_fn = jax.jit(run)

        maxabs, chan_max = self._calib_fn(self._flat_f32(),
                                          jnp.asarray(images))
        maxabs = {k: float(v) * percentile_headroom
                  for k, v in maxabs.items()}
        chan_max = {k: np.asarray(v) * percentile_headroom
                    for k, v in chan_max.items()}
        if self.act_scales is None:
            self.act_scales = maxabs
            self.chan_max = chan_max
        else:
            self.act_scales = {k: max(self.act_scales[k], v)
                               for k, v in maxabs.items()}
            self.chan_max = {k: np.maximum(self.chan_max[k], v)
                             for k, v in chan_max.items()}
        self._fn = None
        return self.act_scales

    def smooth(self, alpha: float = 0.5, max_spread: float = None):
        """SmoothQuant-style scale migration (zero serving cost).

        Per-channel activation outliers are what per-tensor int8
        activation scales can't represent (the flagship classification
        int8 delta localizes to backbone activations — PERF.md round 3).
        For every migratable producer→consumer channel space
        (migration_groups), rescale channel c by
        m_c = a_c^alpha / w_c^(1-alpha)  (SmoothQuant, arXiv:2211.10438):
        the producer's kernel/bias output channels divide by m, every
        consumer's kernel input channels multiply by m — algebraically
        exact in float (the float twin is unchanged up to rounding), but
        the quantized activation tensor now has a flattened per-channel
        range while the migrated spread hides inside per-OUTPUT-channel
        quantized weights, which tolerate it far better.

        Requires calibrate() first (uses the recorded per-channel act
        maxima); updates the per-tensor act scales analytically (no
        recalibration pass needed). Returns {group: channel-spread} of
        the applied migration vectors for logging.

        max_spread: optional cap on each group's migration-vector spread
        (max m / min m), applied by clipping m symmetrically (in log
        space) around its geometric mean. Uncapped migration on the
        flagship produced 150-165x spreads that inflate consumer weight
        columns past what per-OUTPUT-channel weight quantization can
        absorb (3.0x weight-quant error on the decode-critical ori_final
        — PERF.md round 5); the cap keeps the outlier-flattening benefit
        where it is affordable. Exactness in float is preserved for ANY
        m, so the float twin is unchanged either way."""
        if self.chan_max is None:
            raise RuntimeError('calibrate() before smooth()')
        flat = {s: (np.array(w, np.float32, copy=True),
                    np.array(b, np.float32, copy=True))
                for s, (w, b) in self.flat.items()}
        report = {}
        for g in migration_groups(self._mcfg):
            if not all(a in self.chan_max for a in g['acts']):
                continue
            if not all(p in flat for p in g['producers']):
                continue
            if not all(c in flat for c, _ in g['consumers']):
                continue
            a = np.maximum.reduce([np.asarray(self.chan_max[s], np.float32)
                                   for s in g['acts']])
            C = a.shape[0]
            ws = []
            for site, kind in g['consumers']:
                k = flat[site][0]
                if kind == 'conv':
                    ws.append(np.abs(k).max(axis=(0, 1, 3)))
                elif kind == 'dense':
                    ws.append(np.abs(k).max(axis=1))
                else:  # dense_flat: rows group as (h*w, C)
                    ws.append(np.abs(k.reshape(-1, C, k.shape[-1]))
                              .max(axis=(0, 2)))
            w = np.maximum.reduce(ws)
            m = np.where(a > 0,
                         a ** alpha / np.maximum(w, 1e-12) ** (1 - alpha),
                         1.0)
            m = np.where(np.isfinite(m), np.clip(m, 1e-4, 1e4), 1.0) \
                .astype(np.float32)
            if max_spread is not None and m.max() > 0:
                gm = np.exp(np.mean(np.log(np.maximum(m, 1e-12))))
                lim = float(np.sqrt(max_spread))
                m = np.clip(m, gm / lim, gm * lim).astype(np.float32)
            for p in g['producers']:
                k, b = flat[p]
                flat[p] = (k / m, b / m)  # output axis is last everywhere
            for site, kind in g['consumers']:
                k, b = flat[site]
                if kind == 'conv':
                    k = k * m[None, None, :, None]
                elif kind == 'dense':
                    k = k * m[:, None]
                else:
                    k = (k.reshape(-1, C, k.shape[-1])
                         * m[None, :, None]).reshape(k.shape)
                flat[site] = (k, b)
            for s in g['acts']:
                cm = np.asarray(self.chan_max[s], np.float32) / m
                self.chan_max[s] = cm
                self.act_scales[s] = float(cm.max())
            report[g['acts'][0]] = float(m.max() / max(m.min(), 1e-12))
        self.flat = flat
        self._flat_dev = None
        self._fn = None
        self._q_dev = None
        self._ffinal_dev = None
        return report

    def _prepared_q(self):
        """Int8 weight tree with bias_correct deltas applied (int8 path
        only — the float twin keeps the original biases)."""
        q = Int8Ops.prepare(self.flat)
        for site, d in self.bias_delta.items():
            if site in q:
                w8, sw, b = q[site]
                q[site] = (w8, sw, b + d)
        return q

    def bias_correct(self, images, passes: int = 1):
        """Calibration-set bias correction (DFQ-style, arXiv:1906.04721).

        Quantization noise is not zero-mean per channel (clipping +
        rounding of weights and activations shift each output channel's
        mean); measure E[y_int8 − y_float] per conv/dense output channel
        on the calibration batch and subtract it from the int8 path's
        bias. Zero serving cost; float twin untouched.

        Sites are corrected SEQUENTIALLY in graph order (Gauss–Seidel),
        re-measuring after each update: a correction only affects sites
        downstream of it, so one topological sweep zeroes the per-channel
        mean error at every site on the calibration batch exactly — a
        simultaneous (Jacobi) update does not converge, because zeroing a
        site's local error simultaneously shifts every downstream input.
        `passes` > 1 polishes the second-order effect of requantization
        rounding changing under the new biases (normally negligible).
        Costs one calibration-batch forward per quantized site, at
        calibration time only."""
        if self.act_scales is None:
            raise RuntimeError('calibrate() before bias_correct()')
        mcfg = self._mcfg
        x = jnp.asarray(images)
        fsites = float_sites(mcfg)

        def frun(flat, imgs):
            ops = F32Ops(flat, mean_pixel=mcfg['mean_pixel'])
            ops.capture = {}
            twin_forward(ops, imgs, mcfg)
            return ops.capture

        fmeans = {k: np.asarray(v, np.float32)
                  for k, v in jax.jit(frun)(self._flat_f32(), x).items()}
        scales, acc = dict(self.act_scales), self.acc_dtype

        order: list = []  # graph order, captured at trace time (the
        # returned pytree is key-sorted, losing insertion order)

        def qrun(q, flat, imgs):
            ops = Int8Ops(q, flat, scales, acc,
                          mean_pixel=mcfg['mean_pixel'],
                          bf16_stem=mcfg.get('bf16_stem', False))
            ops.capture = {}
            twin_forward(ops, imgs, mcfg)
            if not order:
                order.extend(ops.capture.keys())
            return ops.capture

        qjit = jax.jit(qrun)
        flat_dev = self._flat_f32()
        ffinal = {s: flat_dev[s] for s in fsites if s in flat_dev}
        # int8 kernels/scales never change across iterations — quantize
        # once and only rebuild the (cheap) bias vectors per step
        qbase = Int8Ops.prepare(self.flat)

        def q_with_deltas():
            q = dict(qbase)
            for site, d in self.bias_delta.items():
                if site in q:
                    w8, sw, b = q[site]
                    q[site] = (w8, sw, b + d)
            return q

        for _ in range(max(1, passes)):
            qmeans = qjit(q_with_deltas(), ffinal, x)
            sites = [s for s in order if s not in fsites]
            for i, site in enumerate(sites):
                err = np.asarray(qmeans[site], np.float32) - fmeans[site]
                self.bias_delta[site] = np.asarray(
                    self.bias_delta.get(site, 0.0) - err, np.float32)
                if i + 1 < len(sites):  # re-measure downstream sites
                    qmeans = qjit(q_with_deltas(), ffinal, x)
        self._fn = None
        self._q_dev = None
        return {k: float(np.abs(v).max())
                for k, v in self.bias_delta.items()}

    def __call__(self, images):
        if self.act_scales is None:
            raise RuntimeError('calibrate() before inference')
        if self._fn is None:
            mcfg = self._mcfg
            scales, acc = self.act_scales, self.acc_dtype

            def fn(q, flat, x):
                ops = Int8Ops(q, flat, scales, acc,
                              mean_pixel=mcfg['mean_pixel'],
                              bf16_stem=mcfg.get('bf16_stem', False),
                              s8_join=mcfg.get('s8_join', False))
                return twin_forward(ops, x, mcfg)

            fsites = float_sites(mcfg)
            flat_dev = self._flat_f32()
            ffinal = {s: flat_dev[s] for s in fsites if s in flat_dev}
            if self.mesh is not None:
                from ursonet_tpu import parallel
                rep = parallel.replicated(self.mesh)
                xsh = parallel.batch_sharding(self.mesh)
                self._fn = jax.jit(fn, in_shardings=(rep, rep, xsh))
                self._q_dev = jax.device_put(self._prepared_q(), rep)
                self._ffinal_dev = jax.device_put(ffinal, rep)
            else:
                self._fn = jax.jit(fn)
                self._q_dev = jax.device_put(self._prepared_q())
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
