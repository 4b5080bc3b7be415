"""Flax ResNet backbones (18/34/50/101), NHWC, TPU-first.

Structural re-design of the reference Keras graphs:
  * resnet50/101 bottleneck graph — reference net.py:85-199
  * resnet18/34 basic-block graph — reference net.py:216-282

Layer/param names mirror the reference exactly ('conv1', 'bn2a_branch2a',
'res3b_branch2c', 'stage2_unit1_conv1', ...) so released h5 weights can be
mapped 1:1 into the Flax param tree (checkpoint/h5_import.py).

Key semantics preserved:
  * BatchNorm freeze: train_bn=False (config TRAIN_BN) runs BN with running
    statistics and no stat updates even during training — the reference's
    BatchNorm(training=False) (net.py:60-76, config.py:146). Gamma/beta stay
    trainable.
  * Keras BatchNormalization defaults: epsilon=1e-3, momentum=0.99
    (needed for imported-weight fidelity).
  * The reference basic block applies a single BatchNorm (after conv1 only,
    named '<base>bn2' — net.py:230-235); reproduced as-is since the released
    resnet18/34-compatible weights assume it.
  * Stem: explicit (3,3) zero-pad then VALID 7×7/2 conv (net.py:170-171) —
    NOT 'SAME' padding; the two differ by one pixel of alignment.

TPU notes: convolutions run in the compute dtype (bfloat16 under the F16
policy) with float32 params and float32 BN statistics; XLA fuses
BN-scale+ReLU into the convolutions. For inference, `fold_bn_params`
(ursonet_tpu/models/folding.py) removes BN entirely.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

# Keras BatchNormalization defaults (keras/layers/normalization.py)
BN_EPS = 1e-3
BN_MOMENTUM = 0.99


def space_to_depth2(x):
    """Pack 2×2 spatial blocks into channels: [B,H,W,C] → [B,H/2,W/2,4C],
    channel order (dy, dx, c).

    TPU stem optimization: the raw 7×7/2 stem conv runs at ~4% MXU
    utilization (3 input channels vs 128 MXU lanes; measured 6 ms of a
    22.7 ms ResNet-50 @512×640×32 forward). On s2d-packed input the
    mathematically identical conv is 4×4/1 over 12 channels
    (`stem_kernel_to_s2d` maps the weights exactly), recovering most of
    that time. Standard MLPerf-ResNet TPU practice.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def stem_kernel_to_s2d(kernel):
    """Exactly rewrite a (7,7,C,O) stride-2 stem kernel as the equivalent
    (4,4,4C,O) stride-1 kernel on space_to_depth2 input with padding
    [(2,1),(2,1)]: W'[R,S,(dy·2+dx)·C+c,o] = W[2R+dy−1, 2S+dx−1, c, o]
    (zero where the source index falls outside [0,7))."""
    import numpy as np
    kh, kw, c, o = kernel.shape
    assert (kh, kw) == (7, 7)
    out = np.zeros((4, 4, 4 * c, o), np.asarray(kernel).dtype)
    for r in range(4):
        for s in range(4):
            for dy in range(2):
                for dx in range(2):
                    u, v = 2 * r + dy - 1, 2 * s + dx - 1
                    if 0 <= u < 7 and 0 <= v < 7:
                        out[r, s, (dy * 2 + dx) * c:(dy * 2 + dx + 1) * c] \
                            = kernel[u, v]
    return out


class FrozenAwareBN(nn.Module):
    """BatchNorm honouring the reference TRAIN_BN semantics (net.py:60-76).

    train_bn: None -> batch stats in training / running stats in eval.
              False -> always running stats, never update (frozen).
              True  -> always batch stats (reference says "don't use").
    """
    train_bn: Any = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.train_bn is None:
            use_running = not training
        elif self.train_bn is False:
            use_running = True
        else:
            use_running = not training  # True behaves like None at apply time
        return nn.BatchNorm(
            use_running_average=use_running,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)


def _conv(features, kernel, strides=1, padding='SAME', use_bias=True,
          name=None, dtype=jnp.float32, act_q8=False):
    if act_q8:
        # int8 saved-activation conv (Config.TRAIN_ACT_Q8): identical
        # forward and param tree; backward reads an int8 copy of the
        # input, halving the HBM activation working set (models/actq.py).
        # act_q8 may be True (bf16 wgrad from the dequantized copy) or
        # 'wgrad8' (direct int8×int8 weight gradient).
        from ursonet_tpu.models.actq import ConvQ8
        return ConvQ8(features, (kernel, kernel), (strides, strides),
                      padding, use_bias, dtype, act_q8, name=name)
    return nn.Conv(features, (kernel, kernel), strides=(strides, strides),
                   padding=padding, use_bias=use_bias, name=name, dtype=dtype)


class BottleneckBlock(nn.Module):
    """Bottleneck residual block (reference identity_block net.py:85-117 and
    conv_block net.py:120-158, selected by `conv_shortcut`)."""
    filters: Sequence[int]
    stage: int
    block: str
    strides: int = 1
    conv_shortcut: bool = False
    use_bias: bool = True
    train_bn: Any = False
    dtype: Dtype = jnp.float32
    act_q8: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        f1, f2, f3 = self.filters
        cname = f"res{self.stage}{self.block}_branch"
        bname = f"bn{self.stage}{self.block}_branch"
        dt = self.dtype
        aq = self.act_q8

        def bn(y, suffix):
            return FrozenAwareBN(self.train_bn, dt, name=bname + suffix)(
                y, training)

        from jax.ad_checkpoint import checkpoint_name

        y = _conv(f1, 1, self.strides, 'VALID', self.use_bias,
                  cname + '2a', dt, aq)(x)
        y = nn.relu(bn(y, '2a'))
        # Tag the NARROW (f1/f2-wide) activations for the 'narrow' remat
        # policy: saving them is 4x cheaper than the f3-wide expansion
        # output, and it spares the 3x3 conv (the block's FLOP bulk) from
        # backward recompute — only the cheap 1x1 expansion re-runs.
        y = checkpoint_name(y, 'res_narrow1')
        y = _conv(f2, 3, 1, 'SAME', self.use_bias, cname + '2b', dt, aq)(y)
        y = nn.relu(bn(y, '2b'))
        y = checkpoint_name(y, 'res_narrow2')
        y = _conv(f3, 1, 1, 'VALID', self.use_bias, cname + '2c', dt, aq)(y)
        y = bn(y, '2c')

        if self.conv_shortcut:
            sc = _conv(f3, 1, self.strides, 'VALID', self.use_bias,
                       cname + '1', dt, aq)(x)
            sc = FrozenAwareBN(self.train_bn, dt, name=bname + '1')(
                sc, training)
        else:
            sc = x
        return nn.relu(y + sc)


class BasicBlock(nn.Module):
    """Basic residual block (reference residual_basic_block net.py:216-240).

    Reproduces the reference's single-BN structure: BN follows conv1 only
    and is named '<base>bn2'; conv2 output is added to the shortcut raw.
    """
    filters: int
    stage: int   # 0-based, as in the reference loop (net.py:267)
    block: int   # 0-based
    strides: int = 1
    cut: str = 'pre'
    use_bias: bool = False
    train_bn: Any = False
    dtype: Dtype = jnp.float32
    act_q8: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        base = f"stage{self.stage + 1}_unit{self.block + 1}_"
        dt = self.dtype
        aq = self.act_q8

        if self.cut == 'post':
            sc = _conv(self.filters, 1, self.strides, 'VALID', self.use_bias,
                       base + 'sc', dt, aq)(x)
        else:
            sc = x

        pad = [(1, 1), (1, 1)]
        y = _conv(self.filters, 3, self.strides, pad, self.use_bias,
                  base + 'conv1', dt, aq)(x)
        y = FrozenAwareBN(self.train_bn, dt, name=base + 'bn2')(y, training)
        y = nn.relu(y)
        y = _conv(self.filters, 3, 1, pad, self.use_bias,
                  base + 'conv2', dt, aq)(y)
        return nn.relu(y + sc)


def _stem_conv(x, features, use_bias, name, dt, s2d: bool,
               act_q8: bool = False):
    """Stem conv: 7×7/2 with (3,3) pad (reference net.py:170-171), or its
    exact space-to-depth rewrite (4×4/1 on 2×2-packed input)."""
    if s2d:
        y = space_to_depth2(x)
        if act_q8:
            from ursonet_tpu.models.actq import ConvQ8
            return ConvQ8(features, (4, 4), (1, 1), [(2, 1), (2, 1)],
                          use_bias, dt, act_q8, name=name)(y)
        return nn.Conv(features, (4, 4), strides=(1, 1),
                       padding=[(2, 1), (2, 1)], use_bias=use_bias,
                       name=name, dtype=dt)(y)
    return _conv(features, 7, 2, [(3, 3), (3, 3)], use_bias, name, dt,
                 act_q8)(x)


def _remat_wrap(block_cls, remat):
    """Wrap a residual-block Module in nn.remat under the named policy.

    remat values (config.REMAT):
      False      — no remat; XLA decides (under HBM pressure it force-
                   remats whole expansion convs, PERF.md round 2)
      True/'all' — full block remat (nothing saveable)
      'narrow'   — save only the checkpoint_name-tagged narrow (f1/f2)
                   activations; backward re-runs just the cheap 1x1
                   expansion, never the 3x3 conv
      'dots'     — jax.checkpoint_policies.checkpoint_dots (saves
                   dot_general outputs; convs are conv_general_dilated,
                   so for CNNs this degenerates to full remat — kept in
                   the sweep to document that fact)
    """
    if not remat:
        return block_cls
    import jax as _jax
    policy = None
    if remat == 'narrow':
        policy = _jax.checkpoint_policies.save_only_these_names(
            'res_narrow1', 'res_narrow2')
    elif remat == 'dots':
        policy = _jax.checkpoint_policies.checkpoint_dots
    elif remat not in (True, 'all'):
        raise ValueError(f'unknown REMAT policy {remat!r}')
    return nn.remat(block_cls, static_argnums=(2,), policy=policy)


class ResNetBackbone(nn.Module):
    """ResNet-50/101 feature extractor; returns C5 (reference
    resnet_graph net.py:161-199 with stage5=True).

    inner_mult scales the bottleneck INNER widths (f1, f2) only — the
    reduced-FLOP serving variant (Config.INNER_WIDTH_MULT); stream
    widths and all layer names are unchanged, so checkpoints stay
    interface-compatible with the flagship and prune into this shape
    by channel selection (tools/prune_inner.py)."""
    architecture: str = 'resnet50'
    train_bn: Any = False
    dtype: Dtype = jnp.float32
    stem_s2d: bool = False
    remat: Any = False
    act_q8: bool = False
    inner_mult: float = 1.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        assert self.architecture in ('resnet50', 'resnet101')
        dt = self.dtype
        # Stage 1: explicit (3,3) pad + VALID 7x7/2 (net.py:170-171)
        y = _stem_conv(x, 64, True, 'conv1', dt, self.stem_s2d, self.act_q8)
        y = FrozenAwareBN(self.train_bn, dt, name='bn_conv1')(y, training)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding='SAME')

        # remat: recompute residual blocks in the backward pass instead
        # of keeping their activations — trades FLOPs for the HBM that
        # large batches at 512×640 need. `remat` selects the checkpoint
        # POLICY (see _remat_wrap): XLA's auto-remat choice under HBM
        # pressure is not guaranteed optimal (PERF.md round-2 training
        # item), so the policy is sweepable (tools/sweep_remat.py).
        Block = _remat_wrap(BottleneckBlock, self.remat)

        def blk(y, filters, stage, block, strides=1, conv_shortcut=False):
            f1, f2, f3 = filters
            filters = (scale_inner(f1, self.inner_mult),
                       scale_inner(f2, self.inner_mult), f3)
            return Block(
                filters, stage, block, strides, conv_shortcut,
                train_bn=self.train_bn, dtype=dt, act_q8=self.act_q8,
                name=f'res{stage}{block}')(y, training)

        # Stage 2
        y = blk(y, (64, 64, 256), 2, 'a', 1, True)
        y = blk(y, (64, 64, 256), 2, 'b')
        y = blk(y, (64, 64, 256), 2, 'c')
        # Stage 3
        y = blk(y, (128, 128, 512), 3, 'a', 2, True)
        for b in 'bcd':
            y = blk(y, (128, 128, 512), 3, b)
        # Stage 4
        y = blk(y, (256, 256, 1024), 4, 'a', 2, True)
        n4 = {'resnet50': 5, 'resnet101': 22}[self.architecture]
        for i in range(n4):
            y = blk(y, (256, 256, 1024), 4, chr(98 + i))
        # Stage 5
        y = blk(y, (512, 512, 2048), 5, 'a', 2, True)
        y = blk(y, (512, 512, 2048), 5, 'b')
        y = blk(y, (512, 512, 2048), 5, 'c')
        return y


class ResNetShallowBackbone(nn.Module):
    """ResNet-18/34 feature extractor (reference resnet_shallow_graph
    net.py:242-282). Bias-free convs for pretrained-weight compatibility."""
    architecture: str = 'resnet18'
    train_bn: Any = False
    dtype: Dtype = jnp.float32
    stem_s2d: bool = False
    remat: Any = False
    act_q8: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        assert self.architecture in ('resnet18', 'resnet34')
        dt = self.dtype
        y = _stem_conv(x, 64, False, 'conv0', dt, self.stem_s2d, self.act_q8)
        y = FrozenAwareBN(self.train_bn, dt, name='bn_conv0')(y, training)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding='SAME')

        Block = _remat_wrap(BasicBlock, self.remat)
        reps = [2, 2, 2, 2] if self.architecture == 'resnet18' else [3, 4, 6, 3]
        for stage, rep in enumerate(reps):
            for block in range(rep):
                filters = 64 * (2 ** stage)
                if block == 0 and stage == 0:
                    strides, cut = 1, 'post'
                elif block == 0:
                    strides, cut = 2, 'post'
                else:
                    strides, cut = 1, 'pre'
                y = Block(
                    filters, stage, block, strides, cut,
                    train_bn=self.train_bn, dtype=dt, act_q8=self.act_q8,
                    name=f'stage{stage + 1}_unit{block + 1}')(y, training)
        return y


def scale_inner(f: int, mult: float) -> int:
    """Scaled inner width, rounded to a multiple of 8 (min 8)."""
    return max(8, int(round(f * mult / 8.0)) * 8)


def make_backbone(architecture: str, train_bn, dtype,
                  stem_s2d: bool = False,
                  remat: Any = False,
                  act_q8: bool = False,
                  inner_mult: float = 1.0) -> nn.Module:
    if architecture in ('resnet50', 'resnet101'):
        return ResNetBackbone(architecture, train_bn, dtype, stem_s2d,
                              remat, act_q8, inner_mult, name='backbone')
    if architecture in ('resnet18', 'resnet34'):
        if inner_mult != 1.0:
            raise ValueError('INNER_WIDTH_MULT applies to bottleneck '
                             'backbones (resnet50/101) only: basic blocks '
                             'have no inner channel space distinct from '
                             'the residual stream')
        return ResNetShallowBackbone(architecture, train_bn, dtype,
                                     stem_s2d, remat, act_q8,
                                     name='backbone')
    raise ValueError(f"unsupported backbone {architecture}")
