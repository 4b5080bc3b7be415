"""int8 saved-activation convolution for memory-bound training.

Round-2/3 profiling (PERF.md) pinned the flagship train step at
391 imgs/s to an HBM-capacity bound: the backward program carries
~15 GB of saved bf16 activations against 16 GB HBM, so XLA force-
rematerializes 29 forward convolutions (~66 ms of recompute per step).
Every explicit `jax.checkpoint` policy made it WORSE (they add
recompute without removing the pressure — tools/sweep_remat.py).

The remaining lever is lossy activation storage: a convolution whose
backward pass reads an int8 copy of its input instead of the bf16
original. Saved-tensor traffic halves (1 byte/elem + one scale per
sample), which relieves the HBM ceiling so XLA stops force-remating.

Design (TPU-first, no reference counterpart — the reference
(net.py) has no activation compression at all):
  * `conv_q8saved` is a `jax.custom_vjp` around
    `lax.conv_general_dilated`. Forward output is EXACT (computed from
    the original input). The residual is (int8 q, per-sample scale, w).
  * Backward: dx (input gradient) does not involve the activation at
    all, so it is EXACT — built with `jax.linear_transpose` of the
    conv, which emits the same transposed-conv HLO JAX's own AD would,
    with no forward recompute. Only dw (the weight gradient) sees the
    quantized activation.
  * Two dw modes:
      mode=True ('dequant'): dw = conv_wgrad(dequant(q), g) — wgrad
        operands stay bf16; simple, but the dequantized copy
        materializes in HBM (measured to LOSE end-to-end, PERF.md).
      mode='wgrad8': dw is an explicit int8×int8→int32
        `conv_general_dilated` (dimension numbers 'CHWN'/'IHWO'/'HWNC',
        g dilated by the forward stride) that reads the saved int8
        tensor DIRECTLY — no bf16 rematerialization — with the output
        gradient quantized to int8 as well (per-sample activation
        scale folded into g first, then one global scale).
        Formulation is exact vs autodiff in float
        (tools/probe_actq_wgrad8.py); only the 8-bit rounding of x
        and g is approximate. Contractions whose worst-case
        |Σ q_x·q_g| could exceed int32 (N·Ho·Wo > 2³¹/127² ≈ 133k
        output positions — most flagship-resolution convs) fall back
        to the bf16 wgrad of mode=True so correctness never depends
        on gradient statistics.
  * Per-sample symmetric scales (max-abs over H,W,C) for x: finer than
    per-tensor, and — because the batch axis is the 'data'-sharded
    axis — the max reduction stays device-local under pjit (a
    per-tensor max would insert a cross-device collective per conv).
    The wgrad8 g-scale is a GLOBAL max: the train step runs under
    GSPMD jit, so DP numerics match single-device exactly, at the
    cost of one scalar all-reduce-max per conv backward in multi-chip
    runs (acceptable for a default-off mode; sharded-vs-single parity
    is covered in tests/test_parallel.py).

Accuracy: 8-bit round-to-nearest on post-ReLU activations gives
per-element wgrad noise well under 1% relative (unit-tested in
tests/test_model.py); SGD training is insensitive at this level
(cf. ActNN/GACT which train CNNs at 2-4 bits). wgrad8 adds g-rounding
noise on the same order (bounded in the same test).

Enabled by `Config.TRAIN_ACT_Q8` = True | 'wgrad8' (threaded through
the backbone as `act_q8`); serving/inference paths never use this
module.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

Dtype = Any
Padding = Union[str, Tuple[Tuple[int, int], ...]]


def _conv_nhwc(x, w, strides, padding):
    return lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def _resolve_pad(padding, kernel_hw, strides, hw):
    """'SAME'/'VALID' → explicit ((pl,ph),(pl,ph)), lax's resolution."""
    if isinstance(padding, str):
        return tuple(lax.padtype_to_pads(hw, kernel_hw, strides, padding))
    return tuple(tuple(p) for p in padding)


def _wgrad_conv(x, g, kernel_hw, strides, pad_pairs, preferred=None):
    """Explicit weight-gradient conv: dw[kh,kw,ci,co] =
    Σ_{n,oh,ow} x[n, oh·s+kh−pl, ow·s+kw−pl, ci] · g[n,oh,ow,co].

    Expressed as conv(lhs=x spec 'CHWN' — batch=Ci, contracted
    feature=N; rhs=g spec 'IHWO' — contract over N; out spec 'HWNC'),
    with g dilated by the forward stride. Exact vs jax.grad in float
    for every geometry the backbone uses (tools/probe_actq_wgrad8.py),
    and — with int8 operands and preferred_element_type=int32 — the
    form that lets the MXU read the saved int8 tensor directly.
    """
    kh, kw = kernel_hw
    sh, sw = strides
    (plh, _), (plw, _) = pad_pairs
    H, W = x.shape[1], x.shape[2]
    Ho, Wo = g.shape[1], g.shape[2]
    kdh = (Ho - 1) * sh + 1
    kdw = (Wo - 1) * sw + 1
    pad = ((plh, kdh + kh - 1 - H - plh),
           (plw, kdw + kw - 1 - W - plw))
    return lax.conv_general_dilated(
        x, g, window_strides=(1, 1), padding=pad,
        rhs_dilation=(sh, sw),
        dimension_numbers=('CHWN', 'IHWO', 'HWNC'),
        preferred_element_type=preferred)


def _quantize_per_sample(x):
    """Symmetric per-sample int8: (q, scale) with x ≈ q·scale."""
    amax = jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True)
    scale = (jnp.maximum(amax, 1e-12) / 127.0).astype(jnp.float32)
    # Divide in f32 even under bf16 compute: the upcast fuses into the
    # elementwise quantize chain (no extra HBM traffic) and keeps the
    # rounding error at the 8-bit level instead of bf16's 8-bit mantissa
    # compounding it.
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv_q8saved(x, w, strides: Tuple[int, int], padding: Padding):
    """NHWC conv whose backward reads an int8-saved input (see module
    docstring). Forward value and dx are exact; dw is computed from the
    8-bit dequantized input (bf16 wgrad operands)."""
    return _conv_nhwc(x, w, strides, padding)


def _q8_fwd(x, w, strides, padding):
    y = _conv_nhwc(x, w, strides, padding)
    # Per-sample symmetric max-abs scale: keeps the reduction local to
    # the data-sharded batch axis (no per-conv collective under pjit).
    q, scale = _quantize_per_sample(x)
    return y, (q, scale, w)


def _dx_exact(q_shape, w, strides, padding, g):
    """Exact input gradient: transpose of the (linear-in-x) conv. No
    forward recompute — linear_transpose only transposes the HLO."""
    return jax.linear_transpose(
        lambda t: _conv_nhwc(t, w, strides, padding),
        jax.ShapeDtypeStruct(q_shape, w.dtype))(g)[0]


def _q8_bwd(strides, padding, res, g):
    q, scale, w = res
    dt = w.dtype
    xf = q.astype(dt) * scale.astype(dt)
    dx = _dx_exact(q.shape, w, strides, padding, g)
    # Weight gradient from the int8-dequantized activation.
    dw = jax.linear_transpose(
        lambda t: _conv_nhwc(xf, t, strides, padding),
        jax.ShapeDtypeStruct(w.shape, dt))(g)[0]
    return dx, dw


conv_q8saved.defvjp(_q8_fwd, _q8_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv_q8wgrad8(x, w, strides: Tuple[int, int], padding: Padding):
    """Like conv_q8saved, but the weight gradient is an int8×int8→int32
    conv reading the saved tensor directly (no bf16 rematerialization);
    the output gradient is quantized to int8 too (module docstring)."""
    return _conv_nhwc(x, w, strides, padding)


def _q8w8_fwd(x, w, strides, padding):
    y = _conv_nhwc(x, w, strides, padding)
    q, scale = _quantize_per_sample(x)
    return y, (q, scale, w)


# Largest contraction length whose worst case (all |q|=127, same sign)
# still fits int32: floor((2^31 - 1) / 127^2).
_INT32_SAFE_ACC = (2 ** 31 - 1) // (127 * 127)


def _q8w8_bwd(strides, padding, res, g):
    q, scale, w = res
    dt = w.dtype
    dx = _dx_exact(q.shape, w, strides, padding, g)
    n_acc = q.shape[0] * g.shape[1] * g.shape[2]
    if n_acc > _INT32_SAFE_ACC:
        # int32 accumulator could wrap in the worst case (shapes are
        # static, so this is a trace-time branch): use the dequantized
        # bf16 wgrad instead — same saved-activation compression,
        # unconditional correctness.
        xf = q.astype(dt) * scale.astype(dt)
        dw = jax.linear_transpose(
            lambda t: _conv_nhwc(xf, t, strides, padding),
            jax.ShapeDtypeStruct(w.shape, dt))(g)[0]
        return dx, dw
    # Fold the per-sample activation scale into g (so the int8 conv's
    # result needs only ONE scalar rescale), then quantize with a
    # global max (GSPMD-global: DP == single-device numerics).
    G = g.astype(jnp.float32) * scale
    sg = jnp.maximum(jnp.max(jnp.abs(G)), 1e-30) / 127.0
    qg = jnp.clip(jnp.round(G / sg), -127, 127).astype(jnp.int8)
    kh, kw = w.shape[0], w.shape[1]
    pads = _resolve_pad(padding, (kh, kw), strides,
                        (q.shape[1], q.shape[2]))
    dw = _wgrad_conv(q, qg, (kh, kw), strides, pads,
                     preferred=jnp.int32)
    dw = (dw.astype(jnp.float32) * sg).astype(dt)
    return dx, dw


conv_q8wgrad8.defvjp(_q8w8_fwd, _q8w8_bwd)


def _canon_padding(padding) -> Padding:
    """Hashable padding for the custom_vjp nondiff arg: keep strings,
    tuple-ify pair lists."""
    if isinstance(padding, str):
        return padding
    return tuple((int(lo), int(hi)) for lo, hi in padding)


class ConvQ8(nn.Module):
    """Drop-in replacement for the backbone's `nn.Conv` with int8 saved
    activations. Parameter names, shapes, and initializers match
    `flax.linen.Conv` exactly ('kernel' HWIO lecun_normal, 'bias'
    zeros), so checkpoints are interchangeable with the standard path.
    `mode` True → bf16 wgrad from the dequantized copy; 'wgrad8' →
    direct int8×int8 wgrad (module docstring).
    """
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Any = 'SAME'
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    mode: Any = True

    @nn.compact
    def __call__(self, x):
        if self.mode not in (True, 'wgrad8'):
            raise ValueError(
                f"ConvQ8 mode must be True or 'wgrad8' "
                f"(got {self.mode!r})")
        kh, kw = self.kernel_size
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features))
        dt = self.dtype
        fn = conv_q8wgrad8 if self.mode == 'wgrad8' else conv_q8saved
        y = fn(x.astype(dt), kernel.astype(dt),
               tuple(int(s) for s in self.strides),
               _canon_padding(self.padding))
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(dt)
        return y
