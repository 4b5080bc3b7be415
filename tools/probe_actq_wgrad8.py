#!/usr/bin/env python3
"""Prototype + probe: int8×int8 weight-gradient conv for saved-activation
compression (the "wgrad8" lever from PERF.md's actq negative result).

The plain TRAIN_ACT_Q8 path loses on chip because the backward pass
rematerializes a bf16 copy of the int8-saved activation before the
wgrad conv (~5 B/elem extra HBM traffic vs ~4.4 ms/GB of recompute
relief — PERF.md). This variant removes that copy: the wgrad is an
explicit `lax.conv_general_dilated` whose lhs is the saved int8 tensor
and whose rhs is the output gradient quantized to int8 (per-shard
global scale, with the per-sample activation scale folded into g
first), accumulating in int32:

    dw[kh,kw,ci,co] = sum_{n,oh,ow} x[n, oh*s+kh-pl, ow*s+kw-pl, ci]
                                  * g[n, oh, ow, co]
    => conv(lhs=q_x  (N,H,W,Ci)   spec 'CHWN'   — batch=Ci, feature=N,
            rhs=q_g  (N,Ho,Wo,Co) spec 'IHWO'   — contract over N,
            out=dw   (Kh,Kw,Ci,Co) spec 'HWNC',
            window_strides=(1,1), rhs_dilation=strides,
            padding=(pl, Kd + K - 1 - H - pl), Kd=(Ho-1)*s+1)

Validation: mode `check` sweeps shapes/strides/paddings on CPU and
compares against jax.grad of the float conv (exact when quantization
is bypassed; noise-bounded with int8 on). Mode `bench` times the
flagship train step A/B on the TPU.

Usage:
  python tools/probe_actq_wgrad8.py check
  python tools/probe_actq_wgrad8.py bench [--batches 128,64] [--reps 16]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_wgrad(kernel_hw, strides, pad_pairs):
    """Build dw = f(x, g) for a fixed conv geometry — thin wrapper over
    the PRODUCTION wgrad conv (ursonet_tpu.models.actq._wgrad_conv), so
    `check` validates the shipped code, not a copy."""
    from ursonet_tpu.models.actq import _wgrad_conv

    def f(x, g, preferred=None):
        return _wgrad_conv(x, g, kernel_hw, strides, pad_pairs,
                           preferred=preferred)

    return f


def resolve_pad(padding, kernel_hw, strides, hw):
    """Production padding resolution (actq._resolve_pad)."""
    from ursonet_tpu.models.actq import _resolve_pad
    return _resolve_pad(padding, kernel_hw, strides, hw)


def check():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    jax.config.update('jax_platforms', 'cpu')

    def conv(x, w, strides, padding):
        return lax.conv_general_dilated(
            x, w, window_strides=strides, padding=padding,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    rng = np.random.RandomState(0)
    cases = [
        # (H, W, Ci, Co, K, stride, padding)
        (8, 8, 4, 6, 3, 1, 'SAME'),
        (9, 11, 3, 5, 3, 1, 'SAME'),
        (8, 8, 4, 6, 1, 1, 'VALID'),
        (8, 8, 4, 6, 1, 2, 'VALID'),
        (16, 16, 3, 8, 7, 2, ((3, 3), (3, 3))),
        (12, 10, 4, 4, 3, 2, ((1, 1), (1, 1))),
        (8, 8, 4, 6, 4, 1, ((2, 1), (2, 1))),   # s2d stem geometry
    ]
    worst = 0.0
    for (H, W, Ci, Co, K, s, pad) in cases:
        x = jnp.asarray(rng.randn(2, H, W, Ci), jnp.float32)
        w = jnp.asarray(rng.randn(K, K, Ci, Co), jnp.float32)
        g_of = jax.grad(lambda w_: jnp.sum(
            conv(x, w_, (s, s), pad) ** 2))(w)
        # our explicit wgrad with g = dL/dy = 2*y
        y = conv(x, w, (s, s), pad)
        pp = resolve_pad(pad, (K, K), (s, s), (H, W))
        dw = make_wgrad((K, K), (s, s), pp)(x, 2.0 * y)
        err = float(jnp.max(jnp.abs(dw - g_of)) /
                    (jnp.max(jnp.abs(g_of)) + 1e-12))
        worst = max(worst, err)
        print(f'H{H}xW{W} Ci{Ci} Co{Co} K{K} s{s} pad={pad}: '
              f'rel {err:.2e}')
    assert worst < 1e-5, worst
    print('float wgrad formulation EXACT vs autodiff')

    # int8 path: quantize x per-sample, g per-tensor, int32 accumulate
    (H, W, Ci, Co, K, s, pad) = cases[0]
    x = jnp.asarray(rng.rand(4, H, W, Ci), jnp.float32)  # post-ReLU-ish
    w = jnp.asarray(rng.randn(K, K, Ci, Co), jnp.float32) * 0.1
    y = conv(x, w, (s, s), pad)
    g = 2.0 * y
    ref = jax.grad(lambda w_: jnp.sum(conv(x, w_, (s, s), pad) ** 2))(w)

    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True),
                     1e-12) / 127.0
    qx = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    G = g * sx
    sg = jnp.maximum(jnp.max(jnp.abs(G)), 1e-30) / 127.0
    qg = jnp.clip(jnp.round(G / sg), -127, 127).astype(jnp.int8)
    pp = resolve_pad(pad, (K, K), (s, s), (H, W))
    dw8 = make_wgrad((K, K), (s, s), pp)(
        qx, qg, preferred=jnp.int32).astype(jnp.float32) * sg
    rel = float(jnp.linalg.norm(dw8 - ref) / jnp.linalg.norm(ref))
    print(f'int8x int8 wgrad rel error: {rel:.4f}')
    assert rel < 0.05, rel
    print('OK')


def bench(batches, reps):
    import time

    import jax
    import jax.numpy as jnp

    from ursonet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from tools.sweep_remat import run_one
    for batch in batches:
        for mode in ('wgrad8',):
            try:
                dt = run_one('none', batch, reps, mode)
                print(f'actq={mode} batch={batch}: {dt*1e3:.1f} ms/step,'
                      f' {batch/dt:.1f} imgs/s', flush=True)
            except Exception as e:
                print(f'actq={mode} batch={batch}: FAILED '
                      f'{str(e)[:140]}', flush=True)


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('mode', choices=['check', 'bench'])
    ap.add_argument('--batches', default='128,64')
    ap.add_argument('--reps', type=int, default=16)
    args = ap.parse_args()
    if args.mode == 'check':
        check()
    else:
        bench([int(b) for b in args.batches.split(',')], args.reps)
