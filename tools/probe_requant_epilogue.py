#!/usr/bin/env python3
"""Pick the fastest int8 requantization epilogue on the real chip.

The serving path's per-fusion audit (PERF.md roofline) shows the
conv->requant fusions at the high-resolution stages (stem, C2) running
at 22-32% of bandwidth speed-of-light: the elementwise epilogue
(dequant-scale, bias, relu, rescale, round, clamp, s8 convert) is
VPU-bound at those element counts and serializes against the conv.
This probe times the dominant serving conv shapes under competing
epilogue formulations, isolated from the rest of the graph, so the
Int8Ops design (models/quant.py) follows measurement, not guesswork.

Variants per conv shape (batch 128, flagship 512x640 geometry):
  conv-only   acc -> s8 truncation (lower bound: no epilogue math)
  current     acc->f32 *scale +b, relu, /s, round, clip, ->s8 (9 ops)
  folded-f32  clamp(round(acc*alpha + beta), 0, 127) -> s8 (7 ops;
              relu folds into the clamp's 0 lower bound)
  folded-bf16 same chain in bf16 (wins only if the VPU packs 2x bf16)
  int-shift   per-channel int32 bias, per-tensor power-of-2 shift:
              clamp((max(acc+b,0) + half) >> k, 0, 127) -> s8
              (integer-only; needs cross-layer scale folding to use)

Usage: python tools/probe_requant_epilogue.py   (real TPU, ~3 min)
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _conv(x, w, stride, padding):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32)


def make_variant(name, w, stride, padding, cout):
    scale = jnp.full((cout,), 0.0123, jnp.float32)   # s_w * s_x
    bias = jnp.linspace(-2.0, 2.0, cout, dtype=jnp.float32)
    s_out = 0.37                                     # next site's scale/127
    alpha = scale / s_out
    beta = bias / s_out
    b_int = jnp.round(bias / 0.0123).astype(jnp.int32)

    if name == 'conv-only':
        def f(x):
            return _conv(x, w, stride, padding).astype(jnp.int8)
    elif name == 'current':
        def f(x):
            acc = _conv(x, w, stride, padding)
            y = acc.astype(jnp.float32) * scale + bias
            y = jax.nn.relu(y)
            y = jnp.clip(jnp.round(y / s_out), -127, 127)
            return y.astype(jnp.int8)
    elif name == 'folded-f32':
        def f(x):
            acc = _conv(x, w, stride, padding)
            y = acc.astype(jnp.float32) * alpha + beta
            return jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)
    elif name == 'folded-bf16':
        a16, b16 = alpha.astype(jnp.bfloat16), beta.astype(jnp.bfloat16)

        def f(x):
            acc = _conv(x, w, stride, padding)
            y = acc.astype(jnp.bfloat16) * a16 + b16
            return jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)
    elif name == 'int-shift':
        def f(x):
            acc = _conv(x, w, stride, padding)
            y = jnp.maximum(acc + b_int, 0)
            y = jnp.minimum((y + 64) >> 7, 127)
            return y.astype(jnp.int8)
    else:
        raise ValueError(name)
    return jax.jit(f)


def time_fn(fn, x, reps=12):
    out = fn(x)
    _ = int(jnp.sum(out[0, 0, 0].astype(jnp.int32)))  # warm + sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(x)
    _ = int(jnp.sum(out[0, 0, 0].astype(jnp.int32)))  # one sync at the end
    return (time.perf_counter() - t0) / reps


def main():
    b = 128
    key = jax.random.PRNGKey(0)
    shapes = [
        # (label, x shape NHWC, w HWIO, stride, padding)
        ('stem 7x7 3->64 /2', (b, 512, 640, 3), (7, 7, 3, 64), 2,
         [(3, 3), (3, 3)]),
        ('C2 1x1 64->256', (b, 128, 160, 64), (1, 1, 64, 256), 1, 'VALID'),
        ('C2 3x3 64->64', (b, 128, 160, 64), (3, 3, 64, 64), 1, 'SAME'),
        ('C2 1x1 256->64', (b, 128, 160, 256), (1, 1, 256, 64), 1, 'VALID'),
        ('C3 3x3 128->128', (b, 64, 80, 128), (3, 3, 128, 128), 1, 'SAME'),
    ]
    for label, xs, ws, stride, pad in shapes:
        x = jax.random.randint(key, xs, -127, 128, jnp.int32) \
            .astype(jnp.int8)
        w = jax.random.randint(key, ws, -127, 128, jnp.int32) \
            .astype(jnp.int8)
        flops = 2.0 * b * (xs[1] // stride) * (xs[2] // stride) \
            * ws[0] * ws[1] * ws[2] * ws[3]
        for name in ('conv-only', 'current', 'folded-f32', 'folded-bf16',
                     'int-shift'):
            fn = make_variant(name, w, stride, pad, ws[3])
            dt = time_fn(fn, x)
            print(json.dumps({
                'shape': label, 'epilogue': name,
                'ms': round(dt * 1e3, 3),
                'tops': round(flops / dt / 1e12, 1)}), flush=True)


if __name__ == '__main__':
    main()
