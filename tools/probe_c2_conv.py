#!/usr/bin/env python3
"""Why are the C2-stage int8 convs so far off the MXU rate?

probe_requant_epilogue.py showed the epilogue is ~free and the C2
convs themselves run at 13-47 TOPS (vs 227-240 at C4/C5 shapes) —
~16% of bandwidth speed-of-light for the 1x1s. This probe tests
alternative formulations of the same math at the C2 geometry
(batch 128, 128x160 spatial) to find a faster lowering:

  conv        lax.conv_general_dilated NHWC (the serving path today)
  dot         reshape (B*H*W, Cin) @ (Cin, Cout)  [1x1 only — identical]
  dot-s8out   same but clamp->s8 output (bandwidth halved)
  conv-bf16   the bf16 conv for reference (is slowness int8-specific?)
  dot-bf16    bf16 matmul form
  conv-chw    NCHW layout variant

Usage: python tools/probe_c2_conv.py   (real TPU, ~3 min)
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _conv(x, w, stride=1, padding='VALID', out_dtype=jnp.int32):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding, dimension_numbers=dn,
        preferred_element_type=out_dtype)


def time_fn(fn, *args, reps=12):
    out = fn(*args)
    _ = int(jnp.sum(out.reshape(-1)[:4].astype(jnp.int32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = int(jnp.sum(out.reshape(-1)[:4].astype(jnp.int32)))
    return (time.perf_counter() - t0) / reps


def main():
    b = 128
    key = jax.random.PRNGKey(0)
    for label, (h, wdim, cin, cout, k) in [
            ('C2 1x1 64->256', (128, 160, 64, 256, 1)),
            ('C2 1x1 256->64', (128, 160, 256, 64, 1)),
            ('C2 3x3 64->64', (128, 160, 64, 64, 3)),
            ('C3 1x1 512->128', (64, 80, 512, 128, 1)),
    ]:
        x8 = jax.random.randint(key, (b, h, wdim, cin), -127, 128,
                                jnp.int32).astype(jnp.int8)
        w8 = jax.random.randint(key, (k, k, cin, cout), -127, 128,
                                jnp.int32).astype(jnp.int8)
        pad = 'SAME' if k > 1 else 'VALID'
        flops = 2.0 * b * h * wdim * k * k * cin * cout

        variants = {}
        variants['conv'] = jax.jit(lambda x, w: _conv(x, w, 1, pad))
        variants['conv-bf16'] = jax.jit(
            lambda x, w: _conv(x.astype(jnp.bfloat16),
                               w.astype(jnp.bfloat16), 1, pad,
                               jnp.float32))
        if k == 1:
            def dot(x, w):
                m = x.reshape(-1, x.shape[-1])
                return jax.lax.dot_general(
                    m, w.reshape(x.shape[-1], -1),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            variants['dot'] = jax.jit(dot)
            variants['dot-s8out'] = jax.jit(
                lambda x, w: jnp.clip(dot(x, w), -127, 127)
                .astype(jnp.int8))
            variants['dot-bf16'] = jax.jit(
                lambda x, w: jax.lax.dot_general(
                    x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16),
                    w.reshape(x.shape[-1], -1).astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
        # NCHW input layout
        xc = jnp.transpose(x8, (0, 3, 1, 2))

        def conv_chw(x, w):
            dn = jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ('NCHW', 'HWIO', 'NCHW'))
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), pad, dimension_numbers=dn,
                preferred_element_type=jnp.int32)
        variants['conv-chw'] = jax.jit(conv_chw)

        for name, fn in variants.items():
            xin = xc if name == 'conv-chw' else x8
            try:
                dt = time_fn(fn, xin, w8)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({'shape': label, 'variant': name,
                                  'error': str(e)[:80]}), flush=True)
                continue
            print(json.dumps({
                'shape': label, 'variant': name,
                'ms': round(dt * 1e3, 3),
                'tops': round(flops / dt / 1e12, 1)}), flush=True)


if __name__ == '__main__':
    main()
