#!/usr/bin/env python3
"""Per-op accounting of the flagship training backward pass (VERDICT:
backward is 3.4x the forward; ideal is ~2x).

Times, for each ResNet-50 stage at the flagship shape (512x640, bf16,
batch configurable): the forward conv, the input gradient (dgrad) and
the kernel gradient (wgrad) of representative convs, isolated via
jax.vjp — plus the end-to-end forward and train-step as reference.
Prints one JSON line per measurement.

Usage: python tools/profile_backward.py [--batch 32]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=48):
    """Deep dispatch queue: the remote tunnel adds ~2-4 ms per call
    until ~48 calls are queued ahead of the sync (PERF.md methodology
    note), so shallow-queue timings overstate every op by ~3 ms."""
    out = fn(*args)
    jax.tree.leaves(out)
    _ = float(jnp.sum(jax.tree.leaves(out)[0][..., :1, :1]
                      .astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0][..., :1, :1]
                      .astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps


def conv_probe(batch, h, w, cin, cout, k, stride, dtype=jnp.bfloat16):
    """fwd / dgrad / wgrad times for one conv shape."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, h, w, cin), dtype)
    kern = jax.random.normal(key, (k, k, cin, cout), dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, kern.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    pad = 'SAME' if k > 1 else 'VALID'

    def conv(x, kern):
        return jax.lax.conv_general_dilated(
            x, kern, (stride, stride), pad, dimension_numbers=dn,
            preferred_element_type=dtype)

    fwd = jax.jit(conv)
    t_fwd = timeit(fwd, x, kern)

    y = fwd(x, kern)
    g = jnp.ones_like(y)

    dgrad = jax.jit(lambda x, kern, g: jax.vjp(
        lambda x_: conv(x_, kern), x)[1](g)[0])
    wgrad = jax.jit(lambda x, kern, g: jax.vjp(
        lambda k_: conv(x, k_), kern)[1](g)[0])
    t_d = timeit(dgrad, x, kern, g)
    t_w = timeit(wgrad, x, kern, g)

    flops = 2.0 * batch * (h // stride) * (w // stride) * k * k * cin * cout
    return t_fwd, t_d, t_w, flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32)
    args = ap.parse_args()
    b = args.batch

    # Representative convs per stage at 512x640 input (stage: h w cin
    # cout k stride) — the 3x3s carry most FLOPs; 1x1s shown for the
    # projection cost; stem separately.
    shapes = [
        ('stem7x7/2', 512, 640, 3, 64, 7, 2),
        ('C2-3x3', 128, 160, 64, 64, 3, 1),
        ('C2-1x1x256', 128, 160, 64, 256, 1, 1),
        ('C3-3x3', 64, 80, 128, 128, 3, 1),
        ('C3-1x1x512', 64, 80, 128, 512, 1, 1),
        ('C4-3x3', 32, 40, 256, 256, 3, 1),
        ('C4-1x1x1024', 32, 40, 256, 1024, 1, 1),
        ('C5-3x3', 16, 20, 512, 512, 3, 1),
        ('C5-1x1x2048', 16, 20, 512, 2048, 1, 1),
        ('C3-down3x3/2', 128, 160, 128, 128, 3, 2),
        ('C4-down3x3/2', 64, 80, 256, 256, 3, 2),
        ('C5-down3x3/2', 32, 40, 512, 512, 3, 2),
    ]
    # Per-block multiplicity in ResNet-50 (stage blocks: 3,4,6,3).
    mult = {'C2': 3, 'C3': 4, 'C4': 6, 'C5': 3, 'st': 1}

    total = {'fwd': 0.0, 'dgrad': 0.0, 'wgrad': 0.0}
    for name, h, w, cin, cout, k, s in shapes:
        t_fwd, t_d, t_w, flops = conv_probe(b, h, w, cin, cout, k, s)
        m = mult.get(name[:2], 1)
        print(json.dumps({
            'conv': name, 'batch': b,
            'fwd_ms': round(t_fwd * 1e3, 2),
            'dgrad_ms': round(t_d * 1e3, 2),
            'wgrad_ms': round(t_w * 1e3, 2),
            'dgrad_over_fwd': round(t_d / t_fwd, 2),
            'wgrad_over_fwd': round(t_w / t_fwd, 2),
            'fwd_tflops': round(flops / t_fwd / 1e12, 1),
            'blocks': m,
        }), flush=True)
        total['fwd'] += m * t_fwd
        total['dgrad'] += m * t_d
        total['wgrad'] += m * t_w
    print(json.dumps({'summed_ms': {k: round(v * 1e3, 1)
                                    for k, v in total.items()},
                      'bwd_over_fwd': round(
                          (total['dgrad'] + total['wgrad'])
                          / total['fwd'], 2)}), flush=True)


if __name__ == '__main__':
    main()
