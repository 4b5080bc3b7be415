#!/usr/bin/env python3
"""Pallas implicit-GEMM int8 3x3 conv (stride 1, SAME) with fused
requant epilogue — the serving path's compute core.

Why: tools/probe_pallas_int8_matmul.py measures hand-tiled Pallas int8
matmuls at ~303 TOPS on this v5e — 1.3x the 227-240 TOPS XLA's conv
emitters reach on the flagship's 3x3 convs (PERF.md round-2 roofline).
The 3x3 convs carry 45% of flagship FLOPs; running them at the Pallas
matmul rate is worth ~3 ms of the 39.4 ms serving step. This probe
implements conv-as-GEMM with in-VMEM patch assembly (im2col per tile)
and measures it against jax.lax.conv_general_dilated per ResNet stage
shape.

Layout notes (the lessons of probe_pallas_stem.py):
  * channels are the lane dim (64..512 — all >= the tile lane quantum
    at C3+), so every patch-build slice is lane-aligned and contiguous;
  * the kernel never subsamples (stride-1 only; the network's stride-2
    convs are 1x1s, which are plain matmuls and bandwidth-bound anyway);
  * input rows ride HBM->VMEM via double-buffered manual DMA with the
    row-band grid sequential per image, exactly like the stem kernel.

Usage:
  python tools/probe_pallas_conv3.py --check     # CPU interpret mode
  python tools/probe_pallas_conv3.py             # on-chip timings
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_hbm, w_ref, ab_ref, out_ref, xs, p, sem, *,
                 rows_per_tile, h, w, c, n, nt, out_dtype):
    """One program: conv output rows [R0, R0+rows_per_tile) of one image.

    x_hbm:  [B, H+2, W+2, C] s8 (pre-padded by one col/row each side)
    w_ref:  [9*C, N] s8 (tap-major: (ky*3+kx)*C + c)
    ab_ref: [2, N] f32 epilogue rows (alpha, beta)
    out_ref:[1, rows_per_tile, W, N]
    xs:     [2, rows_per_tile+2, W+2, C] s8 (double-buffered DMA)
    p:      [rows_per_tile*W, 9*C] s8 patches
    """
    g = pl.program_id(0)
    total = pl.num_programs(0)

    def dma(gg, slot):
        bb, tt = gg // nt, gg % nt
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(rows_per_tile * tt, rows_per_tile + 2)],
            xs.at[slot], sem.at[slot])

    @pl.when(g == 0)
    def _():
        dma(g, 0).start()

    @pl.when(g + 1 < total)
    def _():
        dma(g + 1, (g + 1) % 2).start()

    dma(g, g % 2).wait()
    x = xs[g % 2]                       # [rows+2, W+2, C]

    m = rows_per_tile * w
    for ky in range(3):
        for kx in range(3):
            tap = ky * 3 + kx
            blk = x[ky:ky + rows_per_tile, kx:kx + w, :]
            p[:, tap * c:(tap + 1) * c] = blk.reshape(m, c)

    acc = jax.lax.dot_general(
        p[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)          # [m, N]

    y = acc.astype(jnp.float32) * ab_ref[0, :][None, :] \
        + ab_ref[1, :][None, :]
    if out_dtype == jnp.int8:
        # fused ReLU+requant (alpha/beta pre-scaled by 127/site_scale)
        q = jnp.clip(jnp.round(jnp.maximum(y, 0.0)), 0, 127) \
            .astype(jnp.int8)
    else:
        q = y.astype(out_dtype)
    out_ref[0] = q.reshape(rows_per_tile, w, n)


def conv3x3_int8(x_pad, w8, alpha, beta, *, w=None, rows_per_tile=None,
                 out_dtype=jnp.int8, interpret=False):
    """x_pad: [B, H+2, Wp, C] s8 — SAME padding pre-applied, with Wp
    >= W+2 rounded up to a multiple of 8 (Mosaic HBM slices need
    8-aligned second-minor extents; extra cols are never read).
    w8: [3,3,C,N] s8; C must be a multiple of 128 (the lane-dim
    alignment rule — C3..C5 shapes). Returns [B, H, W, N]."""
    bsz, hp, wp, c = x_pad.shape
    h = hp - 2
    if w is None:
        w = wp - 2
    n = w8.shape[-1]
    assert wp % 8 == 0 and wp >= w + 2 and c % 128 == 0
    if rows_per_tile is None:
        rows_per_tile = h              # whole image: biggest M tile
    assert h % rows_per_tile == 0
    nt = h // rows_per_tile
    wk = jnp.asarray(w8).reshape(9 * c, n)
    ab = jnp.stack([jnp.asarray(alpha), jnp.asarray(beta)]) \
        .astype(jnp.float32)
    kernel = functools.partial(
        _conv_kernel, rows_per_tile=rows_per_tile, h=h, w=w, c=c, n=n,
        nt=nt, out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        grid=(bsz * nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9 * c, n), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows_per_tile, w, n),
            lambda g, nt=nt: (g // nt, g % nt, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows_per_tile + 2, wp, c), jnp.int8),
            pltpu.VMEM((rows_per_tile * w, 9 * c), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024))),
    )(x_pad, wk, ab)


def reference(x_pad, w8, alpha, beta, out_dtype=jnp.int8, w=None):
    if w is not None and x_pad.shape[2] > w + 2:
        x_pad = x_pad[:, :, :w + 2, :]
    acc = jax.lax.conv_general_dilated(
        x_pad, jnp.asarray(w8), (1, 1), 'VALID',
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x_pad.shape, np.shape(w8), ('NHWC', 'HWIO', 'NHWC')),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * jnp.asarray(alpha) + jnp.asarray(beta)
    if out_dtype == jnp.int8:
        return jnp.clip(jnp.round(jnp.maximum(y, 0.0)), 0, 127) \
            .astype(jnp.int8)
    return y.astype(out_dtype)


def check():
    jax.config.update('jax_platforms', 'cpu')
    rng = np.random.RandomState(0)
    for (h, w, c, n, rpt) in [(8, 16, 128, 128, 4), (6, 10, 256, 256, 2)]:
        x = rng.randint(-127, 128, (2, h + 2, w + 2, c)).astype(np.int8)
        w8 = rng.randint(-127, 128, (3, 3, c, n)).astype(np.int8)
        alpha = rng.uniform(1e-4, 1e-3, n).astype(np.float32)
        beta = rng.uniform(-1, 1, n).astype(np.float32)
        want = np.asarray(reference(jnp.asarray(x), w8, alpha, beta))
        wp = w + 2 + (-(w + 2)) % 8
        xp = np.zeros((2, h + 2, wp, c), np.int8)
        xp[:, :, :w + 2] = x
        got = np.asarray(conv3x3_int8(jnp.asarray(xp), w8, alpha, beta,
                                      w=w, rows_per_tile=rpt,
                                      interpret=True))
        neq = int((got != want).sum())
        print(f'({h},{w},{c}->{n}) rpt={rpt}: {neq}/{got.size} mismatches')
        assert neq == 0
    print('interpret-mode exactness: PASS')


STAGES = {  # flagship 512x640: stage -> (H, W, C) of the 3x3 convs
    'C2': (128, 160, 64),
    'C3': (64, 80, 128),
    'C4': (32, 40, 256),
    'C5': (16, 20, 512),
}


def time_on_chip(batch, reps, stages):
    rng = np.random.RandomState(0)
    for name in stages:
        h, w, c = STAGES[name]
        n = c
        wp = w + 2 + (-(w + 2)) % 8
        x = jnp.asarray(rng.randint(-127, 128, (batch, h + 2, wp, c))
                        .astype(np.int8))
        # operands must live on device BEFORE timing: numpy jit args
        # re-upload through the remote tunnel on EVERY dispatch (~0.5 ms
        # each), which serializes the queue and swamps the kernel time.
        w8 = jnp.asarray(rng.randint(-127, 128, (3, 3, c, n))
                         .astype(np.int8))
        alpha = jnp.asarray(rng.uniform(1e-4, 1e-3, n).astype(np.float32))
        beta = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
        flops = 2.0 * batch * h * w * n * 9 * c

        rpt = h                     # whole image per tile
        fns = {
            f'pallas rpt={rpt}': jax.jit(functools.partial(
                conv3x3_int8, w=w, rows_per_tile=rpt)),
            'XLA conv': jax.jit(functools.partial(reference, w=w)),
        }
        # exactness first
        outs = {k: f(x, w8, alpha, beta) for k, f in fns.items()}
        base = np.asarray(outs['XLA conv'])
        for k, v in outs.items():
            neq = int((np.asarray(v) != base).sum())
            if neq:
                print(f'{name} {k}: {neq}/{base.size} MISMATCHES')
        for k, f in fns.items():
            out = f(x, w8, alpha, beta)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(reps):
                out = f(x, w8, alpha, beta)
            _ = np.asarray(out[0, 0, 0, :1])
            dt = (time.perf_counter() - t0) / reps
            print(f'{name} ({h}x{w}x{c}) {k:<16} {dt*1e3:7.3f} ms  '
                  f'{flops/dt/1e12:6.1f} TOPS', flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--check', action='store_true')
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--reps', type=int, default=48)
    ap.add_argument('--stages', default='C2,C3,C4,C5')
    args = ap.parse_args()
    if args.check:
        check()
        return
    time_on_chip(args.batch, args.reps, args.stages.split(','))


if __name__ == '__main__':
    main()
