#!/usr/bin/env python3
"""Fused Pallas stem for the int8 serving path: quantized s2d stem conv
+ bias/ReLU/requant + 3x3/2 maxpool in ONE kernel.

Why: the serving audit (PERF.md round 2) leaves the stem block as the
one non-speed-of-light stage: u8->s8 quantize 0.61 ms + 7x7/2 stem conv
3.48 ms + maxpool 1.35 ms = 5.44 ms of the 39.4 ms step, against a
~1.4 ms traffic floor. XLA cannot fuse a convolution into a
reduce-window, so the 671 MB conv output makes a full HBM round trip.
Round-3 A/B showed neither the bf16 stem (-2.7%) nor the host-s2d XLA
path (-2.2%) recovers it. This kernel:

  * consumes the HOST-s2d uint8 input ([B,H/2,W/2,12], the free host
    reindex — engine._host_s2d_maybe), pre-padded and shifted to s8 by
    one cheap XLA pass (pad+sub, ~0.45 ms at flagship);
  * computes the 4x4/1 s2d stem conv as an im2col matmul
    (patches [33*W2, 192] @ W [192, 64] -> int32) per 16-pooled-row
    band, with the input-quantize folded EXACTLY into the epilogue:
    the u8 pixels are used at scale 1.0 (zero-point 128 via the s8
    shift), which is strictly finer than the calibrated ~1.09 input
    step of the XLA path;
  * applies alpha/beta (weight-scale x bias incl. the mean/zero-point
    correction), ReLU, requantize to the conv1/out site scale, and the
    3x3/2 SAME maxpool entirely in VMEM, writing only the pooled
    [B,H/4,W/4,64] s8 output (168 MB instead of 839 MB of post-stem
    HBM traffic at flagship).

Usage:
  python tools/probe_pallas_stem.py --check        # CPU interpret mode
  python tools/probe_pallas_stem.py                # on-chip timing
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

TY = 16           # pooled output rows per grid step
CONV_ROWS = 2 * TY + 1   # conv rows needed by TY pooled rows (halo 1)
IN_ROWS = CONV_ROWS + 3  # input rows needed by those conv rows (4-tap)


def _stem_kernel(x_hbm, w_ref, ab_ref, out_ref, xs, p, sem, *,
                 half, h_conv, nt):
    """One (batch, row-band) step: DMA 36 input rows, im2col, one
    matmul, epilogue, pool, write TY pooled rows.

    Mosaic constraint that shapes everything here: strided slices /
    gathers only exist for trivial cases, so the kernel NEVER
    subsamples. The host pre-pass splits the s2d input into even/odd
    column-parity planes; the kernel computes even-column and odd-column
    conv outputs as separate row blocks of ONE matmul, and the 3x3/2
    pool then needs only contiguous slices, static rolls and
    leading-dim reshapes.

    x_hbm:  [B, H2+4, 2, half+2, 12] s8 (padded, u8-128-shifted,
            col-parity-split: dim 2 is col%2, dim 3 is col//2)
    w_ref:  [192, 64] s8 (s2d stem kernel, tap-major rows)
    ab_ref: [2, 64] f32 — alpha (scale) / beta (bias) epilogue rows
    out_ref:[1, TY, half, 64] s8 block (pooled)
    xs:     [2, IN_ROWS, 2, half+2, 12] s8 (double-buffered DMA)
    p:      [2*CONV_ROWS*half, 192] s8 (even-col patches then odd-col)
    """
    g = pl.program_id(0)
    total = pl.num_programs(0)
    t = g % nt

    def dma(gg, slot):
        bb, tt = gg // nt, gg % nt
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(2 * TY * tt, IN_ROWS)],
            xs.at[slot], sem.at[slot])

    @pl.when(g == 0)
    def _():
        dma(g, 0).start()

    @pl.when(g + 1 < total)
    def _():
        dma(g + 1, (g + 1) % 2).start()

    dma(g, g % 2).wait()
    x = xs[g % 2]                       # [IN_ROWS, 2, half+2, 12]

    # im2col. Output col c = 2j+P reads padded cols 2j+P+kx, i.e. plane
    # (P+kx)%2 at offset j + (P+kx)//2 — contiguous in the parity-split
    # layout for every tap.
    k_rows = CONV_ROWS * half
    for parity in range(2):
        for ky in range(4):
            for kx in range(4):
                tap = ky * 4 + kx
                plane = (parity + kx) % 2
                off = (parity + kx) // 2
                blk = x[ky:ky + CONV_ROWS, plane, off:off + half, :]
                p[parity * k_rows:(parity + 1) * k_rows,
                  tap * 12:(tap + 1) * 12] = blk.reshape(k_rows, 12)

    acc = jax.lax.dot_general(
        p[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)      # [2*k_rows, 64]

    alpha = ab_ref[0, :]
    beta = ab_ref[1, :]
    y = acc.astype(jnp.float32) * alpha[None, :] + beta[None, :]
    # fused ReLU + requant (alpha/beta are pre-scaled by 127/site_scale)
    q = jnp.clip(jnp.round(jnp.maximum(y, 0.0)), 0, 127) \
        .astype(jnp.int8)                      # [2*k_rows, 64]

    # phantom conv row (SAME pool pads one row at the bottom of the
    # image): zero it so it cannot contribute (outputs >= 0 so 0 is the
    # pool identity).
    row_base = 2 * TY * t
    idx2 = jax.lax.broadcasted_iota(jnp.int32, (2 * k_rows, 1), 0)
    q = jnp.where((idx2 % k_rows) // half + row_base < h_conv, q,
                  jnp.int8(0))
    e_q = q[0:k_rows]                  # even-col conv outputs [k_rows, 64]
    o_q = q[k_rows:2 * k_rows]         # odd-col conv outputs

    # column windows {2j, 2j+1, 2j+2} = {e[j], o[j], e[j+1]}; at the
    # image's last output col (j == half-1) SAME padding drops e[j+1]
    # (the roll would wrap into the next row there).
    idx = jax.lax.broadcasted_iota(jnp.int32, (k_rows, 1), 0)
    e1 = jnp.roll(e_q, -1, axis=0)
    cm = jnp.maximum(e_q, o_q)
    colmax = jnp.where(idx % half == half - 1, cm, jnp.maximum(cm, e1))
    # row windows {r, r+1, r+2}: rolls by whole rows; always in range
    # for the even rows kept below (r <= 2*(TY-1), r+2 <= CONV_ROWS-1).
    r1 = jnp.roll(colmax, -half, axis=0)
    r2 = jnp.roll(colmax, -2 * half, axis=0)
    rowmax = jnp.maximum(jnp.maximum(colmax, r1), r2)    # [k_rows, 64]
    # even conv rows only, via leading-dim reshapes (no strides).
    y3 = rowmax.reshape(CONV_ROWS, half, 64)
    r_even = y3[0:CONV_ROWS - 1].reshape(TY, 2, half, 64)
    out_ref[0] = r_even[:, 0]


def fused_stem(x_pad_s8, w8, alpha, beta, *, half, interpret=False):
    """x_pad_s8: [B, H2+4, W2+4, 12] s8 (pad rows/cols pre-filled with
    the zero-point fill, interior = u8 - 128). Returns pooled s8
    [B, H2//2, W2//2, 64].

    alpha[o] = sw[o] * 127 / s_site ; beta[o] = (b[o] + c0[o]*sw[o]) *
    127 / s_site — i.e. the epilogue computes round(relu(acc*a+b)) in
    requantized units directly (one fused affine instead of
    dequant->relu->requant; exact because relu commutes with positive
    scaling).
    """
    bsz, h2p, two, halfp, c = x_pad_s8.shape
    h2 = h2p - 4
    assert halfp >= half + 2           # plane width incl. pad cols
    h_conv = h2
    nt = h2 // (2 * TY)
    assert h2 % (2 * TY) == 0 and two == 2 and c == 12
    ab = jnp.stack([alpha, beta]).astype(jnp.float32)    # [2, 64]
    grid = (bsz * nt,)
    kernel = functools.partial(_stem_kernel, half=half, h_conv=h_conv,
                               nt=nt)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # x stays in HBM
            pl.BlockSpec((192, 64), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 64), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TY, half, 64),
            lambda g: (g // nt, g % nt, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h2 // 2, half, 64),
                                       jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, IN_ROWS, 2, halfp, 12), jnp.int8),
            pltpu.VMEM((2 * CONV_ROWS * half, 192), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))),
    )(x_pad_s8, w8, ab)


def pad_and_shift(x_u8_s2d, mean12):
    """XLA pre-pass: [B,H2,W2,12] u8 -> [B,H2+4,2,(W2+4)/2,12] s8:
    pad 2 rows/cols each side, shift u8-128, fill borders with
    round(mean)-128 (the value whose molded-domain equivalent is 0,
    i.e. the conv zero pad), and split columns into parity planes
    (dim 2 = col%2, dim 3 = col//2) so the kernel never strides."""
    fill = jnp.round(mean12).astype(jnp.int32) - 128      # [12]
    xi = x_u8_s2d.astype(jnp.int32) - 128
    xi = jnp.pad(xi, ((0, 0), (2, 2), (2, 2), (0, 0)), mode='constant')
    b, h, w, c = xi.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
    border = (ri < 2) | (ri >= h - 2) | (ci < 2) | (ci >= w - 2)
    xi = jnp.where(border, fill[None, None, None, :], xi)
    # col-parity split: [B,H,W,C] -> [B,H,2,W/2,C]; pad the plane width
    # to a multiple of 8 (Mosaic HBM slices need 8-aligned second-minor
    # extents — the kernel never reads the extra cols).
    xi = xi.reshape(b, h, w // 2, 2, c).transpose(0, 1, 3, 2, 4)
    halfp = w // 2
    pad = (-halfp) % 8
    if pad:
        xi = jnp.pad(xi, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)),
                     mode='constant')
    return xi.astype(jnp.int8)


def make_epilogue(w8, sw, bias, mean12, site_scale):
    """alpha/beta for fused_stem. c0[o] = sum_k W8[k,o]*(128-mean_k)
    corrects the u8->s8 shift; rq = 127/site_scale folds the requant."""
    w8f = w8.reshape(-1, 12, w8.shape[-1]).astype(np.float32)  # [16,12,64]
    c0 = np.einsum('tko,k->o', w8f, 128.0 - np.asarray(mean12, np.float32))
    rq = 127.0 / float(site_scale)
    alpha = np.asarray(sw, np.float32) * rq
    beta = (np.asarray(bias, np.float32)
            + c0 * np.asarray(sw, np.float32)) * rq
    return alpha.astype(np.float32), beta.astype(np.float32)


# --------------------------------------------------------------------------
# Reference implementation (jnp, same math) + the current XLA path
# --------------------------------------------------------------------------

def reference_stem(x_u8_s2d, w8, sw, bias, mean12, site_scale):
    """Same algorithm via jax.lax convolution + reduce_window (float
    epilogue identical to the kernel's) — ground truth for exactness."""
    xs = x_u8_s2d.astype(jnp.int32) - 128
    w = w8.reshape(4, 4, 12, -1)
    # exact border semantics: pad with round(mean)-128 (the molded-zero
    # fill) and convolve VALID — identical to what the kernel computes.
    fill = jnp.round(jnp.asarray(mean12, jnp.float32)).astype(jnp.int32) \
        - 128
    xp = jnp.pad(xs, ((0, 0), (2, 2), (2, 2), (0, 0)), mode='constant')
    b, h, wd, c = xp.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wd, 1), 2)
    border = (ri < 2) | (ri >= h - 2) | (ci < 2) | (ci >= wd - 2)
    xp = jnp.where(border, fill[None, None, None, :], xp)
    acc = jax.lax.conv_general_dilated(
        xp.astype(jnp.int8), w.astype(jnp.int8), (1, 1), 'VALID',
        dimension_numbers=jax.lax.conv_dimension_numbers(
            xp.shape, w.shape, ('NHWC', 'HWIO', 'NHWC')),
        preferred_element_type=jnp.int32)[:, :-1, :-1, :]
    alpha, beta = make_epilogue(np.asarray(w8), sw, bias, mean12,
                                site_scale)
    y = acc.astype(jnp.float32) * jnp.asarray(alpha) + jnp.asarray(beta)
    q = jnp.clip(jnp.round(jnp.maximum(y, 0.0)), 0, 127).astype(jnp.int8)
    return jax.lax.reduce_window(
        q, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        'SAME')


def check():
    rng = np.random.RandomState(0)
    b, h2, w2 = 2, 64, 32           # h2 % 32 == 0
    x = rng.randint(0, 256, (b, h2, w2, 12)).astype(np.uint8)
    w8 = rng.randint(-127, 128, (192, 64)).astype(np.int8)
    sw = rng.uniform(0.001, 0.01, 64).astype(np.float32)
    bias = rng.uniform(-1, 1, 64).astype(np.float32)
    mean12 = np.tile(np.array([123.7, 116.8, 103.9], np.float32), 4)
    site_scale = 25.0

    want = np.asarray(reference_stem(jnp.asarray(x), jnp.asarray(w8),
                                     sw, bias, mean12, site_scale))
    alpha, beta = make_epilogue(w8, sw, bias, mean12, site_scale)
    xp = pad_and_shift(jnp.asarray(x), jnp.asarray(mean12))
    got = np.asarray(fused_stem(xp, jnp.asarray(w8), jnp.asarray(alpha),
                                jnp.asarray(beta), half=w2 // 2,
                                interpret=True))
    assert got.shape == want.shape, (got.shape, want.shape)
    neq = (got != want).sum()
    print(f'shape {got.shape}, mismatches: {neq}/{got.size}')
    if neq:
        idx = np.argwhere(got != want)[:10]
        for i in idx:
            print(tuple(i), 'got', got[tuple(i)], 'want', want[tuple(i)])
        raise SystemExit(1)
    print('interpret-mode exactness: PASS')


def time_on_chip(batch, h, w, reps):
    """Kernel vs the current XLA stem section at serving shapes."""
    rng = np.random.RandomState(0)
    h2, w2 = h // 2, w // 2
    x = jnp.asarray(rng.randint(0, 256, (batch, h2, w2, 12))
                    .astype(np.uint8))
    w8 = jnp.asarray(rng.randint(-127, 128, (192, 64)).astype(np.int8))
    sw = rng.uniform(0.001, 0.01, 64).astype(np.float32)
    bias = rng.uniform(-1, 1, 64).astype(np.float32)
    mean12 = np.tile(np.array([123.7, 116.8, 103.9], np.float32), 4)
    site_scale = 25.0
    alpha, beta = make_epilogue(np.asarray(w8), sw, bias, mean12,
                                site_scale)

    fused = jax.jit(lambda xx, ww, aa, bb: fused_stem(
        pad_and_shift(xx, jnp.asarray(mean12)), ww, aa, bb, half=w2 // 2))
    ref = jax.jit(lambda xx, ww: reference_stem(
        xx, ww, sw, bias, mean12, site_scale))

    # current-production XLA section: u8 [B,H,W,3] -> quantize -> 7x7/2
    # conv -> relu/requant -> maxpool (timed for the "before" number)
    x_raw = jnp.asarray(rng.randint(0, 256, (batch, h, w, 3))
                        .astype(np.uint8))
    w7 = jnp.asarray(rng.randint(-127, 128, (7, 7, 3, 64))
                     .astype(np.int8))
    mean3 = jnp.asarray([123.7, 116.8, 103.9], jnp.float32)

    def xla_section(xx, ww):
        xm = xx.astype(jnp.float32) - mean3
        s_in = 1.09
        q = jnp.clip(jnp.round(xm / s_in), -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            q, ww, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=jax.lax.conv_dimension_numbers(
                q.shape, ww.shape, ('NHWC', 'HWIO', 'NHWC')),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * jnp.asarray(sw * s_in) \
            + jnp.asarray(bias)
        qq = jnp.clip(jnp.round(jnp.maximum(y, 0.0) * (127.0 / site_scale)),
                      0, 127).astype(jnp.int8)
        return jax.lax.reduce_window(
            qq, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            'SAME')

    xla_fn = jax.jit(xla_section)

    def bench(fn, args, label):
        out = fn(*args)
        jax.block_until_ready(out)
        # correctness guard: non-trivial output
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _ = np.asarray(out[0, 0, 0, :1])   # scalar-ish sync
        dt = (time.perf_counter() - t0) / reps
        print(f'{label:<28} {dt*1e3:8.3f} ms')
        return dt

    # on-chip exactness vs reference first
    got = np.asarray(fused(x, w8, jnp.asarray(alpha), jnp.asarray(beta)))
    want = np.asarray(ref(x, w8))
    neq = int((got != want).sum())
    print(f'on-chip exactness: {neq}/{got.size} mismatches')

    bench(fused, (x, w8, jnp.asarray(alpha), jnp.asarray(beta)),
          'pallas fused stem+pool')
    bench(xla_fn, (x_raw, w7), 'XLA quant+conv7x7+pool')
    bench(ref, (x, w8), 'XLA s2d ref (unfused)')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--check', action='store_true')
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--h', type=int, default=512)
    ap.add_argument('--w', type=int, default=640)
    ap.add_argument('--reps', type=int, default=48)
    args = ap.parse_args()
    if args.check:
        # force CPU — env vars are too late under the axon sitecustomize
        jax.config.update('jax_platforms', 'cpu')
        check()
        return
    time_on_chip(args.batch, args.h, args.w, args.reps)


if __name__ == '__main__':
    main()
