#!/usr/bin/env python3
"""Settle the true int8 MXU ceiling with a dedicated Pallas matmul sweep.

VERDICT r2 #2: the v5e datasheet says ~394 int8 TOPS; XLA-lowered convs
and dots measure 210-240. This probe writes a hand-tiled Pallas
int8 x int8 -> int32 matmul and sweeps (TM, TN, TK) tilings on the
8192^3 shape (and the flagship conv-as-matmul shapes), recording
achieved TOPS per tiling next to the XLA `jnp.dot` baseline, so the
ceiling claim rests on a real Mosaic kernel-space search rather than
one lowering.

Outputs a markdown table (paste into PERF.md) and optionally dumps the
Mosaic/LLO assembly of the best kernel (--dump-asm) for the artifact
trail.

Methodology: every timing queues >=REPS executions and syncs ONCE at
the end (per-dispatch tunnel overhead is ~2-4 ms; shallow queues read
~3 ms slow — PERF.md round-2 methodology note).

Usage:
  python tools/probe_pallas_int8_matmul.py               # full sweep
  python tools/probe_pallas_int8_matmul.py --quick       # subset
  python tools/probe_pallas_int8_matmul.py --check       # CPU interpret-mode
                                                         # correctness only
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


def _matmul_kernel(a_ref, b_ref, out_ref, acc_ref, *, k_tiles):
    """One (TM, TN) output tile; grid dim 2 walks K (innermost).

    Accumulates int32 in VMEM scratch; the MXU consumes the int8
    operands directly (dot_general with preferred_element_type=int32 is
    the double-rate int8 path when Mosaic tiles it onto the MXU)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == k_tiles - 1)
    def _():
        out_ref[:] = acc_ref[:]


def pallas_int8_matmul(a, b, tm, tn, tk, *, interpret=False,
                       dimension_semantics=None):
    m, k = a.shape
    k2, n = b.shape
    assert k == k2 and m % tm == 0 and n % tn == 0 and k % tk == 0
    k_tiles = k // tk
    params = {}
    if not interpret:
        kw = dict(vmem_limit_bytes=100 * 1024 * 1024)
        if dimension_semantics is not None:
            kw['dimension_semantics'] = dimension_semantics
        try:
            params['compiler_params'] = pltpu.CompilerParams(**kw)
        except TypeError:  # knob names vary across jax versions
            params['compiler_params'] = pltpu.CompilerParams(
                vmem_limit_bytes=kw['vmem_limit_bytes'])
    return pl.pallas_call(
        functools.partial(_matmul_kernel, k_tiles=k_tiles),
        grid=(m // tm, n // tn, k_tiles),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        interpret=interpret,
        **params,
    )(a, b)


def check_correctness():
    """Interpreter-mode equivalence vs jnp on a small shape (CPU-safe)."""
    rng = np.random.RandomState(0)
    a = rng.randint(-128, 128, (128, 256), dtype=np.int8)
    b = rng.randint(-128, 128, (256, 128), dtype=np.int8)
    want = a.astype(np.int32) @ b.astype(np.int32)
    for tm, tn, tk in [(128, 128, 128), (64, 128, 256), (128, 128, 64)]:
        got = np.asarray(pallas_int8_matmul(
            jnp.asarray(a), jnp.asarray(b), tm, tn, tk, interpret=True))
        np.testing.assert_array_equal(got, want)
        print(f'  tile ({tm},{tn},{tk}) exact vs numpy ok')
    print('interpret-mode correctness: PASS')


def _time_tops(fn, args, flops, reps):
    out = fn(*args)           # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return flops / dt / 1e12, dt


def sweep(m, n, k, tilings, reps, dump_asm=False):
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randint(-128, 128, (m, k), dtype=np.int8))
    b = jnp.asarray(rng.randint(-128, 128, (k, n), dtype=np.int8))
    ops = 2.0 * m * n * k

    # XLA baseline (the round-2 number to beat: ~210 TOPS at 8192^3).
    xla = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32))
    want = xla(a, b)
    tops_xla, dt = _time_tops(xla, (a, b), ops, reps)
    rows = [('XLA dot_general', '-', tops_xla, dt * 1e3, 'baseline')]
    print(f'XLA baseline: {tops_xla:.1f} TOPS ({dt*1e3:.2f} ms)',
          flush=True)

    best = None
    for tm, tn, tk in tilings:
        if m % tm or n % tn or k % tk:
            continue
        vmem = tm * tk + tk * tn + tm * tn * 4 + tm * tn * 4
        if vmem * 2 > 110 * 1024 * 1024:  # double-buffered operands
            rows.append((f'({tm},{tn},{tk})', f'{vmem>>20}MB', 0.0, 0.0,
                         'skip: exceeds VMEM'))
            continue
        try:
            f = jax.jit(lambda x, y, tm=tm, tn=tn, tk=tk:
                        pallas_int8_matmul(x, y, tm, tn, tk))
            got = f(a, b)
            ok = bool(jnp.all(got == want))
            if not ok:
                rows.append((f'({tm},{tn},{tk})', f'{vmem>>20}MB', 0.0,
                             0.0, 'WRONG RESULT'))
                continue
            tops, dt = _time_tops(f, (a, b), ops, reps)
            note = ''
            rows.append((f'({tm},{tn},{tk})', f'{vmem>>20}MB', tops,
                         dt * 1e3, note))
            print(f'  tile ({tm},{tn},{tk}): {tops:.1f} TOPS '
                  f'({dt*1e3:.2f} ms)', flush=True)
            if best is None or tops > best[0]:
                best = (tops, (tm, tn, tk), f)
        except Exception as e:
            rows.append((f'({tm},{tn},{tk})', f'{vmem>>20}MB', 0.0, 0.0,
                         f'compile error: {str(e)[:60]}'))
            print(f'  tile ({tm},{tn},{tk}): ERROR {str(e)[:120]}',
                  flush=True)

    print(f'\n### Pallas int8 matmul sweep — {m}x{k} @ {k}x{n}, '
          f'{reps} queued reps\n')
    print('| tiling (TM,TN,TK) | VMEM | TOPS | ms | note |')
    print('|---|---|---|---|---|')
    for name, vm, tops, ms, note in rows:
        print(f'| {name} | {vm} | {tops:.1f} | {ms:.2f} | {note} |')
    if best:
        print(f'\nbest pallas: {best[0]:.1f} TOPS at {best[1]} '
              f'vs XLA {tops_xla:.1f}')
        if dump_asm:
            txt = jax.jit(best[2]).lower(a, b).compile().as_text()
            path = '/tmp/pallas_int8_best_hlo.txt'
            with open(path, 'w') as fh:
                fh.write(txt)
            print(f'optimized HLO of best kernel -> {path}')
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--check', action='store_true',
                    help='CPU interpret-mode correctness only')
    ap.add_argument('--quick', action='store_true')
    ap.add_argument('--m', type=int, default=8192)
    ap.add_argument('--n', type=int, default=8192)
    ap.add_argument('--k', type=int, default=8192)
    ap.add_argument('--reps', type=int, default=48)
    ap.add_argument('--dump-asm', action='store_true')
    args = ap.parse_args()

    if args.check:
        check_correctness()
        return

    sizes = [256, 512, 1024, 2048]
    tilings = [(tm, tn, tk) for tm in sizes for tn in sizes
               for tk in sizes]
    if args.quick:
        tilings = [(512, 512, 512), (512, 1024, 1024), (1024, 1024, 512),
                   (1024, 1024, 1024), (2048, 1024, 512), (512, 2048, 2048)]
    sweep(args.m, args.n, args.k, tilings, args.reps,
          dump_asm=args.dump_asm)


if __name__ == '__main__':
    main()
