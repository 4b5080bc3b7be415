#!/usr/bin/env python3
"""Probe the v5e int4 MXU rate — the one unexplored compute lever past
the settled int8 ceiling (PERF.md roofline: XLA conv emitters deliver
~230 TOPS int8, serving SoL ~4,290 imgs/s; 5k would need either FLOP
cuts or a faster multiply rate).

TPU v5e datasheet lists int4 support; if int4 x int4 -> int32 issues at
2x the int8 rate, a W4A4 path for the (accuracy-tolerant) middle conv
stages would raise the serving speed-of-light.

Platform fact discovered while building this (and worked around): on
this jax 0.9.0 / axon client, an int4 (S4) jax.Array cannot cross a
jit call boundary — argument committing infinite-loops in
`_array_shard_arg` -> `device_put` (the executable requests layout
`{1,0:T(8,128)(8,1)}`, the re-put recurses; RecursionError
"Recursively calling jit"), and eager astype/fetch of int4 dies the
same way. So every variant here takes int8 operands and converts to
the probe dtype INSIDE the jitted program; the conversion is HBM-cheap
(<0.2 ms at 8192^2 vs the ~5 ms dot) and identical across variants so
relative rates are clean. Measured with the deep-queue methodology
(queue many reps, one scalar sync — per-dispatch tunnel overhead is
~2-4 ms, PERF.md).

Usage: python tools/probe_int4_mxu.py   (expects the real TPU; ~4 min)
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# int4 range kept inside int8 operands so the in-graph astype is exact
_I4 = (-7, 8)     # randint maxval is EXCLUSIVE: symmetric [-7, 7]
_I8 = (-127, 128)  # likewise [-127, 127]


def _rand8(key, shape, for_dtype):
    lo, hi = _I4 if for_dtype == jnp.int4 else _I8
    return jax.random.randint(key, shape, lo, hi, jnp.int32) \
        .astype(jnp.int8)


def xla_matmul(size, a_dtype, b_dtype, reps=24):
    key = jax.random.PRNGKey(1)
    a8 = _rand8(key, (size, size), a_dtype)
    b8 = _rand8(jax.random.PRNGKey(4), (size, size), b_dtype)
    acc = jnp.float32 if a_dtype == jnp.bfloat16 else jnp.int32

    @jax.jit
    def run(a8, b8):
        a = a8.astype(a_dtype)
        b = b8.astype(b_dtype)
        return jnp.sum(jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=acc).astype(jnp.float32))

    _ = float(run(a8, b8))  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = run(a8, b8)  # async enqueue; one scalar sync below
    _ = float(out)
    dt = (time.perf_counter() - t0) / reps
    return 2.0 * size ** 3 / dt / 1e12, dt


def xla_conv(a_dtype, b_dtype, reps=24, batch=128):
    """C4-stage 3x3 conv at the flagship serving shape (32x40 x 512^2)."""
    x8 = _rand8(jax.random.PRNGKey(2), (batch, 32, 40, 512), a_dtype)
    w8 = _rand8(jax.random.PRNGKey(3), (3, 3, 512, 512), b_dtype)
    acc = jnp.int32

    @jax.jit
    def run(x8, w8):
        y = jax.lax.conv_general_dilated(
            x8.astype(a_dtype), w8.astype(b_dtype), (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=acc)
        return jnp.sum(y.astype(jnp.float32))

    _ = float(run(x8, w8))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = run(x8, w8)
    _ = float(out)
    dt = (time.perf_counter() - t0) / reps
    flops = 2.0 * batch * 32 * 40 * 512 * 512 * 9
    return flops / dt / 1e12, dt


def pallas_vmem_loop(m, n, k, iters, dtype, reps=8):
    """acc += A@B repeated in VMEM — pure MXU issue rate, no HBM in the
    timed loop. The int8->dtype conversion happens in the kernel prologue
    (once per launch, outside the fori_loop)."""

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:].astype(dtype)
        b = b_ref[:].astype(dtype)

        def body(i, acc):
            # NOTE: `iters` accumulations of a K-deep int8 dot can wrap
            # int32 in the worst case (127*127*K*iters ~ 4e9 at K=512);
            # with zero-mean random operands overflow is statistically
            # negligible and irrelevant to timing — the OUTPUT VALUE is
            # timing-only, never a correctness reference (ADVICE r3).
            return acc + jnp.dot(a, b, preferred_element_type=jnp.int32)
        o_ref[:] = jax.lax.fori_loop(0, iters, body,
                                     jnp.zeros((m, n), jnp.int32))

    @jax.jit
    def run(a8, b8):
        return jnp.sum(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a8, b8).astype(jnp.float32))

    a8 = _rand8(jax.random.PRNGKey(0), (m, k), dtype)
    b8 = _rand8(jax.random.PRNGKey(5), (k, n), dtype)
    _ = float(run(a8, b8))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = run(a8, b8)
    _ = float(out)
    dt = (time.perf_counter() - t0) / reps
    return 2.0 * m * n * k * iters / dt / 1e12, dt


def main():
    results = []

    def record(**r):
        print(json.dumps(r), flush=True)
        results.append(r)

    for name, ad, bd in (('bf16', jnp.bfloat16, jnp.bfloat16),
                         ('int8', jnp.int8, jnp.int8),
                         ('int4', jnp.int4, jnp.int4),
                         ('w4a8', jnp.int8, jnp.int4)):
        try:
            tops, dt = xla_matmul(8192, ad, bd)
            record(probe='xla-dot-8192', variant=name,
                   tops=round(tops, 1), ms=round(dt * 1e3, 2))
        except Exception as e:
            record(probe='xla-dot-8192', variant=name, error=str(e)[:200])

    for name, ad, bd in (('int8', jnp.int8, jnp.int8),
                         ('int4', jnp.int4, jnp.int4),
                         ('w4a8', jnp.int8, jnp.int4)):
        try:
            tops, dt = xla_conv(ad, bd)
            record(probe='xla-conv-C4-3x3', variant=name,
                   tops=round(tops, 1), ms=round(dt * 1e3, 2))
        except Exception as e:
            record(probe='xla-conv-C4-3x3', variant=name,
                   error=str(e)[:200])

    for dtype, name in ((jnp.int8, 'int8'), (jnp.int4, 'int4')):
        for (m, n, k) in ((512, 512, 512), (1024, 1024, 512)):
            try:
                tops, dt = pallas_vmem_loop(m, n, k, 512, dtype)
                record(probe='pallas-vmem-loop', variant=name,
                       mnk=[m, n, k], tops=round(tops, 1),
                       ms=round(dt * 1e3, 2))
            except Exception as e:
                record(probe='pallas-vmem-loop', variant=name,
                       mnk=[m, n, k], error=str(e)[:200])

    return results


if __name__ == '__main__':
    main()
