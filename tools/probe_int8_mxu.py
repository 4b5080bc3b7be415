#!/usr/bin/env python3
"""Decisive probe for the v5e native-int8 MXU question (PERF.md roofline).

The datasheet claims 394 TOPS int8 vs 197 TFLOPS bf16. Round-1 evidence:
XLA's int8 matmul runs at the bf16 rate (~169 TOP/s measured), i.e. XLA
does NOT use a double-rate int8 MXU mode. This probe asks whether
*Mosaic* exposes it, isolated from every memory effect:

  * tiny operands staged in VMEM once, a fori_loop re-issues the SAME
    jnp.dot ITERS times inside one kernel — pure MXU issue rate, no HBM
    traffic in the timed region;
  * int8×int8→int32, int8×int8→bf16-accum, and bf16×bf16→f32 twins at
    several tile shapes.

If int8 issue rate ≈ bf16 issue rate across all variants, the double-
rate mode is not reachable from Mosaic on this toolchain and the serving
path's measured ceiling (~164 TF/s-equivalent) is the chip's practical
speed of light for this workload.

Usage: python tools/probe_int8_mxu.py  (expects the real TPU; ~2 min)
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mxu_probe(m, n, k, iters, in_dtype, acc_dtype):
    """One kernel: acc += A@B repeated `iters` times entirely in VMEM."""

    def kernel(a_ref, b_ref, o_ref):
        def body(i, acc):
            # a tiny data dependence (XOR-free rotate via where) keeps
            # the compiler from hoisting the dot out of the loop
            return acc + jnp.dot(a_ref[:], b_ref[:],
                                 preferred_element_type=acc_dtype)
        acc = jax.lax.fori_loop(
            0, iters, body, jnp.zeros((m, n), acc_dtype))
        o_ref[:] = acc

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), acc_dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    key = jax.random.PRNGKey(0)
    if in_dtype == jnp.int8:
        a = jax.random.randint(key, (m, k), -127, 127, jnp.int32) \
            .astype(jnp.int8)
        b = jax.random.randint(key, (k, n), -127, 127, jnp.int32) \
            .astype(jnp.int8)
    else:
        a = jax.random.normal(key, (m, k), in_dtype)
        b = jax.random.normal(key, (k, n), in_dtype)

    out = run(a, b)  # compile + warm
    _ = float(jnp.sum(out.astype(jnp.float32)))
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(a, b)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # one sync at the end
    dt = (time.perf_counter() - t0) / reps
    tops = 2.0 * m * n * k * iters / dt / 1e12
    return tops, dt


def xla_probe(size, in_dtype, acc_dtype, reps=4):
    """Large single matmul through XLA, scalar-synced."""
    key = jax.random.PRNGKey(1)
    if in_dtype == jnp.int8:
        a = jax.random.randint(key, (size, size), -127, 127, jnp.int32) \
            .astype(jnp.int8)
        b = jax.random.randint(key, (size, size), -127, 127, jnp.int32) \
            .astype(jnp.int8)
    else:
        a = jax.random.normal(key, (size, size), in_dtype)
        b = jax.random.normal(key, (size, size), in_dtype)

    @jax.jit
    def run(a, b):
        return jnp.sum(jnp.dot(a, b, preferred_element_type=acc_dtype)
                       .astype(jnp.float32))

    _ = float(run(a, b))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(a, b)
    _ = float(out)
    dt = (time.perf_counter() - t0) / reps
    return 2.0 * size ** 3 / dt / 1e12, dt


def main():
    results = []

    for size in (8192,):
        for name, ind, accd in (
                ('bf16->f32', jnp.bfloat16, jnp.float32),
                ('int8->int32', jnp.int8, jnp.int32)):
            tops, dt = xla_probe(size, ind, accd)
            r = {'probe': 'xla', 'variant': name, 'size': size,
                 'tops': round(tops, 1), 'ms': round(dt * 1e3, 2)}
            print(json.dumps(r), flush=True)
            results.append(r)

    iters = 512
    for (m, n, k) in ((256, 256, 256), (512, 512, 512), (512, 512, 1024),
                      (1024, 1024, 512)):
        for name, ind, accd in (
                ('bf16->f32', jnp.bfloat16, jnp.float32),
                ('int8->int32', jnp.int8, jnp.int32),
                ('int8->bf16', jnp.int8, jnp.bfloat16)):
            try:
                tops, dt = mxu_probe(m, n, k, iters, ind, accd)
                r = {'probe': 'pallas-vmem-loop', 'variant': name,
                     'mnk': [m, n, k], 'tops': round(tops, 1),
                     'ms': round(dt * 1e3, 2)}
            except Exception as e:  # record unsupported combos as facts
                r = {'probe': 'pallas-vmem-loop', 'variant': name,
                     'mnk': [m, n, k], 'error': str(e)[:200]}
            print(json.dumps(r), flush=True)
            results.append(r)

    return results


if __name__ == '__main__':
    main()
