#!/usr/bin/env python3
"""Can a Pallas kernel beat XLA's int8 conv at the C2 1x1 shapes?

probe_c2_conv.py showed XLA's C2 1x1 64->256 (s8 in, requant s8 out)
at ~6.4 ms for 838 MB of traffic (~131 GB/s) while plain elementwise
chains reach 374-520 GB/s — a ~4x gap that is neither MXU rate nor
HBM bandwidth. This probes a streaming Pallas matmul with the requant
epilogue fused, in two forms:

  pallas      x (M,64) s8 @ w (64,256) s8 -> requant s8  (K=64: half
              the MXU/lane dim idle)
  pallas-k128 x viewed as (M/2,128) with a block-diag (128,512) weight
              (two pixels per row: full lane occupancy, 2x zero MACs
              that the idle MXU absorbs)

Baseline: the XLA conv with fused clamp->s8 epilogue (the serving
path's formulation).

Usage: python tools/probe_pallas_c2.py   (real TPU, ~2 min)
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _requant(acc, alpha, beta):
    y = acc.astype(jnp.float32) * alpha + beta
    return jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)


def matmul_requant_kernel(x_ref, w_ref, a_ref, b_ref, o_ref):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = _requant(acc, a_ref[:], b_ref[:])


@functools.partial(jax.jit, static_argnames=('tile_m',))
def pallas_mm(x, w, alpha, beta, tile_m=2048):
    m, k = x.shape
    n = w.shape[1]
    return pl.pallas_call(
        matmul_requant_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int8),
        grid_spec=pl.GridSpec(
            grid=(m // tile_m,),
            in_specs=[
                pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_m, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(x, w, alpha, beta)


def xla_conv_s8(x4, w4, alpha, beta):
    dn = jax.lax.conv_dimension_numbers(x4.shape, w4.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    acc = jax.lax.conv_general_dilated(
        x4, w4, (1, 1), 'VALID', dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    return _requant(acc, alpha, beta)


def time_fn(fn, *args, reps=12, **kw):
    fn = functools.partial(fn, **kw) if kw else fn
    out = fn(*args)
    _ = int(out.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = int(out.reshape(-1)[0])
    return (time.perf_counter() - t0) / reps


def main():
    b, h, wd = 128, 128, 160
    key = jax.random.PRNGKey(0)
    for cin, cout in [(64, 256), (256, 64)]:
        m = b * h * wd
        x = jax.random.randint(key, (m, cin), -127, 128,
                               jnp.int32).astype(jnp.int8)
        w = jax.random.randint(key, (cin, cout), -127, 128,
                               jnp.int32).astype(jnp.int8)
        alpha = jnp.full((1, cout), 0.00123, jnp.float32)
        beta = jnp.linspace(-3, 3, cout, dtype=jnp.float32).reshape(1, -1)
        label = f'C2 1x1 {cin}->{cout}'
        gb = (m * cin + m * cout) / 1e9

        dt = time_fn(jax.jit(xla_conv_s8),
                     x.reshape(b, h, wd, cin),
                     w.reshape(1, 1, cin, cout), alpha, beta)
        print(json.dumps({'shape': label, 'variant': 'xla-conv',
                          'ms': round(dt * 1e3, 3),
                          'gbps': round(gb / dt, 1)}), flush=True)

        for tile in (1024, 2048, 4096, 8192):
            try:
                dt = time_fn(pallas_mm, x, w, alpha, beta, tile_m=tile)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({'shape': label,
                                  'variant': f'pallas-m{tile}',
                                  'error': str(e)[:100]}), flush=True)
                continue
            print(json.dumps({'shape': label, 'variant': f'pallas-m{tile}',
                              'ms': round(dt * 1e3, 3),
                              'gbps': round(gb / dt, 1)}), flush=True)

        if cin == 64:
            # K-packed: two pixels per row, block-diagonal weight
            x2 = x.reshape(m // 2, 2 * cin)
            wz = jnp.zeros((cin, cout), jnp.int8)
            wbd = jnp.concatenate([
                jnp.concatenate([w, wz], axis=1),
                jnp.concatenate([wz, w], axis=1)], axis=0)  # (128, 512)
            a2 = jnp.concatenate([alpha, alpha], axis=1)
            b2 = jnp.concatenate([beta, beta], axis=1)
            for tile in (1024, 2048, 4096):
                try:
                    dt = time_fn(pallas_mm, x2, wbd, a2, b2, tile_m=tile)
                except Exception as e:  # noqa: BLE001
                    print(json.dumps({'shape': label,
                                      'variant': f'pallas-k128-m{tile}',
                                      'error': str(e)[:100]}), flush=True)
                    continue
                print(json.dumps({'shape': label,
                                  'variant': f'pallas-k128-m{tile}',
                                  'ms': round(dt * 1e3, 3),
                                  'gbps': round(gb / dt, 1)}), flush=True)


if __name__ == '__main__':
    main()
