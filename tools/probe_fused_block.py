#!/usr/bin/env python3
"""Prototype: fully-fused int8 ResNet bottleneck block as one Pallas kernel.

The serving trace (tools/profile_serving.py) shows each C2 block
costing ~5 ms (b/c) to ~9.5 ms (block a, whose shortcut conv
materializes 2.68 GB of int32) because every conv requant materializes
the full 128x160 activation in HBM. A fused kernel reads the 671 MB
input once and writes the 671 MB output once: floor ~2.3 ms at the
measured 580 GB/s.

Structure per grid step (one image x one row-strip):
  x strip + 1-row halo (s8)  --DMA-->  VMEM
  1x1 Cin->Cmid  requant            (pointwise: halo rows included)
  3x3 Cmid->Cmid requant            (im2col over the padded strip)
  1x1 Cmid->Cout + residual + relu requant --> out strip (s8)
Residual = center rows of the x strip (identity block).

Correctness gate: must match the unfused Int8Ops-style XLA composition
to <=1 int8 LSB on every element.

Usage: python tools/probe_fused_block.py   (real TPU, ~4 min)
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------- reference
def _requant_s8(acc, alpha, beta):
    y = acc.astype(jnp.float32) * alpha + beta
    return jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)


def xla_block(x, w1, w2, w3, a1, b1, a2, b2, a3, b3, res_scale):
    """Unfused composition, mirroring Int8Ops conv->relu(site) chains."""
    def conv(x, w, pad):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ('NHWC', 'HWIO', 'NHWC'))
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), pad, dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    m1 = _requant_s8(conv(x, w1, 'VALID'), a1, b1)
    m2 = _requant_s8(conv(m1, w2, 'SAME'), a2, b2)
    acc = conv(m2, w3, 'VALID')
    y = acc.astype(jnp.float32) * a3 + b3 + x.astype(jnp.float32) * res_scale
    return jnp.clip(jnp.round(jnp.maximum(y, 0.0)), 0, 127).astype(jnp.int8)


# ---------------------------------------------------------------- fused
def _fused_kernel(x_hbm, w1_ref, w2_ref, w3_ref, ab_ref, o_ref,
                  xs_ref, sem, *, strip, W, cin, cmid, cout, H):
    """One grid step: image b, row-strip s."""
    b = pl.program_id(0)
    s = pl.program_id(1)
    ns = pl.num_programs(1)
    row0 = s * strip

    # --- load x strip + halo rows into VMEM scratch (s8) -------------
    # xs_ref: (strip+2, W, cin). Row 0 = halo above, rows 1..strip =
    # body, row strip+1 = halo below.
    cp_body = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(row0, strip)], xs_ref.at[pl.ds(1, strip)],
        sem.at[0])
    cp_body.start()

    @pl.when(s > 0)
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(row0 - 1, 1)], xs_ref.at[pl.ds(0, 1)],
            sem.at[1])
        cp.start()
        cp.wait()

    @pl.when(s == 0)
    def _():
        xs_ref[0, :, :] = jnp.zeros((W, cin), jnp.int8)

    @pl.when(s < ns - 1)
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(row0 + strip, 1)],
            xs_ref.at[pl.ds(strip + 1, 1)], sem.at[2])
        cp.start()
        cp.wait()

    @pl.when(s == ns - 1)
    def _():
        xs_ref[strip + 1, :, :] = jnp.zeros((W, cin), jnp.int8)

    cp_body.wait()

    ab = ab_ref[:]          # (8, max_c) f32: a1,b1,a2,b2,a3,b3,res,(pad)
    x = xs_ref[:]           # (strip+2, W, cin)

    # --- 1x1 Cin->Cmid + requant (halo rows included) ----------------
    acc1 = jnp.dot(x.reshape((strip + 2) * W, cin), w1_ref[:],
                   preferred_element_type=jnp.int32)
    m1 = _requant_s8(acc1, ab[0, :cmid], ab[1, :cmid])
    m1 = m1.reshape(strip + 2, W, cmid)

    # --- 3x3 Cmid->Cmid + requant (9 taps as dots) --------------------
    # Row taps slice the untiled dim (free); column taps shift the
    # three int32 partial sums (i32 relayout is the well-supported
    # Mosaic path; s8 sublane shifts crash the compiler).
    parts = []
    for dx in range(3):
        p = None
        for dy in range(3):
            tap = dy * 3 + dx
            a = jnp.dot(
                m1[dy:dy + strip].reshape(strip * W, cmid),
                w2_ref[pl.ds(tap * cmid, cmid), :],
                preferred_element_type=jnp.int32)
            p = a if p is None else p + a
        parts.append(p.reshape(strip, W, cmid))
    z = jnp.zeros((strip, 1, cmid), jnp.int32)
    left = jnp.concatenate([z, parts[0][:, :W - 1, :]], axis=1)
    right = jnp.concatenate([parts[2][:, 1:, :], z], axis=1)
    acc2 = (left + parts[1] + right).reshape(strip * W, cmid)
    m2 = _requant_s8(acc2, ab[2, :cmid], ab[3, :cmid])

    # --- 1x1 Cmid->Cout + residual + relu requant ---------------------
    acc3 = jnp.dot(m2, w3_ref[:], preferred_element_type=jnp.int32)
    res = x[1:strip + 1].reshape(strip * W, cin).astype(jnp.float32)
    y = (acc3.astype(jnp.float32) * ab[4, :cout] + ab[5, :cout]
         + res * ab[6, :cout])
    y = jnp.clip(jnp.round(jnp.maximum(y, 0.0)), 0, 127)
    o_ref[:] = y.astype(jnp.int8).reshape(1, strip, W, cout)


@functools.partial(jax.jit, static_argnames=('strip',))
def fused_block(x, w1, w2, w3, ab, strip=16):
    B, H, W, cin = x.shape
    cmid = w1.shape[1]
    cout = w3.shape[1]
    kern = functools.partial(_fused_kernel, strip=strip, W=W, cin=cin,
                             cmid=cmid, cout=cout, H=H)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, H, W, cout), jnp.int8),
        grid=(B, H // strip),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x in HBM
            pl.BlockSpec((cin, cmid), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cmid, cmid), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmid, cout), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cout), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, strip, W, cout),
                               lambda b, s: (b, s, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((strip + 2, W, cin), jnp.int8),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )(x, w1, w2, w3, ab)


def time_fn(fn, *args, reps=96):
    out = fn(*args)
    _ = int(out.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = int(out.reshape(-1)[0])
    return (time.perf_counter() - t0) / reps


def main():
    B, H, W, cin, cmid = 128, 128, 160, 256, 64
    cout = cin
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.randint(ks[0], (B, H, W, cin), -127, 128,
                           jnp.int32).astype(jnp.int8)
    w1 = jax.random.randint(ks[1], (cin, cmid), -127, 128,
                            jnp.int32).astype(jnp.int8)
    w2 = jax.random.randint(ks[2], (3, 3, cmid, cmid), -127, 128,
                            jnp.int32).astype(jnp.int8)
    w3 = jax.random.randint(ks[3], (cmid, cout), -127, 128,
                            jnp.int32).astype(jnp.int8)
    a1 = jnp.full((cmid,), 3e-4, jnp.float32)
    b1 = jax.random.normal(ks[4], (cmid,)) * 5.0
    a2 = jnp.full((cmid,), 2e-5, jnp.float32)
    b2 = jax.random.normal(ks[5], (cmid,)) * 5.0
    a3 = jnp.full((cout,), 3e-4, jnp.float32)
    b3 = jax.random.normal(ks[6], (cout,)) * 5.0
    res_scale = jnp.full((cout,), 0.11, jnp.float32)

    # pack epilogue constants: (8, cout) — cmid rows are zero-padded up
    maxc = max(cmid, cout)
    ab = np.zeros((8, maxc), np.float32)
    ab[0, :cmid] = a1
    ab[1, :cmid] = b1
    ab[2, :cmid] = a2
    ab[3, :cmid] = b2
    ab[4, :cout] = a3
    ab[5, :cout] = b3
    ab[6, :cout] = res_scale
    ab = jnp.asarray(ab)

    ref_fn = jax.jit(functools.partial(xla_block))
    ref = ref_fn(x, w1.reshape(1, 1, cin, cmid), w2,
                 w3.reshape(1, 1, cmid, cout), a1, b1, a2, b2, a3, b3,
                 res_scale)

    w2f = w2.reshape(9 * cmid, cmid)
    for strip in (16, 32):
        try:
            got = fused_block(x, w1, w2f, w3, ab, strip=strip)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({'strip': strip,
                              'error': str(e)[:300]}), flush=True)
            continue
        diff = np.abs(np.asarray(got, np.int32)
                      - np.asarray(ref, np.int32))
        dt = time_fn(functools.partial(fused_block, strip=strip),
                     x, w1, w2f, w3, ab)
        gb = 2 * B * H * W * cin / 1e9
        print(json.dumps({'strip': strip, 'max_lsb_diff': int(diff.max()),
                          'frac_diff': float((diff > 0).mean()),
                          'ms': round(dt * 1e3, 3),
                          'gbps': round(gb / dt, 1)}), flush=True)

    dt = time_fn(ref_fn, x, w1.reshape(1, 1, cin, cmid), w2,
                 w3.reshape(1, 1, cmid, cout), a1, b1, a2, b2, a3, b3,
                 res_scale)
    print(json.dumps({'xla_unfused_ms': round(dt * 1e3, 3)}), flush=True)


if __name__ == '__main__':
    main()
