"""Pallas TPU kernel: batched homography warp (the rotation-augmentation
hot op, ops/augment.py).

Why a kernel: TPU has no vector-gather hardware; XLA lowers the warp's
2D gather to a serial loop (~150 ms per 32×512×640 batch on v5e, ~6× the
cost of the whole ResNet-50 forward). This kernel reformulates the gather
as dense MXU work:

  * each 8×128 output tile maps under the homography to a bounded source
    bbox — for a rotation by ANY angle θ the extent is ≤
    7|cosθ|+127|sinθ|+1 (+margin) ≤ ~136 px per axis — which is DMA'd
    from HBM into VMEM with a dynamic start;
  * the per-pixel 2-D interpolation becomes two separable soft-one-hot
    contractions: out[p] = Σ_r Σ_s Oy[p,r]·T[r,s]·Ox[p,s], where
    Oy/Ox are hat-function weights (exact bilinear) or hard one-hots
    (nearest). The r-contraction is a [P,SY]×[SY,SX] matmul on the MXU;
    the s-contraction a VPU multiply-reduce.

Channels ride the grid (images pre-transposed to [B·C, H, W]) so every
VMEM tile has a clean (sublane, lane) layout.

Cost: ~10.5 MFLOP per tile → ~0.6 TFLOP per 32×512×640×3 batch, MXU-bound
instead of gather-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output tile and source-bbox sizes. SY/SX bound the source extent of a
# TY×TX tile under any rotation: (TY-1)|cosθ|+(TX-1)|sinθ|+1 ≤ 135 per
# axis, plus rounding/perspective margin. TX must be a multiple of 128
# (Mosaic lane constraint on output blocks).
TY, TX = 32, 128
# Source bbox: extent of a TY×TX tile under rotation is bounded by the
# tile diagonal +1 (max over θ of (TY-1)|cosθ|+(TX-1)|sinθ|) ≈ 132, plus
# margin and the DMA alignment slack: HBM slice starts must sit on
# (8,128) tile boundaries, so the y-start aligns down by up to 7 rows and
# the x-start by up to 127 lanes. TY=32 (vs 8) costs no extra bbox — the
# diagonal dominates — but cuts the per-tile DMA count 4x (the kernel is
# DMA-latency-bound, not MXU-bound).
SY, SX = 144, 384
# NOTE: an in-kernel roll-compaction of the x band (SXE=160 instead of
# 384 matmul columns, ~2.4x less MXU work) is logically correct — it
# passes in interpreter mode — but miscompiles on the Mosaic TPU backend
# when pltpu.roll gets a grid-dependent dynamic shift; kept disabled.
SXE = SX


def _kernel(m_ref, src_ref, out_ref, t_vmem, sems, *, h, w, c,
            interpolation):
    """One program warps a full [H, TX] output column strip: the y-blocks
    are looped inside with double-buffered source DMAs (start block k+1's
    copy before computing block k), hiding the DMA latency that dominated
    the one-block-per-program variant."""
    g0 = pl.program_id(0)          # image*channel index
    j = pl.program_id(1)           # output col block

    img = g0 // c if c > 1 else g0
    m00 = m_ref[img, 0, 0]
    m01 = m_ref[img, 0, 1]
    m02 = m_ref[img, 0, 2]
    m10 = m_ref[img, 1, 0]
    m11 = m_ref[img, 1, 1]
    m12 = m_ref[img, 1, 2]
    m20 = m_ref[img, 2, 0]
    m21 = m_ref[img, 2, 1]
    m22 = m_ref[img, 2, 2]

    def src_coords(xs, ys):
        den = m20 * xs + m21 * ys + m22
        return ((m00 * xs + m01 * ys + m02) / den,
                (m10 * xs + m11 * ys + m12) / den)

    x0 = (j * TX).astype(jnp.float32)
    n_blocks = h // TY

    def bbox(k):
        """Tile-aligned source-band start for y-block k (+2px margin for
        rounding and the mild perspective of camera-rotation
        homographies; h-SY / w-SX are (8,128)-aligned per supported())."""
        y0 = float(k * TY)
        cx = jnp.stack([x0, x0 + TX - 1, x0, x0 + TX - 1])
        cy = jnp.stack([jnp.float32(y0), jnp.float32(y0),
                        jnp.float32(y0 + TY - 1), jnp.float32(y0 + TY - 1)])
        sx_c, sy_c = src_coords(cx, cy)
        ty0 = jnp.clip(jnp.floor(jnp.min(sy_c)) - 2, 0,
                       h - SY).astype(jnp.int32)
        ty0 = pl.multiple_of((ty0 // 8) * 8, 8)
        tx0 = jnp.clip(jnp.floor(jnp.min(sx_c)) - 2, 0,
                       w - SX).astype(jnp.int32)
        tx0 = pl.multiple_of((tx0 // 128) * 128, 128)
        return ty0, tx0

    starts = [bbox(k) for k in range(n_blocks)]

    def dma(k, slot):
        ty0, tx0 = starts[k]
        return pltpu.make_async_copy(
            src_ref.at[g0, pl.ds(ty0, SY), pl.ds(tx0, SX)],
            t_vmem.at[slot], sems.at[slot])

    dma(0, 0).start()

    xs = x0 + jax.lax.broadcasted_iota(jnp.int32, (TX, 1), 0) \
        .astype(jnp.float32)                                   # [TX,1]
    ry = jax.lax.broadcasted_iota(jnp.int32, (TX, SY), 1) \
        .astype(jnp.float32)
    rx = jax.lax.broadcasted_iota(jnp.int32, (TX, SXE), 1) \
        .astype(jnp.float32)

    for k in range(n_blocks):
        slot = k % 2
        if k + 1 < n_blocks:
            dma(k + 1, (k + 1) % 2).start()
        dma(k, slot).wait()
        tile = t_vmem[slot].astype(jnp.bfloat16)
        ty0, tx0 = starts[k]
        ty0f = ty0.astype(jnp.float32)
        tx0f = tx0.astype(jnp.float32)
        # One output row at a time: every intermediate is a clean
        # (lanes=TX, S) 2-D vector — no cross-tile reshapes.
        for y in range(TY):
            yv = float(k * TY + y)
            sx, sy = src_coords(xs, yv)                        # [TX,1]
            if interpolation == 'nearest':
                valid = ((sx >= -0.5) & (sx < w - 0.5) &
                         (sy >= -0.5) & (sy < h - 0.5))
                oy = (jnp.floor(sy - ty0f + 0.5) == ry)
                ox = (jnp.floor(sx - tx0f + 0.5) == rx)
                oy = oy.astype(jnp.float32)
                ox = ox.astype(jnp.float32)
            else:
                # hat weights = exact bilinear; outside taps contribute 0
                valid = (sx > -1.0) & (sx < w) & (sy > -1.0) & (sy < h)
                oy = jnp.maximum(0.0, 1.0 - jnp.abs((sy - ty0f) - ry))
                ox = jnp.maximum(0.0, 1.0 - jnp.abs((sx - tx0f) - rx))
            # bf16 MXU matmul: the one-hot/hat weights lose ≤2⁻⁸ relative
            # precision — ≤1 pixel LSB on [0,255] data, irrelevant for
            # augmentation, ~2× MXU rate.
            r = jnp.dot(oy.astype(jnp.bfloat16), tile,
                        preferred_element_type=jnp.float32)
            row = jnp.sum(r * ox, axis=1, keepdims=True)       # [TX,1]
            row = jnp.where(valid, row, 0.0)
            out_ref[0, k * TY + y, :] = row[:, 0]


def _warp_pallas_2d(planes, Ms, h, w, c, interpolation):
    """planes: [B*C, H, W] f32; Ms: [B,3,3] f32."""
    bc = planes.shape[0]
    grid = (bc, w // TX)
    kernel = functools.partial(_kernel, h=h, w=w, c=c,
                               interpolation=interpolation)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # Ms (scalar reads)
            pl.BlockSpec(memory_space=pltpu.ANY),    # source planes (HBM)
        ],
        out_specs=pl.BlockSpec(
            (1, h, TX), lambda g0, j: (g0, 0, j),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bc, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, SY, SX), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(Ms, planes)


def supported(h: int, w: int) -> bool:
    return h >= SY and w >= SX and h % TY == 0 and w % TX == 0


def warp_pallas(images, Ms, interpolation: str = 'nearest'):
    """Batched homography warp: images [B,H,W,C] f32, Ms [B,3,3]
    (dst←src maps, cv2 WARP_INVERSE_MAP semantics). Falls back to the XLA
    gather path for shapes the kernel doesn't tile."""
    b, h, w, ch = images.shape
    if not supported(h, w):
        from ursonet_tpu.ops.augment import warp_bilinear_jax, warp_nearest_jax
        fn = warp_nearest_jax if interpolation == 'nearest' \
            else warp_bilinear_jax
        return fn(images, Ms)
    planes = images.astype(jnp.float32).transpose(0, 3, 1, 2).reshape(
        b * ch, h, w)
    out = _warp_pallas_2d(planes, jnp.asarray(Ms, jnp.float32), h, w, ch,
                          interpolation)
    return out.reshape(b, ch, h, w).transpose(0, 2, 3, 1)


def warp_pallas_gray(images, Ms, interpolation: str = 'nearest'):
    """Single-plane variant for grayscale-replicated batches: warps
    channel 0 and broadcasts. images [B,H,W,C]."""
    b, h, w, ch = images.shape
    if not supported(h, w):
        return warp_pallas(images, Ms, interpolation)
    planes = images[..., 0].astype(jnp.float32)
    out = _warp_pallas_2d(planes, jnp.asarray(Ms, jnp.float32), h, w, 1,
                          interpolation)
    return jnp.broadcast_to(out[..., None], (b, h, w, ch))
