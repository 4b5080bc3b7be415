#!/usr/bin/env python3
"""Same-process A/B of int8 serving variants.

Cross-process bench.py pairs drift ±3-7% with the tunnel (round-3
observation: back-to-back processes measured 3238 / 3015 on the
identical production config), so variant deltas must be measured with
ALL variants alternating inside ONE process: compile every variant
first, then interleave timing blocks A,B,C,A,B,C,... so drift averages
out of the comparison.

Usage: python tools/ab_serving.py [--batch 128] [--iters 16] [--rounds 4]
       [--variants base,host_s2d,bf16_stem]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_variant(name, batch, h, w):
    import flax.linen as nn

    from ursonet_tpu.config import Config
    from ursonet_tpu.models.quant import QuantizedModel
    from ursonet_tpu.models.ursonet import build_model

    config = Config()
    config.BACKBONE = 'resnet50'
    config.BOTTLENECK_WIDTH = 128
    config.BRANCH_SIZE = 1024
    config.REGRESS_LOC = True
    config.REGRESS_ORI = False
    config.ORI_BINS_PER_DIM = 24
    config.IMAGE_RESIZE_MODE = 'pad64'
    config.IMAGE_MIN_DIM = h
    config.IMAGE_MAX_DIM = w
    config.F16 = True
    bf16 = False
    # composable variant spec: '+'-separated tokens, e.g. 'w05+s8join'
    for tok in name.split('+'):
        if tok in ('base', ''):
            pass
        elif tok == 'host_s2d':
            config.QUANT_STEM_S2D = True
            config.QUANT_HOST_S2D = True
        elif tok == 'bf16_stem':
            config.QUANT_BF16_STEM = True
        elif tok == 's2d':
            config.QUANT_STEM_S2D = True
        elif tok == 's8join':
            config.QUANT_S8_JOIN = True
        elif tok == 'bf16':  # plain Flax bf16 serving (bench BENCH_QUANT=0)
            bf16 = True
        elif tok.startswith('w'):      # wNN -> INNER_WIDTH_MULT 0.NN
            config.INNER_WIDTH_MULT = float('0.' + tok[1:])
        else:
            raise SystemExit(f'unknown variant token {tok!r}')
    if bf16 and ('host_s2d' in name or 'bf16_stem' in name
                 or 's8join' in name or 's2d' in name):
        raise SystemExit('bf16 composes only with wNN tokens')
    config.update()

    model = build_model(config)
    init_images = jax.jit(
        lambda k: jax.random.uniform(k, (1, h, w, 3), jnp.float32)
    )(jax.random.PRNGKey(1))
    variables = nn.unbox(
        jax.jit(lambda r: model.init(r, init_images, training=False))(
            jax.random.PRNGKey(0)))

    if bf16:
        images = jax.jit(
            lambda k: jax.random.uniform(k, (batch, h, w, 3), jnp.float32,
                                         -120.0, 135.0)
        )(jax.random.PRNGKey(0))
        params = jax.device_put(variables['params'])
        stats = jax.device_put(variables['batch_stats'])
        jit_apply = jax.jit(
            lambda p, bs, x: model.apply({'params': p, 'batch_stats': bs},
                                         x, training=False))

        def forward(x):
            return jit_apply(params, stats, x)
        out = forward(images[:8])
        for k, v in out.items():
            assert bool(jnp.isfinite(v).all()), (name, k)
        return forward, images

    qm = QuantizedModel.from_variables(
        config, variables['params'], variables['batch_stats'])

    in_shape = (batch, h // 2, w // 2, 12) if 'host_s2d' in name \
        else (batch, h, w, 3)
    images = jax.jit(
        lambda k: jax.random.randint(k, in_shape, 0, 256, jnp.int32)
        .astype(jnp.uint8))(jax.random.PRNGKey(0))
    qm.calibrate(images[:8])
    out = qm(images[:8])           # compile + sanity
    for k, v in out.items():
        assert bool(jnp.isfinite(v).all()), (name, k)
    return qm, images


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--iters', type=int, default=16)
    ap.add_argument('--rounds', type=int, default=4)
    ap.add_argument('--variants', default='base,host_s2d')
    ap.add_argument('--image', default='512,640')
    args = ap.parse_args()
    h, w = (int(x) for x in args.image.split(','))

    from ursonet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    names = args.variants.split(',')
    variants = {}
    for name in names:
        variants[name] = build_variant(name, args.batch, h, w)
        print(f'built {name}', flush=True)

    reduce_out = jax.jit(lambda o: sum(jnp.sum(v.astype(jnp.float32))
                                       for v in o.values()))
    # full-batch warm (compile at the bench batch size)
    for name, (qm, images) in variants.items():
        _ = float(reduce_out(qm(images)))

    times = {n: [] for n in names}
    for r in range(args.rounds):
        for name in names:
            qm, images = variants[name]
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = qm(images)
            _ = float(reduce_out(out))       # single scalar sync
            dt = (time.perf_counter() - t0) / args.iters
            times[name].append(dt)
            print(f'round {r} {name:<10} {dt*1e3:7.2f} ms '
                  f'({args.batch/dt:8.1f} imgs/s)', flush=True)

    print('\n| variant | best imgs/s | mean imgs/s |')
    print('|---|---|---|')
    base = min(times[names[0]])
    for name in names:
        best = min(times[name])
        mean = sum(times[name]) / len(times[name])
        print(f'| {name} | {args.batch/best:.1f} | {args.batch/mean:.1f} |'
              f'{"" if name == names[0] else f"  ({base/best-1:+.1%} vs base best)"}')


if __name__ == '__main__':
    main()
