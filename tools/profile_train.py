#!/usr/bin/env python3
"""Honest flagship train-step accounting (VERDICT: backward = 3.4x fwd).

Measures, with deep dispatch queues (the ~2-4 ms/call tunnel overhead
inflated earlier shallow-queue numbers):
  - jitted forward-only time
  - jitted forward+backward (grads only) time
  - full train step (grads + clip + SGD update) time
then captures a profiler trace of the full step and prints the top
device fusions, mapped per-op, so backward time is attributed to
actual convolutions rather than guessed.

Usage: python tools/profile_train.py [--batch 128] [--remat]
                                     [--top 25] [--trace]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--top', type=int, default=25)
    ap.add_argument('--remat', action='store_true')
    ap.add_argument('--trace', action='store_true')
    ap.add_argument('--reps', type=int, default=24)
    args = ap.parse_args()

    from ursonet_tpu.config import Config
    from ursonet_tpu.models.ursonet import build_model
    from ursonet_tpu.train.optim import make_optimizer
    from ursonet_tpu.train.state import create_train_state
    from ursonet_tpu.train.step import make_train_step
    from ursonet_tpu import parallel

    config = Config()
    config.BACKBONE = 'resnet50'
    config.BOTTLENECK_WIDTH = 128
    config.BRANCH_SIZE = 1024
    config.NR_DENSE_LAYERS = 1
    config.REGRESS_LOC = True
    config.REGRESS_ORI = True
    config.ORIENTATION_PARAM = 'quaternion'
    config.IMAGE_RESIZE_MODE = 'pad64'
    config.IMAGE_MIN_DIM = 512
    config.IMAGE_MAX_DIM = 640
    config.IMAGES_PER_GPU = args.batch
    config.F16 = True
    config.REMAT = args.remat
    config.MESH_DATA = 1
    config.MESH_MODEL = 1
    config.update()

    b, h, w = args.batch, 512, 640
    model = build_model(config)
    mesh = parallel.make_mesh(config)
    tx = make_optimizer(config)

    key = jax.random.PRNGKey(0)
    gen = jax.jit(lambda k: {
        'images': jax.random.normal(k, (b, h, w, 3), jnp.float32) * 60.0,
        'gt_loc': jax.random.normal(k, (b, 3), jnp.float32) * 5.0,
        'gt_ori': jax.random.normal(k, (b, 4), jnp.float32),
    })
    batch = gen(key)

    state = create_train_state(model, config, tx, mesh, key,
                               batch['images'][:1])
    step = make_train_step(model, config, tx)

    def timeit(fn, *a, reps=args.reps, sync):
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        sync(out)
        return (time.perf_counter() - t0) / reps

    # forward only
    fwd = jax.jit(lambda p, bs, x: model.apply(
        {'params': p, 'batch_stats': bs}, x, training=True))
    t_fwd = timeit(fwd, state.params, state.batch_stats, batch['images'],
                   sync=lambda o: float(jnp.sum(o['loc'])))

    # forward+backward only (no optimizer)
    from ursonet_tpu.train import losses as L

    def loss_fn(p, bs, bt):
        out = model.apply({'params': p, 'batch_stats': bs},
                          bt['images'], training=True)
        total, _ = L.compute_losses(out, bt, config)
        return total

    grad = jax.jit(lambda p, bs, bt: jax.grad(loss_fn)(p, bs, bt))
    t_grad = timeit(grad, state.params, state.batch_stats, batch,
                    sync=lambda g: float(jnp.sum(
                        jax.tree.leaves(g)[0].astype(jnp.float32))))

    # full train step (state is donated -> thread it through the loop)
    sbatch = parallel.shard_batch(mesh, batch)
    with mesh:
        st, m = step(state, sbatch, key)
        _ = float(m['loss'])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            st, m = step(st, sbatch, key)
        _ = float(m['loss'])
        t_step = (time.perf_counter() - t0) / args.reps
        state = st

    print(json.dumps({
        'batch': b, 'remat': args.remat,
        'fwd_ms': round(t_fwd * 1e3, 1),
        'fwd_bwd_ms': round(t_grad * 1e3, 1),
        'bwd_over_fwd': round((t_grad - t_fwd) / t_fwd, 2),
        'step_ms': round(t_step * 1e3, 1),
        'imgs_per_s': round(b / t_step, 1)}), flush=True)

    if not args.trace:
        return
    tdir = tempfile.mkdtemp(prefix='train_trace_')
    with mesh:
        with jax.profiler.trace(tdir):
            s2, m = step(state, sbatch, key)
            _ = float(m['loss'])
    paths = glob.glob(os.path.join(tdir, '**', '*.trace.json.gz'),
                      recursive=True)
    if not paths:
        print('no trace found')
        return
    with gzip.open(paths[0], 'rt') as f:
        trace = json.load(f)
    totals = {}
    for ev in trace.get('traceEvents', []):
        if ev.get('ph') != 'X':
            continue
        name, dur = ev.get('name', ''), ev.get('dur', 0)
        if not name or dur <= 0 or '.py' in name or '(' in name:
            continue
        totals[name] = totals.get(name, 0) + dur
    for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:args.top]:
        print(json.dumps({'op': name[:80], 'ms': round(us / 1e3, 2)}),
              flush=True)


if __name__ == '__main__':
    main()
