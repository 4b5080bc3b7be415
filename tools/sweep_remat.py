#!/usr/bin/env python3
"""Remat-policy sweep for the flagship train step (VERDICT r2 #5).

Round 2 resolved the 391 imgs/s training throughput to XLA-forced
rematerialization under HBM pressure (15.04 GB of backward temporaries,
29 recomputed forward convs). XLA's auto-remat choice is not guaranteed
optimal; this sweeps explicit jax.checkpoint POLICIES against it:

  none     XLA decides (the 391 imgs/s baseline)
  all      full block remat (round-2 measurement: 354 imgs/s — adds
           recompute XLA wasn't doing)
  narrow   save only the narrow f1/f2-wide bottleneck activations
           (checkpoint_name tags in models/resnet.py): the 3x3 conv
           never recomputes, only the cheap 1x1 expansion does, and the
           f3-wide block intermediates never hit HBM
  dots     checkpoint_dots (documents that conv nets degenerate to 'all')

Gradient equivalence across policies is unit-tested
(tests/test_model.py::test_remat_matches_no_remat_grads).

Usage: python tools/sweep_remat.py [--batches 128,64] [--reps 16]
       [--policies none,all,narrow,dots]
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

POLICY_VALUES = {'none': False, 'all': True, 'narrow': 'narrow',
                 'dots': 'dots'}


def run_one(policy, batch, reps, act_q8=False):
    from ursonet_tpu import parallel
    from ursonet_tpu.config import Config
    from ursonet_tpu.models.ursonet import build_model
    from ursonet_tpu.train.optim import make_optimizer
    from ursonet_tpu.train.state import create_train_state
    from ursonet_tpu.train.step import make_train_step

    config = Config()
    config.BACKBONE = 'resnet50'
    config.BOTTLENECK_WIDTH = 128
    config.BRANCH_SIZE = 1024
    config.REGRESS_LOC = True
    config.REGRESS_ORI = True
    config.ORIENTATION_PARAM = 'quaternion'
    config.IMAGE_RESIZE_MODE = 'pad64'
    config.IMAGE_MIN_DIM = 512
    config.IMAGE_MAX_DIM = 640
    config.IMAGES_PER_GPU = batch
    config.F16 = True
    config.REMAT = POLICY_VALUES[policy]
    config.TRAIN_ACT_Q8 = act_q8
    config.MESH_DATA = config.MESH_MODEL = 1
    config.update()

    model = build_model(config)
    mesh = parallel.make_mesh(config)
    tx = make_optimizer(config)
    key = jax.random.PRNGKey(0)
    gen = jax.jit(lambda k: {
        'images': jax.random.normal(k, (batch, 512, 640, 3),
                                    jnp.float32) * 60.0,
        'gt_loc': jax.random.normal(k, (batch, 3), jnp.float32) * 5.0,
        'gt_ori': jax.random.normal(k, (batch, 4), jnp.float32),
    })
    data = gen(key)
    state = create_train_state(model, config, tx, mesh, key,
                               data['images'][:1])
    step = make_train_step(model, config, tx)
    sbatch = parallel.shard_batch(mesh, data)
    with mesh:
        st, m = step(state, sbatch, key)       # compile + warm
        _ = float(m['loss'])
        t0 = time.perf_counter()
        for _ in range(reps):
            st, m = step(st, sbatch, key)
        _ = float(m['loss'])                   # single scalar sync
        dt = (time.perf_counter() - t0) / reps
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batches', default='128,64')
    ap.add_argument('--reps', type=int, default=16)
    ap.add_argument('--policies', default='none,all,narrow,dots')
    ap.add_argument('--actq', default='0',
                    help='comma list of 0/1/wgrad8: sweep TRAIN_ACT_Q8 '
                         '(int8 saved-activation convs, models/actq.py) '
                         'as a second axis')
    args = ap.parse_args()

    from ursonet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    rows = []
    for batch in (int(x) for x in args.batches.split(',')):
        for policy in args.policies.split(','):
            for tok in args.actq.split(','):
                aq = tok if tok == 'wgrad8' else bool(int(tok))
                tag = f'policy={policy:<7} actq={tok} batch={batch}'
                try:
                    dt = run_one(policy, batch, args.reps, aq)
                    rows.append((policy, aq, batch, dt * 1e3, batch / dt))
                    print(f'{tag}: {dt*1e3:.1f} ms/step, '
                          f'{batch/dt:.1f} imgs/s', flush=True)
                except Exception as e:
                    rows.append((policy, aq, batch, float('nan'), 0.0))
                    print(f'{tag}: FAILED {str(e)[:120]}', flush=True)

    print('\n### Remat-policy sweep (flagship train step, 512x640, '
          'quaternion regression, bf16)\n')
    print('| policy | actq | batch | ms/step | imgs/s |')
    print('|---|---|---|---|---|')
    for p, aq, b, ms, ips in rows:
        print(f'| {p} | {aq} | {b} | {ms:.1f} | {ips:.1f} |')


if __name__ == '__main__':
    main()
