#!/usr/bin/env python3
"""Build the committed int8 accuracy-gate artifact for bench.py.

Trains a small resnet18 pose net on the deterministic synthetic URSO
set, quantizes it (PTQ, calibrated on training images), and writes:
  tests/data/gate_int8.msgpack   int8 serving artifact (quant_store)
  tests/data/gate_golden.npz     deterministic input + float-twin and
                                 int8 outputs at export time
bench.py gates every run on the artifact: int8 output must track the
float twin (rel < quant.TRAINED_GATE_REL = 0.08; the 3-dim loc output
rel-amplifies PTQ noise on this tiny net — the flagship trained models
sit at ~0.5%) and stay within rel quant.TRAINED_GATE_DRIFT = 0.005 of
the export-time int8 golden (enforced only on the export backend,
which is recorded in the npz).
A deliberately corrupted weight scale fails the gate
(tests/test_quant.py::test_gate_artifact_*).

Usage: python tools/make_gate_artifact.py [--steps 400]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def gate_config():
    from ursonet_tpu.config import Config
    config = Config()
    config.NAME = 'gate'
    config.BACKBONE = 'resnet18'
    config.BOTTLENECK_WIDTH = 32
    config.BRANCH_SIZE = 128
    config.NR_DENSE_LAYERS = 1
    config.REGRESS_LOC = True
    config.REGRESS_ORI = True
    config.ORIENTATION_PARAM = 'quaternion'
    config.IMAGE_RESIZE_MODE = 'square'
    config.IMAGE_MIN_DIM = 128
    config.IMAGE_MAX_DIM = 128
    config.IMAGES_PER_GPU = 8
    config.MESH_DATA = 1
    config.MESH_MODEL = 1
    return config


def build_once(config, steps, seed):
    from ursonet_tpu import parallel
    from ursonet_tpu.data import loader as L
    from ursonet_tpu.data.synthetic import make_urso_dataset
    from ursonet_tpu.data.urso import Urso
    from ursonet_tpu.models.ursonet import build_model
    from ursonet_tpu.models.quant import QuantizedModel
    from ursonet_tpu.train.optim import make_optimizer
    from ursonet_tpu.train.state import create_train_state, trainable_mask
    from ursonet_tpu.train.step import make_train_step

    make_urso_dataset('/tmp/gate_ds', subsets=("train",), n_per_subset=128)
    ds = Urso()
    ds.load_dataset('/tmp/gate_ds', config, 'train')
    mesh = parallel.make_mesh(config)
    model = build_model(config)
    tx = make_optimizer(config)
    gen = L.data_generator(ds, config, batch_size=config.BATCH_SIZE,
                           seed=seed, raw=True)
    pre = L.make_device_preprocess(config, ds)
    b0 = next(gen)
    state = create_train_state(model, config, tx, mesh,
                               jax.random.PRNGKey(seed),
                               b0['images_u8'].astype('float32'))
    step = make_train_step(model, config, tx,
                           trainable=trainable_mask(state.params, 'all'),
                           preprocess=pre)
    with mesh:
        for i in range(steps):
            state, m = step(state, parallel.shard_batch(mesh, next(gen)),
                            jax.random.PRNGKey(seed * 100003 + i))
            if i % 100 == 0 or i == steps - 1:
                print('seed', seed, 'step', i, 'loss', float(m['loss']),
                      flush=True)

    params = jax.device_get(state.params)
    batch_stats = jax.device_get(state.batch_stats)
    qm = QuantizedModel.from_variables(config, params, batch_stats)

    # calibration + golden input: deterministic synthetic images (the
    # golden input must be in-distribution -- random-noise pixels send
    # the loc head far off its calibrated activation ranges)
    calib = pre(jax.random.PRNGKey(123), next(gen))['images']
    qm.calibrate(calib)
    golden_in = np.asarray(calib[:4], np.float32)
    out_f = {k: np.asarray(v, np.float32)
             for k, v in qm.float_twin(jnp.asarray(golden_in)).items()}
    out_q = {k: np.asarray(v, np.float32)
             for k, v in qm(jnp.asarray(golden_in)).items()}
    worst = 0.0
    for k in out_f:
        rel = (np.linalg.norm(out_q[k] - out_f[k])
               / max(np.linalg.norm(out_f[k]), 1e-9))
        print('seed', seed, 'rel', k, round(float(rel), 5), flush=True)
        worst = max(worst, float(rel))
    return worst, qm, golden_in, out_f, out_q


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=800)
    ap.add_argument('--attempts', type=int, default=3)
    ap.add_argument('--out', default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'tests', 'data'))
    args = ap.parse_args()

    from ursonet_tpu.checkpoint.quant_store import save_quantized

    config = gate_config()
    config.update()
    # PTQ quality of the tiny net varies a little across seeds; train a
    # few and commit the best. The committed gate's precision comes from
    # the export-time GOLDEN outputs (drift < 0.005 at serve time), not
    # from the float-twin rel, which on a 2-block-wide net sits at a few
    # % (the 3-dim loc / unit-quaternion outputs rel-amplify PTQ noise;
    # flagship trained models measure ~0.5%, PERF.md)
    best = None
    for seed in range(args.attempts):
        worst, qm, golden_in, out_f, out_q = build_once(
            config, args.steps, seed)
        if best is None or worst < best[0]:
            best = (worst, qm, golden_in, out_f, out_q)
        from ursonet_tpu.models.quant import TRAINED_GATE_REL
        # build-time margin below the serving gate, so tunnel/backend
        # noise at serve time cannot push a good artifact over the line
        if worst < TRAINED_GATE_REL - 0.025:
            break
    worst, qm, golden_in, out_f, out_q = best
    assert worst < TRAINED_GATE_REL - 0.01, \
        f'trained artifact quantizes poorly: {worst}'

    os.makedirs(args.out, exist_ok=True)
    save_quantized(os.path.join(args.out, 'gate_int8.msgpack'), qm)
    np.savez_compressed(
        os.path.join(args.out, 'gate_golden.npz'),
        golden_in=golden_in,
        backend=np.asarray(jax.default_backend()),
        **{f'f_{k}': v for k, v in out_f.items()},
        **{f'q_{k}': v for k, v in out_q.items()})
    print('wrote', args.out, 'worst_rel', round(worst, 5), flush=True)


if __name__ == '__main__':
    main()
