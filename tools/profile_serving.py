#!/usr/bin/env python3
"""Per-fusion device-time breakdown of the int8 serving forward.

Builds the flagship config on random weights, calibrates the PTQ
model, runs the jitted int8 forward under jax.profiler, and prints the
top device ops by total time — the ground truth for where the serving
milliseconds go (PERF.md roofline audit).

Usage: python tools/profile_serving.py [--batch 128] [--top 25]
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
    args = ap.parse_args()

    from ursonet_tpu.config import Config
    from ursonet_tpu.models.ursonet import build_model
    from ursonet_tpu.models.quant import QuantizedModel
    import flax.linen as nn

    config = Config()
    config.BACKBONE = 'resnet50'
    config.BOTTLENECK_WIDTH = 128
    config.BRANCH_SIZE = 1024
    config.NR_DENSE_LAYERS = 1
    config.ORIENTATION_PARAM = 'euler_encoded'
    config.ORI_BINS_PER_DIM = 24
    config.IMAGE_RESIZE_MODE = 'pad64'
    config.IMAGE_MIN_DIM = 512
    config.IMAGE_MAX_DIM = 640
    config.IMAGES_PER_GPU = args.batch
    config.update()

    h, w = 512, 640
    model = build_model(config)
    imgs = jax.jit(
        lambda k: jax.random.randint(k, (args.batch, h, w, 3), 0, 256,
                                     jnp.int32).astype(jnp.uint8)
    )(jax.random.PRNGKey(0))
    init = (imgs[:1].astype(jnp.float32)
            - jnp.asarray(config.MEAN_PIXEL, jnp.float32))
    variables = nn.unbox(
        jax.jit(lambda r: model.init(r, init, training=False))(
            jax.random.PRNGKey(0)))
    qm = QuantizedModel.from_variables(
        config, variables['params'], variables['batch_stats'])
    qm.calibrate(imgs[:8])

    out = qm(imgs)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])  # warm + sync

    tdir = tempfile.mkdtemp(prefix='serving_trace_')
    with jax.profiler.trace(tdir):
        for _ in range(4):
            out = qm(imgs)
        _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])

    # also time it plainly (deep queue)
    t0 = time.perf_counter()
    for _ in range(24):
        out = qm(imgs)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / 24
    print(json.dumps({'total_ms': round(dt * 1e3, 2),
                      'imgs_per_s': round(args.batch / dt, 1)}),
          flush=True)

    paths = glob.glob(os.path.join(
        tdir, '**', '*.trace.json.gz'), recursive=True)
    if not paths:
        print('no trace file found under', tdir)
        return
    with gzip.open(paths[0], 'rt') as f:
        trace = json.load(f)
    # Device-side complete events: sum duration by op name.
    totals = {}
    for ev in trace.get('traceEvents', []):
        if ev.get('ph') != 'X':
            continue
        # TensorCore op lanes carry args with long_name/name
        name = ev.get('name', '')
        dur = ev.get('dur', 0)  # microseconds
        if not name or dur <= 0:
            continue
        cat = ev.get('args', {})
        key = name
        totals[key] = totals.get(key, 0) + dur
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:args.top]
    for name, us in top:
        print(json.dumps({'op': name[:90],
                          'ms_over_4_steps': round(us / 1e3, 2)}),
              flush=True)


if __name__ == '__main__':
    main()
