#!/usr/bin/env python3
"""Turnkey real-artifact checker (VERDICT r2 #6).

This environment has zero egress, so the reference's released weights
(net.py:886-940) and the URSO/SPEED datasets cannot be downloaded here.
This tool makes ingestion turnkey for any environment that HAS them:
drop the files in, run this, and it reports exactly what was found,
verifies md5s where the reference pins one, and tells you which
skip-unless-present tests (tests/test_artifacts.py) will now run.

Usage:
  python tools/verify_artifacts.py [--models_dir models] [--data_dir datasets]
  python tools/verify_artifacts.py --smoke   # also import + forward each
                                             # found weight file

Expected layout:
  models/
    resnet50_soyuz_hard_128_24.h5      released UrsoNet (soyuz_hard)
    resnet50_dragon_hard_128_24.h5     released UrsoNet (dragon_hard)
    resnet101_speed_528_32.h5          released UrsoNet (speed, 32^3)
    resnet101_speed_800_64.h5          released UrsoNet (speed, 64^3)
    mask_rcnn_coco.h5                  COCO Mask R-CNN transfer source
    resnet50_weights_tf_dim_ordering_tf_kernels_notop.h5   ImageNet r50
    resnet18_imagenet_1000_no_top.h5   ImageNet r18
    resnet34_imagenet_1000_no_top.h5   ImageNet r34
  datasets/
    soyuz_easy/ (etc.)  train_images.csv + train_poses_gt.csv + images
    speed/              train.json + images/train/...
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from ursonet_tpu.checkpoint.h5_import import (RELEASED_FILES,
                                              find_released_file)

URSO_DATASETS = ('soyuz_easy', 'soyuz_hard', 'dragon_easy', 'dragon_hard')


def _md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, 'rb') as f:
        for chunk in iter(lambda: f.read(1 << 20), b''):
            h.update(chunk)
    return h.hexdigest()


def check_models(models_dir: str, smoke: bool) -> list:
    rows = []
    seen = set()
    for key, (canonical, md5) in RELEASED_FILES.items():
        if canonical in seen:
            continue
        seen.add(canonical)
        path = find_released_file(models_dir, key)
        if path is None:
            rows.append((key, canonical, 'MISSING', ''))
            continue
        status, note = 'found', os.path.basename(path)
        if md5:
            got = _md5(path)
            if got != md5:
                status, note = 'BAD MD5', f'{got} != {md5}'
        if smoke and status == 'found':
            try:
                note += ' | ' + _smoke_load(key, path)
            except Exception as e:
                status, note = 'LOAD FAILED', str(e)[:80]
        rows.append((key, canonical, status, note))
    return rows


def _smoke_load(key: str, path: str) -> str:
    """Import the h5 into the matching Flax model and run one forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ursonet_tpu.config import Config
    from ursonet_tpu.engine import UrsoNet

    config = Config()
    config.IMAGE_RESIZE_MODE = 'square'
    config.IMAGE_MIN_DIM = config.IMAGE_MAX_DIM = 192
    config.IMAGES_PER_GPU = 1
    if key in ('soyuz_hard', 'dragon_hard'):
        config.BACKBONE = 'resnet50'
        config.BOTTLENECK_WIDTH = 128
        config.ORI_BINS_PER_DIM = 24
        config.REGRESS_ORI = False
    elif key.startswith('speed_'):
        config.BACKBONE = 'resnet101'
        config.BOTTLENECK_WIDTH, config.ORI_BINS_PER_DIM = (
            (528, 32) if key == 'speed_528_32' else (800, 64))
        config.REGRESS_ORI = False
        config.F16 = True
    elif key.startswith('imagenet_'):
        config.BACKBONE = key.split('_', 1)[1]
    config.update()

    engine = UrsoNet('inference', config, '/tmp/verify_artifacts_logs')
    exclude = ["mrcnn_class_logits", "mrcnn_bbox_fc", "mrcnn_bbox",
               "mrcnn_mask"] if key == 'coco' else ()
    engine.load_weights(path, exclude=exclude, verbose=False)
    img = np.full((config.IMAGE_MIN_DIM, config.IMAGE_MAX_DIM, 3), 128,
                  np.uint8)
    out = engine.detect([img])[0]
    finite = all(np.isfinite(np.asarray(v)).all() for v in out.values())
    assert finite, 'non-finite forward output'
    return f'forward ok ({", ".join(sorted(out))})'


def check_datasets(data_dir: str) -> list:
    rows = []
    for name in URSO_DATASETS:
        d = os.path.join(data_dir, name)
        needed = ['train_images.csv', 'train_poses_gt.csv',
                  'test_images.csv', 'test_poses_gt.csv']
        if not os.path.isdir(d):
            rows.append((f'urso:{name}', 'MISSING', ''))
            continue
        missing = [f for f in needed if not os.path.exists(
            os.path.join(d, f))]
        rows.append((f'urso:{name}',
                     'found' if not missing else 'INCOMPLETE',
                     f'missing {missing}' if missing else ''))
    d = os.path.join(data_dir, 'speed')
    if not os.path.isdir(d):
        rows.append(('speed', 'MISSING', ''))
    else:
        missing = [f for f in ('train.json', 'test.json')
                   if not os.path.exists(os.path.join(d, f))]
        rows.append(('speed', 'found' if not missing else 'INCOMPLETE',
                     f'missing {missing}' if missing else ''))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--models_dir', default='models')
    ap.add_argument('--data_dir', default='datasets')
    ap.add_argument('--smoke', action='store_true',
                    help='also import each found h5 and run one forward')
    args = ap.parse_args()

    print(f'\n== weights under {args.models_dir}/ ==')
    print(f'{"key":<20} {"canonical file":<55} status  note')
    any_found = False
    for key, fn, status, note in check_models(args.models_dir, args.smoke):
        any_found |= status == 'found'
        print(f'{key:<20} {fn:<55} {status:<7} {note}')

    print(f'\n== datasets under {args.data_dir}/ ==')
    for name, status, note in check_datasets(args.data_dir):
        any_found |= status == 'found'
        print(f'{name:<25} {status:<10} {note}')

    print('\nAnything marked "found" activates the matching '
          'skip-unless-present tests:\n'
          '  python -m pytest tests/test_artifacts.py -v')
    if not any_found:
        print('(nothing found — drop files into the layout in this '
              'script\'s docstring)')


if __name__ == '__main__':
    main()
