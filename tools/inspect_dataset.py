#!/usr/bin/env python3
"""Dataset / augmentation visual inspection — headless equivalent of the
reference Dataset_inspection.ipynb: saves figures instead of notebook
cells.

  python tools/inspect_dataset.py --dataset_dir datasets/soyuz_easy \
      --type urso --subset train --out_dir /tmp/inspect [--n 6]

Produces, per sampled image:
  * `sample_{i}.png`      — image with GT pose axes overlay
  * `augmented_{i}.png`   — after camera-rotation augmentation (warp +
                            consistent pose update), axes re-overlaid
  * `sim2real_{i}.png`    — after the sim2real pipeline
and `ori_pmf_{i}.png` PMF slice stacks when the dataset was loaded in
orientation-classification mode.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--dataset_dir', required=True)
    p.add_argument('--type', default='urso', choices=['urso', 'speed'])
    p.add_argument('--subset', default='train')
    p.add_argument('--out_dir', default='inspect_out')
    p.add_argument('--n', type=int, default=6)
    p.add_argument('--classify_ori', action='store_true',
                   help='load orientation PMF encodings too')
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args(argv)

    from ursonet_tpu.config import Config
    from ursonet_tpu.ops import augment as aug
    from ursonet_tpu.ops import viz

    config = Config()
    config.REGRESS_ORI = not args.classify_ori
    config.ROT_AUG = True
    config.update()

    if args.type == 'urso':
        from ursonet_tpu.data.urso import Urso
        ds = Urso()
        frame = 'unreal'
    else:
        from ursonet_tpu.data.speed import Speed
        ds = Speed()
        frame = 'camera'
    ds.load_dataset(args.dataset_dir, config, args.subset)

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    ids = rng.choice(ds.image_ids, min(args.n, len(ds.image_ids)),
                     replace=False)
    for i in ids:
        image = ds.load_image(i)
        loc = np.asarray(ds.load_location(i), np.float64)
        q = np.asarray(ds.load_quaternion(i), np.float64)
        viz.save_axes_overlay(
            image, ds.camera.K, loc, q,
            path=os.path.join(args.out_dir, f'sample_{i}.png'),
            frame=frame)

        # camera-rotation augmentation with consistent pose update
        warped, loc2, q2 = aug.rotate_cam(image, loc, q, ds.camera.K, 20,
                                          rng)
        viz.save_axes_overlay(
            warped, ds.camera.K, np.ravel(loc2), np.ravel(q2),
            path=os.path.join(args.out_dir, f'augmented_{i}.png'),
            frame=frame)

        sim = aug.sim2real_host(image, rng)
        from PIL import Image
        Image.fromarray(sim.astype(np.uint8)).save(
            os.path.join(args.out_dir, f'sim2real_{i}.png'))

        if args.classify_ori and ds.ori_histogram_map is not None:
            pmf = ds.load_orientation_encoded(i)
            viz.visualize_weights(
                pmf, config.ORI_BINS_PER_DIM,
                path=os.path.join(args.out_dir, f'ori_pmf_{i}.png'))
    print(f"wrote {len(ids)} sample sets to {args.out_dir}")


if __name__ == '__main__':
    main()
