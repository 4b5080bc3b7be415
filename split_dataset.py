#!/usr/bin/env python3
"""Dataset splitters (reference component #29: split_dataset.py:1-75 and
utils.split_speed/merge_speed, utils.py:565-619).

URSO: shuffles `N_rgb.png` + `gt.csv` into {test,val,train} percentage
splits, writing `{subset}_poses_gt.csv` + `{subset}_images.csv` (image
name `<shuffled_id>_rgb.png`, matching the reference's convention).
SPEED: shuffles `train.json` into `train_no_val.json` + `val.json`;
`merge-speed` concatenates two annotation files.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import random

import numpy as np
import pandas as pd


def split_urso(dataset_dir: str, test_percentage: int = 10,
               val_percentage: int = 10, seed=None):
    rgb_list = glob.glob(os.path.join(dataset_dir, '*rgb.png'))
    nr_images = len(rgb_list)
    poses = pd.read_csv(os.path.join(dataset_dir, 'gt.csv'))
    assert nr_images == len(poses), \
        f"{nr_images} images vs {len(poses)} poses"

    rng = random.Random(seed)
    shuffle_ids = list(np.arange(nr_images))
    rng.shuffle(shuffle_ids)
    shuffle_ids = np.asarray(shuffle_ids)

    n_test = int(nr_images * test_percentage * 0.01 + 0.5)
    n_nontrain = int(nr_images * (test_percentage + val_percentage) * 0.01
                     + 0.5)
    splits = {
        'test': shuffle_ids[0:n_test],
        'val': shuffle_ids[n_test:n_nontrain],
        'train': shuffle_ids[n_nontrain:nr_images],
    }
    for subset, ids in splits.items():
        poses.loc[ids].to_csv(
            os.path.join(dataset_dir, f'{subset}_poses_gt.csv'),
            index=False)
        with open(os.path.join(dataset_dir, f'{subset}_images.csv'),
                  'w') as f:
            for i in ids:
                f.write(f"{i}_rgb.png\n")
    return {k: len(v) for k, v in splits.items()}


def split_speed(dataset_dir: str, val_percentage: float = 0.1, seed=None):
    """Split SPEED train.json into train_no_val.json + val.json
    (reference utils.py:565-596; n.b. the reference's
    `nr_instances*val_percentage` expects a fraction)."""
    with open(os.path.join(dataset_dir, 'train.json')) as f:
        dataset = json.load(f)
    rng = random.Random(seed)
    rng.shuffle(dataset)
    n_val = len(dataset) * val_percentage
    val_set = [a for i, a in enumerate(dataset) if i < n_val]
    train_set = [a for i, a in enumerate(dataset) if i >= n_val]
    with open(os.path.join(dataset_dir, 'train_no_val.json'), 'w+') as f:
        f.write(json.dumps(train_set))
    with open(os.path.join(dataset_dir, 'val.json'), 'w+') as f:
        f.write(json.dumps(val_set))
    return {'train_no_val': len(train_set), 'val': len(val_set)}


def merge_speed(path_1: str, path_2: str, out_path: str):
    """Concatenate two SPEED annotation files (reference
    utils.py:598-619)."""
    with open(path_1) as f:
        a = json.load(f)
    with open(path_2) as f:
        b = json.load(f)
    with open(out_path, 'w+') as f:
        f.write(json.dumps(a + b))
    return len(a) + len(b)


def average_images(dataset_dir: str, pattern: str = '*rgb.png'):
    """Dataset mean-pixel tool (reference average_images,
    utils.py:541-561)."""
    from PIL import Image
    paths = glob.glob(os.path.join(dataset_dir, pattern))
    acc = None
    for p in paths:
        img = np.asarray(Image.open(p).convert('RGB'), np.float64)
        acc = img if acc is None else acc + img
    mean_image = acc / len(paths)
    return mean_image.mean(axis=(0, 1))


def main(argv=None):
    p = argparse.ArgumentParser(description='Split dataset.')
    p.add_argument('--dataset_dir', required=True)
    p.add_argument('--test_percentage', type=int, default=10)
    p.add_argument('--val_percentage', type=int, default=10)
    p.add_argument('--speed', action='store_true',
                   help='split SPEED train.json instead of URSO CSVs')
    p.add_argument('--seed', type=int, default=None)
    args = p.parse_args(argv)
    if args.speed:
        counts = split_speed(args.dataset_dir,
                             args.val_percentage / 100.0, args.seed)
    else:
        counts = split_urso(args.dataset_dir, args.test_percentage,
                            args.val_percentage, args.seed)
    print(counts)


if __name__ == '__main__':
    main()
