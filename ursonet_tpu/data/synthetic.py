"""Synthetic micro-dataset generator.

Renders a wireframe-cube "spacecraft" at random poses into URSO- or
SPEED-layout directories so that integration tests, benchmarks and CI can
exercise the full pipeline (adapters → encoders → training → eval) with no
dataset downloads — the fake-backend capability the reference lacks
(SURVEY.md §4).

URSO layout:  {dir}/{subset}_images.csv, {subset}_poses_gt.csv,
              {i}_rgb.png  (split_dataset.py format)
SPEED layout: {dir}/{subset}.json, images/{subdir}/imgNNN.jpg
              (speed.py:47-102 format)

Pose→image is deterministic, so the data is learnable: a short training
run must reduce the loss (used as a training smoke test).
"""

from __future__ import annotations

import json
import os

import numpy as np

from ursonet_tpu import se3

_CUBE = np.array([
    [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
    [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
], dtype=np.float64)
_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
          (0, 4), (1, 5), (2, 6), (3, 7)]


def _render_pose(q, loc_cam, width, height, K):
    """Render the cube at camera-frame location `loc_cam` (x right, y down,
    z forward) with orientation q. Returns [H, W, 3] uint8."""
    img = np.zeros((height, width, 3), np.uint8)
    # mild background gradient for non-trivial statistics
    img[..., 0] = np.linspace(10, 40, width, dtype=np.uint8)[None, :]
    img[..., 2] = np.linspace(30, 5, height, dtype=np.uint8)[:, None]

    R = se3.quat2SO3(q)
    # Asymmetric body: cube + antenna along +z and a nose point along +y,
    # with a distinct color per edge — breaks the cube's rotational
    # symmetry so orientation is identifiable from a single view.
    body = np.concatenate([_CUBE * 1.5,
                           [[0, 0, 3.0], [0, 2.4, 0]]], axis=0)
    pts = body @ np.asarray(R).T + loc_cam
    pts = pts[:, :2] / pts[:, 2:3]
    uv = (K[:2, :2] @ pts.T).T + K[:2, 2]
    uv = uv.astype(int)
    rngc = np.random.RandomState(7)
    colors = [tuple(int(v) for v in rngc.randint(90, 255, 3))
              for _ in range(len(_EDGES) + 2)]
    try:
        import cv2
        for k, (a, b) in enumerate(_EDGES):
            cv2.line(img, tuple(uv[a]), tuple(uv[b]), colors[k], 2)
        cv2.line(img, tuple(uv[6]), tuple(uv[8]), (255, 255, 255), 3)
        cv2.line(img, tuple(uv[2]), tuple(uv[9]), (255, 60, 60), 3)
        cv2.circle(img, tuple(uv[8]), 5, (80, 255, 80), -1)
    except Exception:  # pragma: no cover - cv2 always present in this env
        for a, b in _EDGES:
            ya, xa = np.clip(uv[a][1], 0, height - 1), np.clip(uv[a][0], 0, width - 1)
            img[ya, xa] = 255
    return img


def _random_poses(rng, n, depth_range=(12.0, 30.0)):
    qs = rng.randn(n, 4)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    qs *= np.where(qs[:, 3:4] < 0, -1.0, 1.0)
    # camera-frame positions: near the optical axis, in front of the camera
    x = rng.uniform(-3, 3, n)
    y = rng.uniform(-2, 2, n)
    z = rng.uniform(*depth_range, n)
    return qs, np.stack([x, y, z], axis=1)


def make_urso_dataset(dataset_dir, subsets=('train', 'val', 'test'),
                      n_per_subset=12, width=320, height=240, seed=0):
    """Create a synthetic URSO-layout dataset.

    Pose labels use the URSO/Unreal frame convention consumed by the
    adapter (urso.py:79-81): label (x, y, z) = (depth, right, down), i.e.
    camera-frame (cx, cy, cz) is stored as (z, x, y).
    """
    os.makedirs(dataset_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    fx = width / 2.0   # 90° horizontal FOV at the render size
    fy = height / (2 * np.tan(np.deg2rad(73.7) / 2))
    K = np.array([[fx, 0, width / 2], [0, fy, height / 2], [0, 0, 1.0]])

    idx = 0
    for subset in subsets:
        n = n_per_subset if isinstance(n_per_subset, int) else n_per_subset[subset]
        qs, locs_cam = _random_poses(rng, n)
        names = []
        rows = []
        from PIL import Image
        for i in range(n):
            img = _render_pose(qs[i], locs_cam[i], width, height, K)
            name = f"{idx}_rgb.png"
            Image.fromarray(img).save(os.path.join(dataset_dir, name))
            names.append(name)
            cx, cy, cz = locs_cam[i]
            rows.append([cz, cx, cy, *qs[i]])   # Unreal frame: x=depth
            idx += 1
        with open(os.path.join(dataset_dir, f"{subset}_images.csv"), 'w') as f:
            f.write("\n".join(names) + "\n")
        import pandas as pd
        pd.DataFrame(rows, columns=['x', 'y', 'z', 'q1', 'q2', 'q3', 'q4']) \
            .to_csv(os.path.join(dataset_dir, f"{subset}_poses_gt.csv"),
                    index=False)
    return dataset_dir


def make_speed_dataset(dataset_dir, subsets=('train_no_val', 'val', 'test',
                                             'real_test'),
                       n_per_subset=8, width=320, height=200, seed=0):
    """Create a synthetic SPEED-layout dataset (grayscale jpgs + json
    annotations with scalar-first quaternions, speed.py:47-68)."""
    os.makedirs(dataset_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    fx = fy = width * 1.5
    K = np.array([[fx, 0, width / 2], [0, fy, height / 2], [0, 0, 1.0]])

    from PIL import Image
    idx = 0
    for subset in subsets:
        subdir = 'train' if subset in ('train_no_val', 'val') else subset
        img_dir = os.path.join(dataset_dir, 'images', subdir)
        os.makedirs(img_dir, exist_ok=True)
        n = n_per_subset if isinstance(n_per_subset, int) else n_per_subset[subset]
        qs, locs = _random_poses(rng, n, depth_range=(8.0, 20.0))
        anns = []
        for i in range(n):
            img = _render_pose(qs[i], locs[i], width, height, K)
            gray = (0.2126 * img[..., 0] + 0.7152 * img[..., 1] +
                    0.0722 * img[..., 2]).astype(np.uint8)
            name = f"img{idx:06d}.jpg"
            Image.fromarray(gray, mode='L').save(os.path.join(img_dir, name))
            ann = {"filename": name}
            if subset not in ('test', 'real_test'):
                x, y, z, w = qs[i]
                ann["q_vbs2tango"] = [float(w), float(x), float(y), float(z)]
                ann["r_Vo2To_vbs_true"] = [float(v) for v in locs[i]]
            anns.append(ann)
            idx += 1
        with open(os.path.join(dataset_dir, subset + '.json'), 'w') as f:
            json.dump(anns, f)
    return dataset_dir
