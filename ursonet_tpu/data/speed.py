"""SPEED (ESA/Stanford Satellite Pose Estimation Dataset) adapter.

Behavior contract (reference speed.py:29-147): parse `{subset}.json`,
convert each scalar-first `q_vbs2tango` quaternion to the framework's
scalar-last convention with the north-hemisphere sign fix
(speed.py:64-68), precompute soft-assignment PMFs in classification
mode, and — for the unlabeled `test`/`real_test` subsets — expose only
the orientation histogram map needed at decode time (speed.py:117-144).

The implementation is row-oriented: annotations are parsed into a
table of per-image row dicts up front (vectorized quaternion math over
the whole table), and `add_image(**row)` consumes finished rows.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ursonet_tpu import se3
from ursonet_tpu.data.dataset import Dataset
from ursonet_tpu.data.urso import encode_as_keypoints
from ursonet_tpu.ops import encoders

SUBSETS = frozenset({'train', 'train_no_val', 'val', 'test', 'real',
                     'real_test', 'train_total'})
UNLABELED = frozenset({'test', 'real_test'})

# Euler-grid limits of the orientation histogram (deg), shared with the
# encoders module.
ORI_LIMITS = (np.array([-180.0, -90.0, -180.0]),
              np.array([180.0, 90.0, 180.0]))


class Camera:
    """SPEED camera intrinsics, derived from the published focal length
    and pixel pitch (reference speed.py:15-25)."""
    fwx = fwy = 0.0176      # focal length [m]
    ppx = ppy = 5.86e-6     # pixel pitch [m/px]
    width, height = 1920, 1200
    fx, fy = fwx / ppx, fwy / ppy
    K = np.array([[fx, 0.0, width / 2.0],
                  [0.0, fy, height / 2.0],
                  [0.0, 0.0, 1.0]])


def _quat_scalar_last(q_wxyz) -> np.ndarray:
    """`q_vbs2tango` is scalar-first; the framework stores scalar-last
    on the north hemisphere (q_w >= 0). Reference speed.py:64-68 —
    submissions must undo this reorder (submission.py handles that)."""
    w, x, y, z = q_wxyz
    return np.sign(w) * np.array([x, y, z, w], np.float32)


def _image_subdir(subset: str) -> str:
    # The val split (and its complement) index into the train images.
    return 'train' if subset in ('train_no_val', 'val') else subset


class Speed(Dataset):

    def load_dataset(self, dataset_dir, config, subset):
        assert subset in SUBSETS
        self.name = 'Speed'
        self.camera = Camera()

        if not os.path.exists(dataset_dir):
            print(f"Image directory '{dataset_dir}' not found.")
            return None
        with open(os.path.join(dataset_dir, subset + '.json')) as f:
            annotations = json.load(f)
        print(f'SPEED {subset}: indexing {len(annotations)} images')

        if subset in UNLABELED:
            self._index_unlabeled(dataset_dir, config, subset, annotations)
        else:
            self._index_labeled(dataset_dir, config, subset, annotations)
        self.num_images = len(self.image_info)
        self._image_ids = np.arange(self.num_images)

    def _index_labeled(self, dataset_dir, config, subset, annotations):
        files = [a['filename'] for a in annotations]
        t_array = np.array([a['r_Vo2To_vbs_true'] for a in annotations],
                           np.float32)
        q_array = np.stack([_quat_scalar_last(a['q_vbs2tango'])
                            for a in annotations])

        classify_ori = not config.REGRESS_ORI
        pmf = None
        if classify_ori:
            print('SPEED: precomputing orientation soft-assignment PMFs')
            pmf, self.ori_histogram_map, self.ori_output_mask = \
                encoders.encode_ori(q_array, config.ORI_BINS_PER_DIM,
                                    config.BETA, *ORI_LIMITS)
        K1, K2 = encode_as_keypoints(q_array, t_array)

        img_dir = os.path.join(dataset_dir, 'images', _image_subdir(subset))
        rows = ({
            'image_id': i,
            'path': os.path.join(img_dir, files[i]),
            'location': t_array[i],
            'quaternion': q,
            'pyr': np.asarray(se3.quat2euler(q)),
            'angleaxis': _angleaxis(q),
            'keypoints': [K1[i], K2[i]],
            'location_map': [],
            'ori_map': pmf[i] if classify_ori else [],
        } for i, q in enumerate(q_array))
        for row in rows:
            self.add_image('SPEED', **row)

    def _index_unlabeled(self, dataset_dir, config, subset, annotations):
        # No ground truth: decode still needs the bin->quaternion map.
        # The reference skips redundancy pruning here and stores an
        # all-False mask (speed.py:133) — kept for behavior parity.
        grid = encoders.build_ori_grid(config.ORI_BINS_PER_DIM)
        self.ori_histogram_map = grid.quat
        self.ori_output_mask = np.full(config.ORI_BINS_PER_DIM ** 3, False)
        img_dir = os.path.join(dataset_dir, 'images', subset)
        for i, ann in enumerate(annotations):
            self.add_image('SPEED', image_id=i,
                           path=os.path.join(img_dir, ann['filename']))


def _angleaxis(q) -> np.ndarray:
    axis, theta = se3.quat2angleaxis(q)
    return np.asarray(axis) * theta
