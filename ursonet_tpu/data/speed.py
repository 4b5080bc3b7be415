"""SPEED (ESA/Stanford Satellite Pose Estimation Dataset) adapter
(reference speed.py).

Loads `{subset}.json` annotations; converts scalar-first `q_vbs2tango`
quaternions to scalar-last with hemisphere sign fix (speed.py:64-68);
for unlabeled test subsets builds only the orientation histogram map
(needed for decode) without per-sample encodings (speed.py:117-144).
"""

from __future__ import annotations

import json
import os

import numpy as np

from ursonet_tpu import se3
from ursonet_tpu.data.dataset import Dataset
from ursonet_tpu.data.urso import encode_as_keypoints
from ursonet_tpu.ops import encoders

SUBSETS = ['train', 'train_no_val', 'val', 'test', 'real', 'real_test',
           'train_total']


class Camera:
    """SPEED camera from focal length / pixel pitch (speed.py:15-25)."""
    fwx = 0.0176
    fwy = 0.0176
    width = 1920
    height = 1200
    ppx = 5.86e-6
    ppy = ppx
    fx = fwx / ppx
    fy = fwy / ppy
    K = np.array([[fx, 0, width / 2], [0, fy, height / 2], [0, 0, 1]])


class Speed(Dataset):

    def load_dataset(self, dataset_dir, config, subset):
        """Load a subset — reference speed.py:29-147."""
        assert subset in SUBSETS

        self.name = 'Speed'
        self.camera = Camera()

        if not os.path.exists(dataset_dir):
            print(f"Image directory '{dataset_dir}' not found.")
            return None

        with open(os.path.join(dataset_dir, subset + '.json'), 'r') as f:
            dataset = json.load(f)

        nr_instances = len(dataset)
        print(f'SPEED {subset}: indexing {nr_instances} images')

        if subset not in ['test', 'real_test']:
            q_array = np.zeros((nr_instances, 4), np.float32)
            t_array = np.zeros((nr_instances, 3), np.float32)
            images_list = []
            for i, ann in enumerate(dataset):
                images_list.append(ann['filename'])
                t_array[i] = ann['r_Vo2To_vbs_true']
                # scalar-first -> scalar-last + hemisphere (speed.py:64-68)
                q = ann['q_vbs2tango']
                sign = np.sign(q[0])
                q_array[i] = sign * np.array([q[1], q[2], q[3], q[0]])

            ori_encoded = None
            if not config.REGRESS_ORI:
                print('SPEED: precomputing orientation soft-assignment PMFs')
                ori_encoded, ori_histogram_map, ori_output_mask = \
                    encoders.encode_ori(
                        q_array, config.ORI_BINS_PER_DIM, config.BETA,
                        np.array([-180, -90, -180]), np.array([180, 90, 180]))
                self.ori_histogram_map = ori_histogram_map
                self.ori_output_mask = ori_output_mask

            K1, K2 = encode_as_keypoints(q_array, t_array)

            for i, file_name in enumerate(images_list):
                q = q_array[i]
                v, theta = se3.quat2angleaxis(q)
                pyr = np.asarray(se3.quat2euler(q))
                subdir = 'train' if subset in ('train_no_val', 'val') else subset
                self.add_image(
                    "SPEED",
                    image_id=i,
                    path=os.path.join(dataset_dir, 'images', subdir, file_name),
                    location=t_array[i],
                    keypoints=[K1[i], K2[i]],
                    location_map=[],
                    quaternion=q,
                    angleaxis=np.asarray(v) * theta,
                    pyr=pyr,
                    ori_map=[] if config.REGRESS_ORI else ori_encoded[i],
                )
        else:
            # Unlabeled test subsets: histogram map only (speed.py:117-144),
            # without the redundancy pruning (the reference stores a bogus
            # all-False mask, speed.py:133).
            grid = encoders.build_ori_grid(config.ORI_BINS_PER_DIM)
            self.ori_histogram_map = grid.quat
            self.ori_output_mask = np.full(config.ORI_BINS_PER_DIM ** 3, False)
            for i, ann in enumerate(dataset):
                self.add_image(
                    "SPEED",
                    image_id=i,
                    path=os.path.join(dataset_dir, 'images', subset,
                                      ann['filename']))

        self.num_images = len(self.image_info)
        self._image_ids = np.arange(self.num_images)
