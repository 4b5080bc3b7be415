"""URSO dataset adapter (reference urso.py).

Loads `{subset}_images.csv` + `{subset}_poses_gt.csv`, enforces the
quaternion north hemisphere (q4 >= 0, urso.py:57-61), precomputes all pose
parameterizations and — in classification mode — the orientation/location
soft-assignment maps (urso.py:66-96). The per-sample encodings are computed
vectorized in one shot instead of the reference's O(N·bins³) Python loop.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ursonet_tpu import se3
from ursonet_tpu.data.dataset import Dataset
from ursonet_tpu.ops import encoders


class Camera:
    """URSO render camera (urso.py:13-22): 90°×73.7° FOV, 1280×960,
    negative fy (the renderer's y-down convention)."""
    fov_x = 90.0 * np.pi / 180
    fov_y = 73.7 * np.pi / 180
    width = 1280
    height = 960
    fx = width / (2 * np.tan(fov_x / 2))
    fy = -height / (2 * np.tan(fov_y / 2))
    K = np.array([[fx, 0, width / 2], [0, fy, height / 2], [0, 0, 1]])


# Dataset pixel mean (unused by default, kept for parity — urso.py:25)
MEAN_PIXEL = np.array([45, 49, 52])


class Urso(Dataset):

    def load_dataset(self, dataset_dir, config, subset):
        """Load a subset ('train', 'val', 'test') — reference urso.py:29-141."""
        self.name = 'Urso'

        if not os.path.exists(dataset_dir):
            print(f"Image directory '{dataset_dir}' not found.")
            return None

        set_filename = os.path.join(dataset_dir, subset + '_images.csv')
        rgb_list_df = pd.read_csv(set_filename, names=['filename'], header=None)
        rgb_list = list(rgb_list_df['filename'])

        self.camera = Camera()

        poses = pd.read_csv(os.path.join(dataset_dir, subset + '_poses_gt.csv'))
        nr_instances = len(rgb_list)

        # North-hemisphere enforcement, vectorized (urso.py:57-61)
        q_raw = poses[['q1', 'q2', 'q3', 'q4']].to_numpy(np.float32)[:nr_instances]
        sign = np.where(q_raw[:, 3:4] < 0, -1.0, 1.0).astype(np.float32)
        q_array = q_raw * sign
        t_array = poses[['x', 'y', 'z']].to_numpy(np.float32)[:nr_instances]

        ori_encoded = None
        if not config.REGRESS_ORI:
            print('URSO: precomputing orientation soft-assignment PMFs')
            ori_encoded, ori_histogram_map, ori_output_mask = encoders.encode_ori(
                q_array, config.ORI_BINS_PER_DIM, config.BETA,
                np.array([-180, -90, -180]), np.array([180, 90, 180]))
            self.ori_histogram_map = ori_histogram_map
            self.ori_output_mask = ori_output_mask

        loc_encoded = None
        if not config.REGRESS_LOC:
            print('URSO: precomputing location soft-assignment PMFs')
            # Location as (image_x, image_y, depth): Unreal -> camera frame
            # (urso.py:79-81): img_x = y/x, img_y = z/x, Z = x.
            img_x = t_array[:, 1] / t_array[:, 0]
            img_y = t_array[:, 2] / t_array[:, 0]
            z = t_array[:, 0]
            # Grid limits from camera FOV tangents and dataset depth range
            # (urso.py:84-89). n.b. the reference halves the FOV twice
            # (fov already radians, ×π/360) — kept for parity.
            theta_x = self.camera.fov_x * np.pi / 360
            theta_y = self.camera.fov_y * np.pi / 360
            x_max = np.tan(theta_x)
            y_max = np.tan(theta_y)
            loc_encoded, loc_histogram_map = encoders.encode_loc(
                np.stack((img_x, img_y, z), axis=1),
                config.LOC_BINS_PER_DIM, config.BETA,
                np.array([-x_max, -y_max, z.min()]),
                np.array([x_max, y_max, z.max()]))
            self.histogram_3D_map = loc_histogram_map

        if not rgb_list:
            print('No files found')
            return None

        # Virtual 3D keypoints with URSO scale 3.0 (urso.py:102)
        K1, K2 = encode_as_keypoints(q_array, t_array, 3.0)

        for i, file_name in enumerate(rgb_list):
            q = q_array[i, :]
            v, theta = se3.quat2angleaxis(q)
            pyr = np.asarray(se3.quat2euler(q))
            self.add_image(
                "URSO",
                image_id=i,
                path=os.path.join(dataset_dir, file_name),
                keypoints=[K1[i, :], K2[i, :]],
                location=t_array[i, :],
                location_map=[] if config.REGRESS_LOC else loc_encoded[i, :],
                quaternion=q,
                angleaxis=np.asarray(v) * theta,
                pyr=pyr,
                ori_map=[] if config.REGRESS_ORI else ori_encoded[i, :],
            )

        self.num_images = len(self.image_info)
        self._image_ids = np.arange(self.num_images)


def encode_as_keypoints(oris, centroids, scale=1.0):
    """Encode pose as 2 virtual 3D keypoints K1 = R·s·[0,0,1]+c,
    K2 = R·s·[0,1,0]+c (reference utils.py:220-244), vectorized."""
    oris = np.atleast_2d(np.asarray(oris, np.float64))
    centroids = np.atleast_2d(np.asarray(centroids, np.float64))
    n = oris.shape[0]
    K1 = np.zeros((n, 3), np.float32)
    K2 = np.zeros((n, 3), np.float32)
    for i in range(n):
        R = se3.quat2SO3(oris[i])
        c = centroids[i]
        K1[i] = (R @ (scale * np.array([0.0, 0.0, 1.0]))) + c
        K2[i] = (R @ (scale * np.array([0.0, 1.0, 0.0]))) + c
    return K1, K2
