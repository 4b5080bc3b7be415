"""Dataset base class: an in-memory image index where every entry carries
its pose in all parameterizations plus precomputed soft-assignment maps
(reference dataset.py:5-57)."""

from __future__ import annotations

import numpy as np


def load_image_rgb(path: str) -> np.ndarray:
    """Read an image file as [H, W, 3] uint8 (RGB).

    Grayscale images are replicated to 3 channels and alpha is dropped,
    matching the reference adapters (urso.py:143-154, speed.py:149-157).
    Uses PIL (no skimage dependency).
    """
    from PIL import Image
    with Image.open(path) as im:
        arr = np.asarray(im)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.shape[-1] == 4:
        arr = arr[..., :3]
    return arr


class Dataset:
    def __init__(self):
        self._image_ids = []
        self.image_info = []
        self.name = 'Dataset'
        self.camera = None
        # Classification-mode structures, populated by adapters:
        self.ori_histogram_map = None   # (bins³, 4) bin quaternions
        self.ori_output_mask = None     # (bins³,) redundant-bin mask
        self.histogram_3D_map = None    # (bins³, 3) location bin XYZ

    def add_image(self, source, image_id, path, **kwargs):
        info = {"id": image_id, "source": source, "path": path}
        info.update(kwargs)
        self.image_info.append(info)

    @property
    def image_ids(self):
        return self._image_ids

    def source_image_link(self, image_id):
        return self.image_info[image_id]["path"]

    def load_image(self, image_id):
        return load_image_rgb(self.image_info[image_id]['path'])

    def load_location(self, image_id):
        return self.image_info[image_id]["location"]

    def load_keypoints(self, image_id):
        return self.image_info[image_id]["keypoints"]

    def load_quaternion(self, image_id):
        return self.image_info[image_id]["quaternion"]

    def load_euler_angles(self, image_id):
        return self.image_info[image_id]["pyr"]

    def load_angle_axis(self, image_id):
        return self.image_info[image_id]["angleaxis"]

    def load_location_encoded(self, image_id):
        return self.image_info[image_id]["location_map"]

    def load_orientation_encoded(self, image_id):
        return self.image_info[image_id]["ori_map"]
