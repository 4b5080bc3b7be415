"""Image resize / pad / normalization.

Host-side (numpy + cv2) equivalents of the reference resize modes
(utils.py:398-511) producing *static* shapes per config — the key XLA
property: every (dataset, image_scale, resize-mode) combination yields one
fixed input shape per run (reference already guarantees this,
pose_estimator.py:850-860).

Also provides the device-side batched mold (mean subtract + dtype cast)
used inside the jit input pipeline.
"""

from __future__ import annotations

import random

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False


def _bilinear_resize(image: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize preserving range (reference uses
    skimage.transform.resize(order=1, preserve_range=True), utils.py:457)."""
    if _HAS_CV2:
        return cv2.resize(image.astype(np.float32), (out_w, out_h),
                          interpolation=cv2.INTER_LINEAR)
    # Fallback: vectorized numpy bilinear (edge-aligned like cv2/skimage).
    h, w = image.shape[:2]
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    img = image.astype(np.float32)
    if img.ndim == 2:
        img = img[..., None]
    top = img[y0][:, x0] * (1 - wx[..., None]) + img[y0][:, x1] * wx[..., None]
    bot = img[y1][:, x0] * (1 - wx[..., None]) + img[y1][:, x1] * wx[..., None]
    out = top * (1 - wy[..., None]) + bot * wy[..., None]
    return out if image.ndim == 3 else out[..., 0]


def resize_image(image, min_dim=None, max_dim=None, min_scale=None,
                 mode="square", rng: random.Random | None = None):
    """Resize keeping aspect ratio; pad/crop according to `mode`.

    Same contract as the reference (utils.py:398-511):
      mode none:   unchanged.
      mode square: scale so small side == min_dim without long side
                   exceeding max_dim, center-pad to (max_dim, max_dim).
      mode pad64:  optional scale, pad H and W to multiples of 64.
      mode crop:   scale then random min_dim² crop (training only).

    Returns (image, window, scale, padding, crop) with window=(y1,x1,y2,x2)
    marking the un-padded region.
    """
    image_dtype = image.dtype
    h, w = image.shape[:2]
    window = (0, 0, h, w)
    scale = 1
    padding = [(0, 0), (0, 0), (0, 0)]
    crop = None

    if mode == "none":
        return image, window, scale, padding, crop

    if min_dim:
        scale = min_dim / min(h, w)
    if min_scale and scale < min_scale:
        scale = min_scale
    if max_dim and mode != "crop":
        image_max = max(h, w)
        if round(image_max * scale) > max_dim:
            scale = max_dim / image_max

    if scale != 1:
        image = _bilinear_resize(image, round(h * scale), round(w * scale))

    if mode == "square":
        h, w = image.shape[:2]
        top_pad = (max_dim - h) // 2
        bottom_pad = max_dim - h - top_pad
        left_pad = (max_dim - w) // 2
        right_pad = max_dim - w - left_pad
        padding = [(top_pad, bottom_pad), (left_pad, right_pad)]
        if image.ndim > 2:
            padding = padding + [(0, 0)]
        image = np.pad(image, padding, mode='constant', constant_values=0)
        window = (top_pad, left_pad, h + top_pad, w + left_pad)
    elif mode == "pad64":
        h, w = image.shape[:2]
        assert min_dim % 64 == 0, "Minimum dimension must be a multiple of 64"
        if h % 64 > 0:
            max_h = h - (h % 64) + 64
            top_pad = (max_h - h) // 2
            bottom_pad = max_h - h - top_pad
        else:
            top_pad = bottom_pad = 0
        if w % 64 > 0:
            max_w = w - (w % 64) + 64
            left_pad = (max_w - w) // 2
            right_pad = max_w - w - left_pad
        else:
            left_pad = right_pad = 0
        padding = [(top_pad, bottom_pad), (left_pad, right_pad)]
        if image.ndim > 2:
            padding = padding + [(0, 0)]
        image = np.pad(image, padding, mode='constant', constant_values=0)
        window = (top_pad, left_pad, h + top_pad, w + left_pad)
    elif mode == "crop":
        h, w = image.shape[:2]
        r = rng if rng is not None else random
        y = r.randint(0, (h - min_dim))
        x = r.randint(0, (w - min_dim))
        crop = (y, x, min_dim, min_dim)
        image = image[y:y + min_dim, x:x + min_dim]
        window = (0, 0, min_dim, min_dim)
    else:
        raise ValueError(f"Mode {mode} not supported")
    return image.astype(image_dtype), window, scale, padding, crop


def mold_image(image, config):
    """Mean-subtract and cast (reference net.py:1337-1348)."""
    dtype = np.float16 if getattr(config, "F16", False) else np.float32
    mean = np.asarray(config.MEAN_PIXEL)
    if image.shape[-1] == 3:
        return image.astype(dtype) - mean.astype(dtype)
    return image.astype(dtype) - np.mean(mean).astype(dtype)


def unmold_image(normalized_images, config):
    """Inverse of mold_image (reference net.py:1351-1355)."""
    return (normalized_images + np.asarray(config.MEAN_PIXEL)).astype(np.uint8)


def compose_image_meta(image_id, original_image_shape, image_shape, window,
                       scale):
    """Pack per-image metadata into one 1-D vector
    (reference net.py:1314-1335): id(1) + orig_shape(3) + shape(3) +
    window(4) + scale(1)."""
    return np.array(
        [image_id] + list(original_image_shape) + list(image_shape) +
        list(window) + [scale], dtype=np.float32)


def parse_image_meta(meta):
    """Unpack compose_image_meta vectors (batched)."""
    meta = np.atleast_2d(meta)
    return {
        "image_id": meta[:, 0],
        "original_image_shape": meta[:, 1:4],
        "image_shape": meta[:, 4:7],
        "window": meta[:, 7:11],
        "scale": meta[:, 11],
    }
