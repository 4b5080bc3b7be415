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


def _pick_scale(h, w, min_dim, max_dim, min_scale, clamp_max):
    """Scale factor per the reference contract: bring the small side up to
    `min_dim`, floor at `min_scale`, then cap so the long side does not
    exceed `max_dim` (the cap wins over both)."""
    scale = min_dim / min(h, w) if min_dim else 1
    if min_scale:
        scale = max(scale, min_scale)
    if clamp_max and max_dim and round(max(h, w) * scale) > max_dim:
        scale = max_dim / max(h, w)
    return scale


def _pad_centered(image, out_h, out_w):
    """Zero-pad `image` to (out_h, out_w), split evenly per axis with the
    odd pixel going to the bottom/right. Returns (padded, window, padding)
    with window = (y1, x1, y2, x2) framing the original content."""
    h, w = image.shape[:2]
    top, left = (out_h - h) // 2, (out_w - w) // 2
    padding = [(top, out_h - h - top), (left, out_w - w - left)]
    if image.ndim > 2:
        padding.append((0, 0))
    padded = np.pad(image, padding, mode="constant", constant_values=0)
    return padded, (top, left, top + h, left + w), padding


def resize_image(image, min_dim=None, max_dim=None, min_scale=None,
                 mode="square", rng: random.Random | None = None):
    """Resize keeping aspect ratio; pad/crop according to `mode`.

      mode none:   unchanged.
      mode square: scale so small side == min_dim without long side
                   exceeding max_dim, center-pad to (max_dim, max_dim).
      mode pad64:  optional scale, center-pad H and W up to multiples
                   of 64 (the default training/serving mode).
      mode crop:   scale then random min_dim² crop (training only).

    Returns (image, window, scale, padding, crop) with window=(y1,x1,y2,x2)
    marking the un-padded region.

    Derivation note: the scale selection and center-pad arithmetic must be
    bit-compatible with the reference's Mask-R-CNN-lineage resize
    (/root/reference/utils.py:398-511, itself MIT matterport code) because
    the resulting window rides in image_meta and feeds the decode path;
    the implementation here is restructured around _pick_scale /
    _pad_centered but preserves that arithmetic exactly (pinned by
    tests/test_image_config.py).
    """
    image_dtype = image.dtype
    h, w = image.shape[:2]
    no_pad = [(0, 0), (0, 0), (0, 0)]
    if mode == "none":
        return image, (0, 0, h, w), 1, no_pad, None

    scale = _pick_scale(h, w, min_dim, max_dim, min_scale,
                        clamp_max=(mode != "crop"))
    if scale != 1:
        image = _bilinear_resize(image, round(h * scale), round(w * scale))
    h, w = image.shape[:2]
    crop = None

    if mode == "square":
        image, window, padding = _pad_centered(image, max_dim, max_dim)
    elif mode == "pad64":
        assert min_dim % 64 == 0, "pad64 requires min_dim % 64 == 0"
        image, window, padding = _pad_centered(
            image, -(-h // 64) * 64, -(-w // 64) * 64)
    elif mode == "crop":
        r = rng if rng is not None else random
        y, x = r.randint(0, h - min_dim), r.randint(0, w - min_dim)
        image = image[y:y + min_dim, x:x + min_dim]
        window, padding = (0, 0, min_dim, min_dim), no_pad
        crop = (y, x, min_dim, min_dim)
    else:
        raise ValueError(f"unknown resize mode: {mode!r}")
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
