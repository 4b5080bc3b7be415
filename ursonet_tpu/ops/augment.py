"""Augmentation pipelines.

Two implementations of the reference augmentations, same semantics:

Host (parity) mode — per-image numpy/cv2, matching the reference exactly:
  * rotate_cam / rotate_image: random camera-rotation homography warp
    M = K·R·K⁻¹ applied with cv2.WARP_INVERSE_MAP (utils.py:30-86). Note
    the reference passes the flag alone, i.e. nearest-neighbour sampling.
    Pose update: t' = t·Rᵀ, q' = q_change ⊗ q (utils.py:53-55).
  * sim2real: Rec.709 grayscale always, then with p=0.5 a random-order
    pipeline of {gaussian noise σ=2.55, gaussian blur σ∈[0,1.5],
    add ±20, multiply 0.5–2.0, coarse dropout p∈{0,0.03} size 2–10%}
    (net.py:390-406).

Device (TPU-first, default) mode — the same ops as batched, RNG-keyed jnp
programs fused into one jit with the input mold. The warp runs at network
resolution with the camera intrinsics rescaled accordingly (homographies
commute with scaling: K' R K'⁻¹ where K' = S·K), so augmentation costs no
host time and no extra HBM round-trips. Everything except the warp is
gather-free (coarse dropout hashes cell coordinates instead of indexing a
random field) so XLA fuses the whole sim2real pipeline; the homography
warp — the one irreducible gather, which XLA lowers serially (TPU has no
vector-gather hardware) — runs as the Pallas MXU kernel in
ops/warp_pallas.py on TPU, with the XLA gather kept as the portable
fallback.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ursonet_tpu import se3, se3jax

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False


# ---------------------------------------------------------------------------
# Host (parity) implementations
# ---------------------------------------------------------------------------

def rotate_cam(image, t, q, K, magnitude, rng=None):
    """Random camera rotation as homography warp + pose update
    (reference utils.py:30-57)."""
    rng = rng or np.random
    pyr_change = (rng.rand(3) - 0.5) * magnitude
    return _warp_host(image, t, q, K, pyr_change)


def rotate_image(image, t, q, K, rng=None):
    """Random in-plane roll warp + pose update (reference utils.py:59-86).
    Roll amplitude ±85° (change = (rand-0.5)·170, utils.py:71)."""
    rng = rng or np.random
    change = (rng.rand(1) - 0.5) * 170
    return _warp_host(image, t, q, K, np.array([0.0, 0.0, change[0]]))


def _warp_host(image, t, q, K, pyr_change):
    R_change = se3.euler2SO3_left(pyr_change[0], pyr_change[1], pyr_change[2])
    K = np.asarray(K, np.float64)
    M = K @ R_change @ np.linalg.inv(K)
    h, w = image.shape[:2]
    if _HAS_CV2:
        warped = cv2.warpPerspective(image, M, (w, h), flags=cv2.WARP_INVERSE_MAP)
    else:  # pragma: no cover
        warped = np.asarray(warp_nearest_jax(
            jnp.asarray(image, jnp.float32)[None],
            jnp.asarray(M, jnp.float32)[None])[0]).astype(image.dtype)
    t_new = np.asarray(t, np.float64) @ R_change.T
    q_change = se3.SO32quat(R_change)
    q_new = se3.quat_mult(q_change, q)
    return warped, t_new, q_new


def sim2real_host(image, rng=None):
    """Reference sim2real pipeline on one uint8 image (net.py:390-406)."""
    rng = rng or np.random
    img = image.astype(np.float32)
    gray = 0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
    img = np.repeat(gray[..., None], 3, axis=2)
    if rng.rand(1)[0] > 0.5:
        ops = ['noise', 'blur', 'add', 'mul', 'dropout']
        order = rng.permutation(5)
        for k in order:
            img = _sim2real_op_host(ops[k], img, rng)
    return np.clip(img, 0, 255).astype(image.dtype)


def _sim2real_op_host(name, img, rng):
    if name == 'noise':
        return img + rng.randn(*img.shape[:2], 1).astype(np.float32) * (0.01 * 255)
    if name == 'blur':
        sigma = rng.rand(1)[0] * 1.5
        if sigma < 1e-3 or not _HAS_CV2:
            return img
        return cv2.GaussianBlur(img, (0, 0), sigma)
    if name == 'add':
        return img + rng.uniform(-20, 20)
    if name == 'mul':
        return img * rng.uniform(0.5, 2.0)
    if name == 'dropout':
        p = float(rng.choice([0.0, 0.03]))
        if p == 0.0:
            return img
        sp = rng.uniform(0.02, 0.1)
        h, w = img.shape[:2]
        mh, mw = max(1, int(h * sp)), max(1, int(w * sp))
        mask = (rng.rand(mh, mw) < p)
        mask = np.repeat(np.repeat(mask, -(-h // mh), 0), -(-w // mw), 1)[:h, :w]
        out = img.copy()
        out[mask] = 0
        return out
    raise ValueError(name)


# ---------------------------------------------------------------------------
# Device (batched, jit) implementations
# ---------------------------------------------------------------------------

def _warp_coords(M, h, w):
    """Source coordinates for dst(x,y) = src(M·(x,y,1)) (WARP_INVERSE_MAP
    semantics). M: [3,3]. Returns (src_x, src_y) each [h, w] float32."""
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    denom = M[2, 0] * xs + M[2, 1] * ys + M[2, 2]
    sx = (M[0, 0] * xs + M[0, 1] * ys + M[0, 2]) / denom
    sy = (M[1, 0] * xs + M[1, 1] * ys + M[1, 2]) / denom
    return sx, sy


def _warp_one(image, M, interpolation: str):
    """Warp one [H,W,C] image by homography M (dst←src map)."""
    h, w = image.shape[:2]
    sx, sy = _warp_coords(M, h, w)
    if interpolation == 'nearest':
        ix = jnp.round(sx).astype(jnp.int32)
        iy = jnp.round(sy).astype(jnp.int32)
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        out = image[jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1)]
        return jnp.where(valid[..., None], out, 0.0)
    # bilinear
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]

    def tap(yy, xx):
        valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        v = image[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
        return jnp.where(valid[..., None], v, 0.0)

    out = (tap(y0, x0) * (1 - fx) * (1 - fy) + tap(y0, x0 + 1) * fx * (1 - fy)
           + tap(y0 + 1, x0) * (1 - fx) * fy + tap(y0 + 1, x0 + 1) * fx * fy)
    return out


def warp_nearest_jax(images, Ms):
    """Batched nearest warp: images [B,H,W,C], Ms [B,3,3]."""
    return jax.vmap(lambda im, m: _warp_one(im, m, 'nearest'))(images, Ms)


def warp_bilinear_jax(images, Ms):
    """Batched bilinear warp: images [B,H,W,C], Ms [B,3,3]."""
    return jax.vmap(lambda im, m: _warp_one(im, m, 'bilinear'))(images, Ms)


def rotation_augment_batch(key, images, locs, quats, K, magnitude=20.0,
                           rot_aug=True, rot_image_aug=False,
                           interpolation='nearest', grayscale=False,
                           use_pallas: bool = True):
    """Batched on-device rotation augmentation (reference net.py:409-438):
    per sample one 50/50 dice picks camera-rotation (±magnitude/2 per
    axis) vs in-plane roll (±85°); pose updated consistently
    t' = t·Rᵀ (camera-frame rows), q' = q_c ⊗ q.

    images [B,H,W,C] float; locs [B,3] camera-frame; quats [B,4];
    K [3,3] intrinsics at the *current* image resolution.
    Returns (images', locs', quats').
    """
    b = images.shape[0]
    k_dice, k_cam, k_roll = jax.random.split(key, 3)
    dice = jax.random.uniform(k_dice, (b,))
    pyr_cam = (jax.random.uniform(k_cam, (b, 3)) - 0.5) * magnitude
    roll = (jax.random.uniform(k_roll, (b, 1)) - 0.5) * 170.0
    pyr_roll = jnp.concatenate([jnp.zeros((b, 2)), roll], axis=1)

    use_cam = jnp.asarray(rot_aug) & (dice > 0.5)
    use_roll = jnp.asarray(rot_image_aug) & (dice <= 0.5)
    pyr = jnp.where(use_cam[:, None], pyr_cam,
                    jnp.where(use_roll[:, None], pyr_roll,
                              jnp.zeros((b, 3))))

    R = se3jax.euler2SO3_left(pyr[:, 0], pyr[:, 1], pyr[:, 2])  # [B,3,3]
    K = jnp.asarray(K, jnp.float32)
    M = jnp.einsum('ij,bjk,kl->bil', K, R, jnp.linalg.inv(K))

    h, w = images.shape[1:3]
    from ursonet_tpu.ops import warp_pallas as wp
    if use_pallas and wp.supported(h, w) and jax.default_backend() == 'tpu':
        # MXU warp kernel (ops/warp_pallas.py): ~3x (RGB) / ~9x (gray)
        # over the XLA gather lowering at 512x640.
        warp_fn = wp.warp_pallas_gray if grayscale else wp.warp_pallas
        warped = warp_fn(images, M, interpolation)
    else:
        warp = warp_nearest_jax if interpolation == 'nearest' \
            else warp_bilinear_jax
        if grayscale:
            # All channels identical after sim2real — gather one, broadcast.
            warped = jnp.broadcast_to(warp(images[..., :1], M), images.shape)
        else:
            warped = warp(images, M)
    identity = ~(use_cam | use_roll)
    images_out = jnp.where(identity[:, None, None, None], images, warped)

    locs_out = jnp.einsum('bi,bji->bj', locs, R)     # t·Rᵀ rows
    q_change = se3jax.SO32quat(R)
    quats_out = se3jax.quat_mult(q_change, quats)
    locs_out = jnp.where(identity[:, None], locs, locs_out)
    quats_out = jnp.where(identity[:, None], quats, quats_out)
    return images_out, locs_out, quats_out


def _blur_kernel(sigma, radius: int = 4):
    """Gaussian taps for a traced sigma; sigma→0 degenerates to identity."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    s = jnp.maximum(sigma, 1e-3)
    k = jnp.exp(-0.5 * (x / s) ** 2)
    return k / jnp.sum(k)


# The sim2real ops run batched on a SINGLE gray channel [B,H,W,1] (the
# pipeline is always preceded by grayscale conversion and every imgaug op
# in the reference sequential is per_channel=False — net.py:390-403), and
# the result broadcasts back to 3 channels. All ops are elementwise or a
# tiny depthwise separable conv; coarse dropout derives its per-cell
# randomness from a stateless integer hash instead of a gather. This keeps
# the whole pipeline fusible by XLA (the first gather/switch-based version
# measured 764 ms per 32×512×640 batch on v5e; this one ~2 ms).

def _op_noise(x, key, b):
    # AdditiveGaussianNoise(scale=0.01*255), shared across channels
    return x + jax.random.normal(key, x.shape) * (0.01 * 255.0)


def _op_blur(x, key, b):
    # GaussianBlur(sigma ∈ [0, 1.5]) per image, depthwise separable.
    sigma = jax.random.uniform(key, (b, 1, 1, 1)) * 1.5
    taps = jnp.arange(-4, 5, dtype=jnp.float32)
    s = jnp.maximum(sigma, 1e-3)
    k = jnp.exp(-0.5 * (taps / s) ** 2)          # [B,1,1,9]
    k = k / jnp.sum(k, axis=-1, keepdims=True)
    padded = jnp.pad(x, ((0, 0), (4, 4), (0, 0), (0, 0)))
    out = sum(padded[:, i:i + x.shape[1]] * k[..., i:i + 1] for i in range(9))
    padded = jnp.pad(out, ((0, 0), (0, 0), (4, 4), (0, 0)))
    out = sum(padded[:, :, i:i + x.shape[2]] * k[..., i:i + 1] for i in range(9))
    return jnp.where(sigma < 1e-3, x, out)


def _op_add(x, key, b):
    return x + jax.random.uniform(key, (b, 1, 1, 1), minval=-20., maxval=20.)


def _op_mul(x, key, b):
    return x * jax.random.uniform(key, (b, 1, 1, 1), minval=0.5, maxval=2.0)


def _hash_uniform(*ints):
    """Stateless per-element uniform in [0,1) from int32 inputs (a cheap
    xorshift/multiply mix) — elementwise replacement for gathering from a
    random field."""
    h = jnp.asarray(0x9E3779B9, jnp.uint32)
    for v in ints:
        h = h ^ (v.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
        h = (h ^ (h >> 13)) * jnp.uint32(0xC2B2AE35)
        h = h ^ (h >> 16)
    return h.astype(jnp.float32) / jnp.float32(4294967296.0)


def _op_dropout(x, key, b):
    # CoarseDropout(p ∈ {0, 0.03}, size_percent ∈ [0.02, 0.1]): per-cell
    # uniform from a hash of the cell coordinates (no gather).
    _, h, w, _ = x.shape
    k1, k2, k3 = jax.random.split(key, 3)
    p = jnp.where(jax.random.bernoulli(k1, shape=(b, 1, 1, 1)), 0.03, 0.0)
    sp = jax.random.uniform(k2, (b, 1, 1, 1), minval=0.02, maxval=0.1)
    block = 1.0 / sp
    salt = jax.random.randint(k3, (b, 1, 1, 1), 0, 2 ** 30)
    iy = jax.lax.broadcasted_iota(jnp.float32, (1, h, w, 1), 1)
    ix = jax.lax.broadcasted_iota(jnp.float32, (1, h, w, 1), 2)
    cy = jnp.floor(iy / block).astype(jnp.int32)
    cx = jnp.floor(ix / block).astype(jnp.int32)
    cell = _hash_uniform(cy * 65537 + cx, salt + 0 * cy)
    return jnp.where(cell < p, 0.0, x)


_SIM2REAL_OPS = (_op_noise, _op_blur, _op_add, _op_mul, _op_dropout)


def _sim2real_per_image_order(perms, op_keys, gray, b):
    """Apply the 5-op pipeline where image i uses ITS OWN op order
    perms[i] (exact imgaug random_order semantics, net.py:397).

    At each of the 5 steps, all 5 op outputs are computed on the batch
    and each image one-hot-selects its step-t op — 25 op applications
    instead of 5, but branch-free and fully fusible (a per-image
    lax.switch would vmap to the same select anyway). Each op j draws
    its per-image magnitudes from op_keys[j] regardless of its position
    in an image's order, matching the reference where order and
    magnitude are independent."""
    x = gray
    for t in range(5):
        outs = [op(x, op_keys[j], b)
                for j, op in enumerate(_SIM2REAL_OPS)]
        onehot = jax.nn.one_hot(perms[:, t], 5, dtype=x.dtype)  # [B,5]
        x = sum(onehot[:, j][:, None, None, None] * outs[j]
                for j in range(5))
    return x


def sim2real_batch(key, images, per_image_order=False):
    """Batched on-device sim2real (reference net.py:390-406): mandatory
    grayscale, then with p=0.5 the 5-op pipeline in random order.
    images [B,H,W,3] float32 in [0,255].

    Order handling: by default the batch shares one op order per step
    (drawn from the same key), while every op's magnitudes stay
    per-image — a TPU-friendly relaxation of imgaug's per-image
    random_order that preserves each sample's marginal augmentation
    distribution. `per_image_order=True` (config
    SIM2REAL_PER_IMAGE_ORDER) restores exact per-image orders at ~4×
    the pipeline cost (still a few ms per batch; the pipeline is a
    small fraction of the train step).
    """
    b = images.shape[0]
    k_apply, k_perm, k_ops = jax.random.split(key, 3)
    gray = (0.2126 * images[..., 0] + 0.7152 * images[..., 1] +
            0.0722 * images[..., 2])[..., None]

    op_keys = jax.random.split(k_ops, 5)

    if per_image_order:
        perms = jax.vmap(lambda k: jax.random.permutation(k, 5))(
            jax.random.split(k_perm, b))
        x = _sim2real_per_image_order(perms, op_keys, gray, b)
    else:
        perm = jax.random.permutation(k_perm, 5)
        branches = tuple(
            (lambda x, k, _op=op: _op(x, k, b)) for op in _SIM2REAL_OPS)
        x = gray
        for i in range(5):
            x = jax.lax.switch(perm[i], branches, x, op_keys[i])
    x = jnp.clip(x, 0.0, 255.0)

    apply = jax.random.bernoulli(k_apply, shape=(b, 1, 1, 1))
    out = jnp.where(apply, x, gray)
    return jnp.broadcast_to(out, images.shape)


def scaled_intrinsics(K_original, original_hw: Tuple[int, int],
                      window, scale) -> np.ndarray:
    """Intrinsics at network resolution: K' = S·K with the resize scale and
    the pad window offset, so the on-device warp M = K'RK'⁻¹ matches the
    reference's original-resolution warp up to resampling."""
    K = np.asarray(K_original, np.float64).copy()
    y1, x1, _, _ = window
    S = np.array([[scale, 0, x1], [0, scale, y1], [0, 0, 1.0]])
    return S @ K
