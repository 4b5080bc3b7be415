"""Pallas warp-kernel correctness vs the XLA gather reference, run in
interpreter mode on the CPU test platform (the same kernel was validated
compiled on a real v5e: bilinear exact to <1 u8 LSB, nearest differing
only on .5-rounding ties at ~3e-5 of pixels)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ursonet_tpu import se3
from ursonet_tpu.ops import augment as aug
from ursonet_tpu.ops import warp_pallas as wp


def _homographies(n, seed=0):
    rng = np.random.RandomState(seed)
    K = np.array([[640.0, 0, 320], [0, 640.0, 256], [0, 0, 1]])
    Ms = []
    for i in range(n):
        if i % 2 == 0:
            pyr = (rng.rand(3) - 0.5) * 20          # camera rotation
        else:
            pyr = np.array([0, 0, (rng.rand() - 0.5) * 170])  # big roll
        R = np.asarray(se3.euler2SO3_left(*pyr))
        Ms.append(K @ R @ np.linalg.inv(K))
    return jnp.asarray(np.stack(Ms), jnp.float32)


@pytest.mark.parametrize('interp', ['nearest', 'bilinear'])
def test_warp_pallas_matches_gather(interp):
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.rand(2, 512, 640, 1) * 255, jnp.float32)
    Ms = _homographies(2)
    ref_fn = aug.warp_nearest_jax if interp == 'nearest' \
        else aug.warp_bilinear_jax
    ref = np.asarray(ref_fn(imgs, Ms))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(wp.warp_pallas(imgs, Ms, interp))
    diff = np.abs(ref - got)
    if interp == 'bilinear':
        assert diff.max() < 1.0
    else:
        # round-half ties may differ on a vanishing fraction of pixels
        assert (diff > 1.0).mean() < 1e-3


def test_warp_pallas_fallback_small_shapes():
    """Shapes the kernel can't tile route to the XLA path and stay
    correct."""
    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.rand(2, 64, 64, 3) * 255, jnp.float32)
    Ms = _homographies(2)
    ref = np.asarray(aug.warp_nearest_jax(imgs, Ms))
    got = np.asarray(wp.warp_pallas(imgs, Ms, 'nearest'))
    np.testing.assert_array_equal(ref, got)


def test_rotation_augment_uses_fallback_on_cpu(rng):
    """rotation_augment_batch must run on non-TPU backends (pallas kernel
    auto-disabled)."""
    imgs = jnp.asarray(rng.rand(2, 512, 640, 3) * 255, jnp.float32)
    locs = jnp.asarray(rng.randn(2, 3) + 10, jnp.float32)
    q = rng.randn(2, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    K = jnp.asarray([[640.0, 0, 320], [0, 640.0, 256], [0, 0, 1]],
                    jnp.float32)
    out, locs2, q2 = aug.rotation_augment_batch(
        jax.random.PRNGKey(0), imgs, locs, jnp.asarray(q, jnp.float32), K,
        use_pallas=True)
    assert out.shape == imgs.shape
    assert np.isfinite(np.asarray(out)).all()
