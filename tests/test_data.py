"""Data-layer tests: synthetic dataset generation, URSO/SPEED adapters,
generator batching, host-parity vs device augmentation pipelines."""

import os

import numpy as np
import pytest

from ursonet_tpu import se3
from ursonet_tpu.config import Config
from ursonet_tpu.data import Speed, Urso
from ursonet_tpu.data import loader as dloader
from ursonet_tpu.data import synthetic


@pytest.fixture(scope="module")
def urso_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("urso_synth")
    return synthetic.make_urso_dataset(str(d), n_per_subset=6)


@pytest.fixture(scope="module")
def speed_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("speed_synth")
    return synthetic.make_speed_dataset(str(d), n_per_subset=4)


def small_config(**overrides):
    cfg = Config()
    cfg.BACKBONE = 'resnet18'
    cfg.IMAGE_RESIZE_MODE = 'pad64'
    cfg.IMAGE_MIN_DIM = 192
    cfg.IMAGE_MAX_DIM = 256
    cfg.ORI_BINS_PER_DIM = 8
    cfg.LOC_BINS_PER_DIM = 4
    cfg.ROT_AUG = False
    for k, v in overrides.items():
        setattr(cfg, k, v)
    cfg.update()
    return cfg


def test_urso_adapter_regression(urso_dir):
    cfg = small_config(REGRESS_ORI=True, REGRESS_LOC=True)
    ds = Urso()
    ds.load_dataset(urso_dir, cfg, "train")
    assert ds.num_images == 6
    q = ds.load_quaternion(0)
    assert q[3] >= 0  # north hemisphere
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-5)
    img = ds.load_image(0)
    assert img.shape == (240, 320, 3) and img.dtype == np.uint8
    # all parameterizations consistent
    pyr = ds.load_euler_angles(0)
    q2 = se3.euler2quat(*pyr)
    assert se3.angle_between_quats(q, q2).item() < 0.1
    aa = ds.load_angle_axis(0)
    v = np.linalg.norm(aa)
    q3 = se3.angleaxis2quat(np.asarray(aa) / v, v)
    assert se3.angle_between_quats(q, q3).item() < 0.1


def test_urso_adapter_classification(urso_dir):
    cfg = small_config(REGRESS_ORI=False, REGRESS_LOC=False)
    ds = Urso()
    ds.load_dataset(urso_dir, cfg, "train")
    assert ds.ori_histogram_map.shape == (8 ** 3, 4)
    assert ds.histogram_3D_map.shape == (4 ** 3, 3)
    pmf = ds.load_orientation_encoded(0)
    np.testing.assert_allclose(pmf.sum(), 1.0, atol=1e-5)
    lmf = ds.load_location_encoded(0)
    np.testing.assert_allclose(lmf.sum(), 1.0, atol=1e-5)
    # decoding the GT PMF recovers the pose within the quantization floor
    q_dec, _ = se3.quat_weighted_avg(ds.ori_histogram_map, pmf)
    assert se3.angle_between_quats(q_dec, ds.load_quaternion(0)).item() < 25


def test_speed_adapter(speed_dir):
    cfg = small_config()
    ds = Speed()
    ds.load_dataset(speed_dir, cfg, "train_no_val")
    assert ds.num_images == 4
    q = ds.load_quaternion(0)
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-5)
    img = ds.load_image(0)
    assert img.shape[-1] == 3  # gray replicated to RGB
    # grayscale: all channels equal
    np.testing.assert_array_equal(img[..., 0], img[..., 1])


def test_speed_test_subset_unlabeled(speed_dir):
    cfg = small_config(REGRESS_ORI=False)
    ds = Speed()
    ds.load_dataset(speed_dir, cfg, "test")
    assert ds.num_images == 4
    assert ds.ori_histogram_map.shape == (8 ** 3, 4)
    assert not ds.ori_output_mask.any()   # bogus all-False mask (speed.py:133)
    assert 'quaternion' not in ds.image_info[0]


def test_speed_quaternion_reorder(speed_dir):
    import json, os
    with open(os.path.join(speed_dir, 'train_no_val.json')) as f:
        anns = json.load(f)
    cfg = small_config()
    ds = Speed()
    ds.load_dataset(speed_dir, cfg, "train_no_val")
    q_file = anns[0]['q_vbs2tango']          # scalar first
    q_ds = ds.load_quaternion(0)             # scalar last + hemisphere
    sign = np.sign(q_file[0])
    np.testing.assert_allclose(
        q_ds, sign * np.array([q_file[1], q_file[2], q_file[3], q_file[0]]),
        atol=1e-6)


def test_generator_parity_mode(urso_dir):
    cfg = small_config(REGRESS_ORI=True, REGRESS_LOC=True,
                       AUGMENT_ON_DEVICE=False)
    ds = Urso()
    ds.load_dataset(urso_dir, cfg, "train")
    gen = dloader.data_generator(ds, cfg, batch_size=2, seed=0)
    batch = next(gen)
    assert batch['images'].shape == (2, 192, 256, 3)
    assert batch['images'].dtype == np.float32
    assert batch['gt_loc'].shape == (2, 3)
    assert batch['gt_ori'].shape == (2, 4)
    assert batch['image_meta'].shape == (2, 12)
    # molded: roughly zero-centered
    assert abs(batch['images'].mean()) < 130


def test_generator_raw_mode(urso_dir):
    cfg = small_config(AUGMENT_ON_DEVICE=True)
    ds = Urso()
    ds.load_dataset(urso_dir, cfg, "train")
    gen = dloader.data_generator(ds, cfg, batch_size=2, seed=0)
    batch = next(gen)
    assert batch['images_u8'].dtype == np.uint8
    assert batch['images_u8'].shape == (2, 192, 256, 3)
    assert batch['quaternion'].shape == (2, 4)


def test_generator_classification_batch(urso_dir):
    cfg = small_config(REGRESS_ORI=False, REGRESS_LOC=False,
                       AUGMENT_ON_DEVICE=False)
    ds = Urso()
    ds.load_dataset(urso_dir, cfg, "train")
    batch = next(dloader.data_generator(ds, cfg, batch_size=2, seed=0))
    assert batch['gt_ori'].shape == (2, 8 ** 3)
    assert batch['gt_loc'].shape == (2, 4 ** 3)


def test_generator_keypoints_batch(urso_dir):
    cfg = small_config(REGRESS_KEYPOINTS=True, AUGMENT_ON_DEVICE=False)
    ds = Urso()
    ds.load_dataset(urso_dir, cfg, "train")
    batch = next(dloader.data_generator(ds, cfg, batch_size=2, seed=0))
    assert batch['gt_k1'].shape == (2, 3)
    assert batch['gt_k2'].shape == (2, 3)


def test_device_preprocess_no_aug_matches_parity(urso_dir):
    """Without augmentation, device preprocessing must equal the host
    parity pipeline (mold of resized image, raw poses)."""
    import jax
    cfg = small_config(REGRESS_ORI=True, REGRESS_LOC=True, ROT_AUG=False,
                       SIM2REAL_AUG=False)
    # this test checks the device-preprocess math against the per-image
    # python path; the native batch loader has its own parity test
    cfg.NATIVE_LOADER = False
    ds = Urso()
    ds.load_dataset(urso_dir, cfg, "train")
    cfg.AUGMENT_ON_DEVICE = False
    parity = next(dloader.data_generator(ds, cfg, batch_size=2, shuffle=False,
                                         seed=0))
    cfg.AUGMENT_ON_DEVICE = True
    raw = next(dloader.data_generator(ds, cfg, batch_size=2, shuffle=False,
                                      seed=0))
    pre = dloader.make_device_preprocess(cfg, ds)
    out = jax.jit(pre)(jax.random.PRNGKey(0),
                       {k: np.asarray(v) for k, v in raw.items()})
    np.testing.assert_allclose(np.asarray(out['images']), parity['images'],
                               atol=0.5)
    np.testing.assert_allclose(np.asarray(out['gt_loc']), parity['gt_loc'],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out['gt_ori']), parity['gt_ori'],
                               atol=1e-5)


def test_device_preprocess_with_aug_updates_pose(urso_dir):
    import jax
    cfg = small_config(REGRESS_ORI=True, REGRESS_LOC=True, ROT_AUG=True,
                       ROT_IMAGE_AUG=True, SIM2REAL_AUG=True)
    ds = Urso()
    ds.load_dataset(urso_dir, cfg, "train")
    cfg.AUGMENT_ON_DEVICE = True
    raw = next(dloader.data_generator(ds, cfg, batch_size=4, shuffle=False,
                                      seed=0))
    pre = dloader.make_device_preprocess(cfg, ds)
    out = jax.jit(pre)(jax.random.PRNGKey(1),
                       {k: np.asarray(v) for k, v in raw.items()})
    # Rotated poses differ from the originals but quaternions stay unit
    q = np.asarray(out['gt_ori'])
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-5)
    assert not np.allclose(q, raw['quaternion'])
    # Location norm is preserved by rotations
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out['gt_loc']), axis=1),
                               np.linalg.norm(raw['location'], axis=1),
                               rtol=1e-4)


def test_device_preprocess_classification_reencode(urso_dir):
    import jax
    cfg = small_config(REGRESS_ORI=False, REGRESS_LOC=True, ROT_AUG=True)
    ds = Urso()
    ds.load_dataset(urso_dir, cfg, "train")
    cfg.AUGMENT_ON_DEVICE = True
    raw = next(dloader.data_generator(ds, cfg, batch_size=2, shuffle=False,
                                      seed=0))
    pre = dloader.make_device_preprocess(cfg, ds)
    out = jax.jit(pre)(jax.random.PRNGKey(2),
                       {k: np.asarray(v) for k, v in raw.items()})
    pmf = np.asarray(out['gt_ori'])
    assert pmf.shape == (2, 8 ** 3)
    np.testing.assert_allclose(pmf.sum(1), 1.0, atol=1e-4)
    assert np.all(pmf[:, ds.ori_output_mask] == 0)


def test_rotation_warp_device_matches_cv2(urso_dir):
    """Device nearest warp vs cv2 WARP_INVERSE_MAP on the same M."""
    import jax.numpy as jnp
    import cv2
    from ursonet_tpu.ops import augment as aug
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (96, 128, 3)).astype(np.float32)
    R = se3.euler2SO3_left(3.0, -4.0, 5.0)
    K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    M = K @ R @ np.linalg.inv(K)
    want = cv2.warpPerspective(img, M, (128, 96), flags=cv2.WARP_INVERSE_MAP)
    got = np.asarray(aug.warp_nearest_jax(
        jnp.asarray(img)[None], jnp.asarray(M, jnp.float32)[None])[0])
    # Nearest-neighbour rounding ties may differ on a sparse set of pixels.
    frac_diff = np.mean(np.any(got != want, axis=-1))
    assert frac_diff < 0.08


def test_rotate_cam_pose_update_consistency():
    """q' and t' from the host warp must represent the same rigid change:
    decode R from q'⊗q⁻¹ and check t' = t·Rᵀ."""
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (48, 64, 3)).astype(np.uint8)
    t = np.array([10.0, 1.0, 2.0])
    q = np.array([0.0, 0.0, 0.0, 1.0])
    K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
    from ursonet_tpu.ops import augment as aug
    _, t_new, q_new = aug.rotate_cam(img, t, q, K, 20,
                                     np.random.RandomState(3))
    # q was identity → q_new is the rotation quaternion itself
    R = se3.quat2SO3(q_new)
    np.testing.assert_allclose(t_new, t @ R.T, atol=1e-6)


def test_prefetcher(urso_dir):
    cfg = small_config(AUGMENT_ON_DEVICE=False)
    ds = Urso()
    ds.load_dataset(urso_dir, cfg, "train")
    gen = dloader.Prefetcher(
        dloader.data_generator(ds, cfg, batch_size=2, seed=0), depth=2)
    b1 = next(gen)
    b2 = next(gen)
    assert b1['images'].shape == b2['images'].shape


def test_generator_error_tolerance(urso_dir):
    cfg = small_config(AUGMENT_ON_DEVICE=False)
    ds = Urso()
    ds.load_dataset(urso_dir, cfg, "train")
    # Corrupt one entry's path: generator must skip it
    ds.image_info[1]['path'] = '/nonexistent.png'
    gen = dloader.data_generator(ds, cfg, batch_size=2, shuffle=False, seed=0)
    for _ in range(3):
        batch = next(gen)
        assert batch['images'].shape[0] == 2


def test_native_loader_matches_python_path(tmp_path):
    """The C++ batch loader (decode+resize+pad placement) must agree with
    the PIL/numpy raw path within u8 rounding."""
    import numpy as np
    import pytest

    from ursonet_tpu.config import Config
    from ursonet_tpu.data import loader as L
    from ursonet_tpu.data import native_loader
    from ursonet_tpu.data.synthetic import make_urso_dataset
    from ursonet_tpu.data.urso import Urso

    if not native_loader.available():
        pytest.skip("native loader not built (no g++/libjpeg/libpng)")

    class Cfg(Config):
        IMAGE_RESIZE_MODE = 'square'
        IMAGE_MAX_DIM = 128
        IMAGE_MIN_DIM = 128
        IMAGES_PER_GPU = 4
        ROT_AUG = False
        AUGMENT_ON_DEVICE = True

    cfg = Cfg()
    d = tmp_path / 'urso'
    make_urso_dataset(str(d), subsets=('train',), n_per_subset=4,
                      width=160, height=120)
    ds = Urso()
    ds.load_dataset(str(d), cfg, 'train')

    cfg.NATIVE_LOADER = True
    gen_n = L.data_generator(ds, cfg, shuffle=False,
                             batch_size=4, seed=0, raw=True)
    b_native = next(gen_n)
    cfg.NATIVE_LOADER = False
    gen_p = L.data_generator(ds, cfg, shuffle=False,
                             batch_size=4, seed=0, raw=True)
    b_py = next(gen_p)

    assert b_native['images_u8'].shape == b_py['images_u8'].shape
    diff = np.abs(b_native['images_u8'].astype(int) -
                  b_py['images_u8'].astype(int))
    # same resampling math; only u8 rounding differs
    assert diff.max() <= 1, diff.max()
    np.testing.assert_array_equal(b_native['location'], b_py['location'])
    np.testing.assert_array_equal(b_native['quaternion'],
                                  b_py['quaternion'])


def test_prefetcher_finite_stream_exhausts_cleanly():
    """Prefetcher over a finite generator yields everything, raises
    StopIteration at the end, and KEEPS raising on further next() calls
    (iterator protocol) instead of blocking forever."""
    from ursonet_tpu.data.loader import Prefetcher

    pf = Prefetcher(iter(range(5)), depth=2)
    assert list(pf) == [0, 1, 2, 3, 4]
    import pytest
    with pytest.raises(StopIteration):
        next(pf)
    with pytest.raises(StopIteration):
        next(pf)

    # errors propagate
    def boom():
        yield 1
        raise RuntimeError('boom')
    pf = Prefetcher(boom(), depth=2)
    assert next(pf) == 1
    with pytest.raises(RuntimeError):
        next(pf)
    # a producer error stays an error on re-entry — consumers that
    # retry must not see it silently downgraded to StopIteration
    with pytest.raises(RuntimeError):
        next(pf)


def test_native_loader_jpeg_and_png_pixel_parity(tmp_path):
    """Native decode must match PIL pixel-for-pixel on PNG (lossless) and
    JPEG (same libjpeg underneath), across thread counts — the
    fallback-correctness contract of native/host_loader.cpp."""
    import numpy as np
    import pytest
    from PIL import Image

    from ursonet_tpu.data import native_loader

    if not native_loader.available():
        pytest.skip("native loader not built")

    rng = np.random.RandomState(3)
    img = (rng.rand(90, 130, 3) * 255).astype(np.uint8)
    png = str(tmp_path / 'a.png')
    jpg = str(tmp_path / 'a.jpg')
    Image.fromarray(img).save(png)
    Image.fromarray(img).save(jpg, quality=92)

    for path in (png, jpg):
        ref = np.asarray(Image.open(path).convert('RGB'))
        got = native_loader.decode(path)
        assert got.shape == ref.shape
        np.testing.assert_array_equal(got, ref)

    # batch path: identity geometry (content == output, no scaling) and
    # multiple threads over a 16-image batch
    paths = []
    refs = []
    for i in range(16):
        im = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f'b{i}.png')
        Image.fromarray(im).save(p)
        paths.append(p)
        refs.append(im)
    for nthreads in (1, 4):
        out = native_loader.load_batch(paths, 64, 64, 64, 64, 0, 0,
                                       nthreads=nthreads)
        np.testing.assert_array_equal(out, np.stack(refs))


def test_sim2real_per_image_order_exact():
    """SIM2REAL_PER_IMAGE_ORDER applies each image's OWN op permutation
    (imgaug random_order semantics, reference net.py:397): the batched
    one-hot composition must equal a per-image sequential application of
    the same ops with the same per-op keys."""
    import jax
    import jax.numpy as jnp
    from ursonet_tpu.ops import augment as aug

    b, h, w = 4, 24, 20
    rng = np.random.RandomState(11)
    gray = jnp.asarray(rng.rand(b, h, w, 1).astype(np.float32) * 255.0)
    op_keys = jax.random.split(jax.random.PRNGKey(5), 5)
    perms = np.stack([np.random.RandomState(i).permutation(5)
                      for i in range(b)])
    assert len({tuple(p) for p in perms}) > 1  # orders really differ

    got = aug._sim2real_per_image_order(jnp.asarray(perms), op_keys,
                                        gray, b)

    # expected: per image, apply its ops sequentially on the full batch
    # (each op draws batch-shaped magnitudes from its own key, so image
    # i's magnitudes are position-independent) and keep row i
    expected = np.zeros_like(np.asarray(got))
    for i in range(b):
        x = gray
        for t in range(5):
            x = aug._SIM2REAL_OPS[perms[i, t]](x, op_keys[perms[i, t]], b)
        expected[i] = np.asarray(x)[i]
    np.testing.assert_allclose(np.asarray(got), expected,
                               rtol=1e-5, atol=1e-3)


def test_sim2real_per_image_order_batch_path():
    """The public entry point runs under jit in both order modes and the
    exact mode actually changes the (shared-order) result."""
    import jax
    import jax.numpy as jnp
    from ursonet_tpu.ops import augment as aug

    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.rand(4, 24, 20, 3).astype(np.float32) * 255.)
    key = jax.random.PRNGKey(0)
    shared = jax.jit(aug.sim2real_batch)(key, images)
    exact = jax.jit(lambda k, x: aug.sim2real_batch(
        k, x, per_image_order=True))(key, images)
    assert shared.shape == exact.shape == images.shape
    assert np.isfinite(np.asarray(exact)).all()
    assert not np.allclose(np.asarray(shared), np.asarray(exact))


# ---------------------------------------------------------------------------
# Real-format fixtures (round 4): RGBA PNG (URSO renders carry an alpha
# plane — reference urso.py:143-153) and grayscale JPEG (SPEED captures are
# 1920x1200 monochrome — reference speed.py:149-157). Committed under
# tests/data/ so these branches are CI-covered without the real datasets.
# ---------------------------------------------------------------------------

_FIXTURES = os.path.join(os.path.dirname(__file__), 'data')
_RGBA_PNG = os.path.join(_FIXTURES, 'fixture_rgba.png')
_GRAY_JPG = os.path.join(_FIXTURES, 'fixture_gray_speed_crop.jpg')


def test_load_image_rgb_drops_alpha_and_expands_gray():
    import numpy as np
    from PIL import Image

    from ursonet_tpu.data.dataset import load_image_rgb

    out = load_image_rgb(_RGBA_PNG)
    assert out.shape == (48, 64, 3) and out.dtype == np.uint8
    raw = np.asarray(Image.open(_RGBA_PNG))
    assert raw.shape[-1] == 4  # the fixture really is RGBA
    np.testing.assert_array_equal(out, raw[..., :3])

    out = load_image_rgb(_GRAY_JPG)
    assert out.shape == (120, 192, 3) and out.dtype == np.uint8
    np.testing.assert_array_equal(out[..., 0], out[..., 1])
    np.testing.assert_array_equal(out[..., 0], out[..., 2])
    raw = np.asarray(Image.open(_GRAY_JPG))
    assert raw.ndim == 2  # the fixture really is single-plane
    np.testing.assert_array_equal(out[..., 0], raw)


def test_native_loader_real_format_fixtures():
    """native/host_loader.cpp must normalize RGBA and grayscale files to
    3-channel RGB exactly like the PIL path (libpng RGBA strip, libjpeg
    JCS_RGB gray expansion)."""
    import numpy as np
    import pytest

    from ursonet_tpu.data import native_loader
    from ursonet_tpu.data.dataset import load_image_rgb

    if not native_loader.available():
        pytest.skip("native loader not built")

    for path in (_RGBA_PNG, _GRAY_JPG):
        ref = load_image_rgb(path)
        got = native_loader.decode(path)
        assert got.shape == ref.shape, path
        np.testing.assert_array_equal(got, ref)

    # batch path (decode+resize+pad) on the grayscale file
    h, w = 64, 96
    out = native_loader.load_batch([_GRAY_JPG], h, w, h, w, 0, 0)
    assert out.shape == (1, h, w, 3)
    np.testing.assert_array_equal(out[0, ..., 0], out[0, ..., 1])


def test_speed_adapter_grayscale_jpeg(tmp_path):
    """The SPEED adapter must serve a real grayscale capture as
    [H, W, 3] uint8 through Dataset.load_image."""
    import json
    import shutil

    import numpy as np

    from ursonet_tpu.config import Config
    from ursonet_tpu.data.speed import Speed

    img_dir = tmp_path / 'images' / 'train'
    img_dir.mkdir(parents=True)
    shutil.copy(_GRAY_JPG, img_dir / 'img000000.jpg')
    ann = [{"filename": "img000000.jpg",
            "q_vbs2tango": [1.0, 0.0, 0.0, 0.0],
            "r_Vo2To_vbs_true": [0.1, -0.2, 12.5]}]
    (tmp_path / 'train_no_val.json').write_text(json.dumps(ann))

    config = Config()
    config.REGRESS_LOC = config.REGRESS_ORI = True
    config.update()
    ds = Speed()
    ds.load_dataset(str(tmp_path), config, 'train_no_val')
    assert ds.num_images == 1
    img = ds.load_image(0)
    assert img.shape == (120, 192, 3) and img.dtype == np.uint8
    np.testing.assert_array_equal(img[..., 0], img[..., 2])
    np.testing.assert_allclose(ds.load_location(0), [0.1, -0.2, 12.5],
                               rtol=1e-6)
