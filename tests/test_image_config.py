"""Tests for resize/pad window math (utils.py:398-511 parity) and config
derived fields (config.py:151-166 parity)."""

import numpy as np

from ursonet_tpu.config import Config
from ursonet_tpu.ops import image as imops


def test_resize_none():
    img = np.random.randint(0, 255, (100, 150, 3), dtype=np.uint8)
    out, window, scale, padding, crop = imops.resize_image(img, mode="none")
    assert out.shape == (100, 150, 3)
    assert window == (0, 0, 100, 150) and scale == 1 and crop is None


def test_resize_square():
    img = np.random.randint(0, 255, (96, 128, 3), dtype=np.uint8)
    out, window, scale, padding, crop = imops.resize_image(
        img, min_dim=128, max_dim=256, mode="square")
    assert out.shape == (256, 256, 3)
    # scale = 128/96 = 4/3 -> (128, ~171); window centered
    h_new, w_new = round(96 * scale), round(128 * scale)
    y1, x1, y2, x2 = window
    assert (y2 - y1, x2 - x1) == (h_new, w_new)
    assert y1 == (256 - h_new) // 2 and x1 == (256 - w_new) // 2
    # Padding is zeros outside the window
    assert out[:y1].sum() == 0 and out[y2:].sum() == 0


def test_resize_square_max_dim_clamp():
    # Long side would exceed max_dim -> scale set by max_dim
    img = np.zeros((100, 400, 3), dtype=np.uint8)
    out, window, scale, _, _ = imops.resize_image(
        img, min_dim=200, max_dim=256, mode="square")
    assert out.shape == (256, 256, 3)
    assert abs(scale - 256 / 400) < 1e-9


def test_resize_pad64():
    img = np.random.randint(0, 255, (960, 1280, 3), dtype=np.uint8)
    out, window, scale, padding, _ = imops.resize_image(
        img, min_dim=448, max_dim=640, mode="pad64")
    # scale = 448/960 -> (448, ~597); width pads to 640
    assert out.shape[0] % 64 == 0 and out.shape[1] % 64 == 0
    assert out.shape == (448, 640, 3)
    y1, x1, y2, x2 = window
    assert y2 - y1 == 448 and (x2 - x1) == round(1280 * scale)


def test_resize_pad64_already_multiple():
    img = np.random.randint(0, 255, (128, 192, 3), dtype=np.uint8)
    out, window, scale, padding, _ = imops.resize_image(
        img, min_dim=128, mode="pad64")
    assert out.shape == (128, 192, 3)
    assert window == (0, 0, 128, 192)


def test_resize_crop():
    import random
    img = np.arange(200 * 300 * 3, dtype=np.float32).reshape(200, 300, 3)
    out, window, scale, _, crop = imops.resize_image(
        img, min_dim=100, mode="crop", rng=random.Random(0))
    assert out.shape == (100, 100, 3)
    y, x, ch, cw = crop
    assert window == (0, 0, 100, 100)


def test_mold_unmold_roundtrip():
    cfg = Config()
    img = np.random.randint(0, 255, (8, 8, 3)).astype(np.float32)
    molded = imops.mold_image(img, cfg)
    np.testing.assert_allclose(molded + cfg.MEAN_PIXEL, img, atol=1e-4)
    back = imops.unmold_image(molded, cfg)
    # uint8 cast truncates after float round-trip through the non-integer
    # mean (reference net.py:1355 behaves identically) → off-by-one ok.
    assert np.max(np.abs(back.astype(np.int32) - img.astype(np.int32))) <= 1


def test_mold_grayscale():
    cfg = Config()
    img = np.random.randint(0, 255, (8, 8, 1)).astype(np.float32)
    molded = imops.mold_image(img, cfg)
    np.testing.assert_allclose(molded, img - cfg.MEAN_PIXEL.mean(), atol=1e-4)


def test_compose_parse_meta():
    meta = imops.compose_image_meta(7, (960, 1280, 3), (448, 640, 3),
                                    (0, 21, 448, 619), 0.4667)
    assert meta.shape == (12,)
    parsed = imops.parse_image_meta(meta)
    assert parsed["image_id"][0] == 7
    np.testing.assert_allclose(parsed["window"][0], [0, 21, 448, 619])


def test_config_update_derived():
    cfg = Config()
    cfg.IMAGES_PER_GPU = 4
    cfg.GPU_COUNT = 2
    cfg.IMAGE_RESIZE_MODE = "pad64"
    cfg.IMAGE_MIN_DIM = 448
    cfg.IMAGE_MAX_DIM = 640
    cfg.update()
    assert cfg.BATCH_SIZE == 8
    np.testing.assert_array_equal(cfg.IMAGE_SHAPE, [448, 640, 3])
    assert cfg.IMAGE_META_SIZE == 12


def test_config_square_and_crop_shapes():
    cfg = Config()
    cfg.IMAGE_RESIZE_MODE = "square"
    cfg.IMAGE_MAX_DIM = 512
    cfg.update()
    np.testing.assert_array_equal(cfg.IMAGE_SHAPE, [512, 512, 3])
    cfg.IMAGE_RESIZE_MODE = "crop"
    cfg.IMAGE_MIN_DIM = 256
    cfg.update()
    np.testing.assert_array_equal(cfg.IMAGE_SHAPE, [256, 256, 3])


def test_config_mesh_sets_gpu_count():
    cfg = Config()
    cfg.MESH_DATA = 4
    cfg.MESH_MODEL = 2
    cfg.IMAGES_PER_GPU = 2
    cfg.update()
    assert cfg.GPU_COUNT == 8
    assert cfg.BATCH_SIZE == 8  # images_per_chip × data shards


def test_config_json_roundtrip(tmp_path):
    cfg = Config()
    cfg.BACKBONE = "resnet18"
    cfg.ORI_BINS_PER_DIM = 24
    path = str(tmp_path / "cfg.json")
    cfg.write_to_file(path)
    import json
    with open(path) as f:
        d = json.load(f)
    assert d["BACKBONE"] == "resnet18"
    assert d["ORI_BINS_PER_DIM"] == 24


def test_head_feature_count():
    # reference net.py:640: features = B*H*W/64², e.g. soyuz scale 0.5:
    # 128 * 480 * 640 / 4096 = 9600
    cfg = Config()
    cfg.BACKBONE = "resnet50"
    cfg.BOTTLENECK_WIDTH = 128
    cfg.IMAGE_RESIZE_MODE = "pad64"
    cfg.IMAGE_MIN_DIM = 480
    cfg.IMAGE_MAX_DIM = 640
    cfg.update()
    assert cfg.head_input_features() == 9600


def test_presets_build_models():
    """Every preset yields a config that passes the %64 contract and
    builds a model; released presets satisfy the h5-import asserts."""
    from ursonet_tpu import presets
    from ursonet_tpu.checkpoint.h5_import import check_released_config
    from ursonet_tpu.models.ursonet import build_model

    for n in range(1, 6):
        cfg = presets.benchmark_config(n)
        assert cfg.IMAGE_SHAPE[0] % 64 == 0 and cfg.IMAGE_SHAPE[1] % 64 == 0
        build_model(cfg)

    for name in ('soyuz_hard', 'dragon_hard', 'speed'):
        cfg = presets.released_config(name)
        assert check_released_config(name, cfg) is None
        build_model(cfg)
