"""End-to-end CLI tests: train -> evaluate -> test -> submit on synthetic
micro-datasets, plus the dataset splitters (SURVEY.md §2 #22-23, #26,
#28-29)."""

import glob
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # see pytest.ini: core profile is -m "not slow"

import pose_estimator
import split_dataset as splitter
from ursonet_tpu.data.synthetic import make_speed_dataset, make_urso_dataset


@pytest.fixture(scope='module')
def urso_env(tmp_path_factory):
    root = tmp_path_factory.mktemp('cli')
    data_dir = root / 'datasets'
    ds_dir = data_dir / 'soyuz_tiny'
    make_urso_dataset(str(ds_dir), subsets=('train', 'val', 'test'),
                      n_per_subset=6, width=128, height=96)
    return {'root': str(root), 'data_dir': str(data_dir),
            'logs': str(root / 'logs'), 'out': str(root / 'out')}


COMMON = ['--backbone', 'resnet18', '--bottleneck', '8',
          '--branch_size', '16', '--image_scale', '0.1',
          '--regress_ori']


def _args(env, command, *extra):
    return ([command, '--dataset', 'soyuz_tiny',
             '--data_dir', env['data_dir'], '--logs', env['logs'],
             '--out_dir', env['out']] + COMMON + list(extra))


def test_cli_train_then_evaluate_then_test(urso_env, capsys):
    rc = pose_estimator.main(_args(
        urso_env, 'train', '--weights', 'none', '--epochs', '1',
        '--batch_size', '2', '--steps_per_epoch', '2'))
    assert rc == 0
    runs = glob.glob(os.path.join(urso_env['logs'], 'soyuz_tiny*'))
    assert runs, "run dir created"
    assert glob.glob(os.path.join(runs[0], 'weights_*.msgpack'))

    rc = pose_estimator.main(_args(urso_env, 'evaluate',
                                   '--weights', 'last'))
    assert rc == 0
    out = capsys.readouterr().out
    assert 'ESA score' in out
    for csv_name in ('ori_err.csv', 'loc_err.csv', 'dists_err.csv'):
        assert os.path.exists(os.path.join(urso_env['out'], csv_name))

    rc = pose_estimator.main(_args(urso_env, 'test', '--weights', 'last'))
    assert rc == 0
    overlays = glob.glob(os.path.join(urso_env['out'], 'overlays', '*.png'))
    assert overlays, "axes overlays saved"

    # int8 serving path through the CLI (lazy-calibrated PTQ)
    rc = pose_estimator.main(_args(urso_env, 'evaluate',
                                   '--weights', 'last', '--int8'))
    assert rc == 0
    assert 'ESA score' in capsys.readouterr().out

    # the PTQ accuracy techniques ride the same path (round 4)
    rc = pose_estimator.main(_args(
        urso_env, 'evaluate', '--weights', 'last', '--int8',
        '--smooth_quant', '0.5', '--bias_correct', '1'))
    assert rc == 0
    out = capsys.readouterr().out
    assert 'SmoothQuant migration applied' in out
    assert 'bias correction applied' in out
    assert 'ESA score' in out

    # export: Keras-h5 + calibrated int8 serving artifact
    rc = pose_estimator.main(_args(urso_env, 'export',
                                   '--weights', 'last', '--int8'))
    assert rc == 0
    h5 = os.path.join(urso_env['out'], 'soyuz_tiny_weights.h5')
    q = os.path.join(urso_env['out'], 'soyuz_tiny_int8.msgpack')
    assert os.path.exists(h5) and os.path.exists(q)
    from ursonet_tpu.checkpoint.quant_store import load_quantized
    ns = pose_estimator.build_parser().parse_args(
        _args(urso_env, 'export', '--weights', 'last'))
    qm = load_quantized(q, pose_estimator.make_config(ns))
    out = qm(np.zeros((2, 96, 128, 3), np.float32))
    assert set(out) == {'loc', 'ori'}


def test_cli_int8_classification_default_combo(urso_env, capsys):
    """Classification-head serving defaults to the measured parity combo
    (smooth_quant 0.5 + bias_correct 1, PERF.md round 4); explicit
    negative/zero flags disable it; regression serving stays plain."""
    cls = ['--backbone', 'resnet18', '--bottleneck', '8',
           '--branch_size', '16', '--image_scale', '0.1',
           '--classify_ori', '--ori_resolution', '4']

    def args(command, *extra):
        return ([command, '--dataset', 'soyuz_tiny',
                 '--data_dir', urso_env['data_dir'],
                 '--logs', urso_env['logs'],
                 '--out_dir', urso_env['out']] + cls + list(extra))

    rc = pose_estimator.main(args(
        'train', '--weights', 'none', '--epochs', '1',
        '--batch_size', '2', '--steps_per_epoch', '2'))
    assert rc == 0
    capsys.readouterr()

    # default --int8 on a classification head: combo applied
    rc = pose_estimator.main(args('evaluate', '--weights', 'last',
                                  '--int8'))
    assert rc == 0
    out = capsys.readouterr().out
    assert 'SmoothQuant migration applied (alpha=0.5' in out
    assert 'bias correction applied (1 pass(es))' in out

    # explicit opt-out
    rc = pose_estimator.main(args('evaluate', '--weights', 'last',
                                  '--int8', '--smooth_quant', '-1',
                                  '--bias_correct', '0'))
    assert rc == 0
    out = capsys.readouterr().out
    assert 'SmoothQuant migration applied' not in out
    assert 'bias correction applied' not in out


def test_cli_submit_speed(tmp_path, capsys):
    data_dir = tmp_path / 'datasets'
    make_speed_dataset(str(data_dir / 'speed'),
                       subsets=('train_no_val', 'val', 'test', 'real_test'),
                       n_per_subset=3, width=192, height=120)
    rc = pose_estimator.main(
        ['submit', '--dataset', 'speed', '--data_dir', str(data_dir),
         '--logs', str(tmp_path / 'logs'), '--out_dir', str(tmp_path),
         '--weights', 'none', '--image_scale', '0.1'] + COMMON[:6])
    assert rc == 0
    subs = glob.glob(str(tmp_path / 'submission_*.csv'))
    assert len(subs) == 1
    with open(subs[0]) as f:
        rows = [l.strip().split(',') for l in f if l.strip()]
    assert len(rows) == 6  # test + real_test
    # filename + scalar-first quaternion (4) + location (3)
    assert len(rows[0]) == 8
    q = np.asarray([float(v) for v in rows[0][1:5]])
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, rtol=1e-4)
    # sorted: synthetic set first, each sorted by filename
    names = [r[0] for r in rows]
    assert names[:3] == sorted(names[:3])
    assert names[3:] == sorted(names[3:])


def test_split_urso(tmp_path):
    import pandas as pd
    from PIL import Image
    d = tmp_path / 'urso'
    d.mkdir()
    n = 20
    rows = []
    for i in range(n):
        Image.fromarray(
            np.zeros((8, 8, 3), np.uint8)).save(d / f"{i}_rgb.png")
        rows.append([i, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
    pd.DataFrame(rows, columns=['i', 'x', 'y', 'z',
                                'q1', 'q2', 'q3', 'q4']) \
        .to_csv(d / 'gt.csv', index=False)
    counts = splitter.split_urso(str(d), 10, 10, seed=0)
    assert counts == {'test': 2, 'val': 2, 'train': 16}
    for subset in ('train', 'val', 'test'):
        with open(d / f'{subset}_images.csv') as f:
            images = [l.strip() for l in f if l.strip()]
        poses = pd.read_csv(d / f'{subset}_poses_gt.csv')
        assert len(images) == len(poses) == counts[subset]
        # image names track the shuffled pose rows
        assert images[0] == f"{int(poses.iloc[0]['i'])}_rgb.png"
    all_images = set()
    for subset in ('train', 'val', 'test'):
        with open(d / f'{subset}_images.csv') as f:
            all_images |= {l.strip() for l in f if l.strip()}
    assert len(all_images) == n


def test_split_and_merge_speed(tmp_path):
    import json
    d = tmp_path / 'speed'
    d.mkdir()
    anns = [{'filename': f'img{i:03d}.jpg',
             'q_vbs2tango': [1, 0, 0, 0],
             'r_Vo2To_vbs_true': [0, 0, 10]} for i in range(10)]
    with open(d / 'train.json', 'w') as f:
        json.dump(anns, f)
    counts = splitter.split_speed(str(d), 0.2, seed=0)
    assert counts['val'] == 2 and counts['train_no_val'] == 8
    total = splitter.merge_speed(str(d / 'train_no_val.json'),
                                 str(d / 'val.json'),
                                 str(d / 'merged.json'))
    assert total == 10
    with open(d / 'merged.json') as f:
        assert len(json.load(f)) == 10


def test_cli_train_keypoints_and_angleaxis(urso_env):
    """Keypoint mode (experimental head + SVD decode) and angle-axis
    regression both train and evaluate through the CLI."""
    rc = pose_estimator.main(_args(
        urso_env, 'train', '--weights', 'none', '--epochs', '1',
        '--batch_size', '2', '--steps_per_epoch', '2',
        '--regress_keypoints'))
    assert rc == 0
    rc = pose_estimator.main(_args(
        urso_env, 'evaluate', '--weights', 'last', '--regress_keypoints'))
    assert rc == 0

    rc = pose_estimator.main(_args(
        urso_env, 'train', '--weights', 'none', '--epochs', '1',
        '--batch_size', '2', '--steps_per_epoch', '2',
        '--ori_param', 'angle_axis'))
    assert rc == 0
    rc = pose_estimator.main(_args(
        urso_env, 'evaluate', '--weights', 'last',
        '--ori_param', 'angle_axis'))
    assert rc == 0


def test_cli_classification_mode_train_eval(urso_env):
    """Soft-classification modes end to end. First: orientation
    classification + location regression with rot_aug (exercises the
    on-device PMF re-encode after the warp); then full classification
    (both heads; rotation aug requires REGRESS_LOC — reference
    net.py:410-411 — so no rot_aug there)."""
    rc = pose_estimator.main(_args(
        urso_env, 'train', '--weights', 'none', '--epochs', '1',
        '--batch_size', '2', '--steps_per_epoch', '2',
        '--classify_ori', '--ori_resolution', '8', '--rot_aug'))
    assert rc == 0
    rc = pose_estimator.main(_args(
        urso_env, 'evaluate', '--weights', 'last',
        '--classify_ori', '--ori_resolution', '8'))
    assert rc == 0

    rc = pose_estimator.main(_args(
        urso_env, 'train', '--weights', 'none', '--epochs', '1',
        '--batch_size', '2', '--steps_per_epoch', '2',
        '--classify_ori', '--classify_loc', '--ori_resolution', '8'))
    assert rc == 0
    rc = pose_estimator.main(_args(
        urso_env, 'evaluate', '--weights', 'last',
        '--classify_ori', '--classify_loc', '--ori_resolution', '8'))
    assert rc == 0


def test_cli_train_speed_dataset(tmp_path):
    """SPEED end-to-end training: grayscale JPEG decode (native loader's
    libjpeg path incl. gray->RGB expansion), scalar-first quaternion
    conversion, train_no_val/val subsets."""
    data_dir = tmp_path / 'datasets'
    make_speed_dataset(str(data_dir / 'speed'),
                       subsets=('train_no_val', 'val'),
                       n_per_subset=4, width=192, height=120)
    rc = pose_estimator.main(
        ['train', '--dataset', 'speed', '--data_dir', str(data_dir),
         '--logs', str(tmp_path / 'logs'), '--out_dir', str(tmp_path),
         '--weights', 'none', '--image_scale', '0.1', '--epochs', '1',
         '--batch_size', '2', '--steps_per_epoch', '2'] + COMMON[:6] +
        ['--regress_ori'])
    assert rc == 0
    assert glob.glob(str(tmp_path / 'logs' / 'speed*' / 'weights_*'))


def test_video_inference(urso_env, tmp_path):
    """detect_video annotates a clip end to end (imageio read/write,
    batched forward, decode, axes overlay)."""
    import cv2

    from ursonet_tpu.config import Config
    from ursonet_tpu.data.urso import Urso
    from ursonet_tpu.engine import UrsoNet
    from ursonet_tpu.video import detect_video

    cfg = Config()
    cfg.NAME = 'vid'
    cfg.BACKBONE = 'resnet18'
    cfg.BOTTLENECK_WIDTH = 8
    cfg.BRANCH_SIZE = 16
    cfg.IMAGE_RESIZE_MODE = 'square'
    cfg.IMAGE_MAX_DIM = cfg.IMAGE_MIN_DIM = 64
    cfg.IMAGES_PER_GPU = 2
    cfg.REGRESS_ORI = True
    cfg.ROT_AUG = False
    cfg.update()

    ds = Urso()
    ds.load_dataset(os.path.join(urso_env['data_dir'], 'soyuz_tiny'),
                    cfg, 'test')
    clip = str(tmp_path / 'clip.mp4')
    img0 = ds.load_image(ds.image_ids[0])
    w = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*'mp4v'), 5,
                        (img0.shape[1], img0.shape[0]))
    for i in range(5):
        frame = ds.load_image(ds.image_ids[i % len(ds.image_ids)])
        w.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    w.release()

    engine = UrsoNet('inference', cfg, str(tmp_path / 'logs'))
    engine.initialize()
    out = detect_video(engine, ds, clip,
                       out_path=str(tmp_path / 'annotated.mp4'),
                       log_fn=lambda *a: None)
    assert os.path.exists(out)
    cap = cv2.VideoCapture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 5


def test_cli_multimodal_flag(urso_env, capsys):
    """--multimodal wires the GMM EM fit (ops/gmm.py) into evaluate
    (best-of-2-modes oracle metric) and test (per-mode printout);
    rejected in regression mode."""
    rc = pose_estimator.main(_args(
        urso_env, 'train', '--weights', 'none', '--epochs', '1',
        '--batch_size', '2', '--steps_per_epoch', '2',
        '--classify_ori', '--ori_resolution', '8'))
    assert rc == 0
    rc = pose_estimator.main(_args(
        urso_env, 'evaluate', '--weights', 'last',
        '--classify_ori', '--ori_resolution', '8', '--multimodal'))
    assert rc == 0
    out = capsys.readouterr().out
    assert 'Multimodal best-of-2-modes orientation error' in out
    rc = pose_estimator.main(_args(
        urso_env, 'test', '--weights', 'last',
        '--classify_ori', '--ori_resolution', '8', '--multimodal'))
    assert rc == 0
    out = capsys.readouterr().out
    assert 'mode 0: prior=' in out

    import pytest
    with pytest.raises(SystemExit):  # regression mode has no PMF to fit
        pose_estimator.main(_args(
            urso_env, 'evaluate', '--weights', 'last', '--multimodal'))


def test_cli_set_overrides():
    """--set KEY=VALUE mutates Config attributes before update()
    (generic override; mirrors reference CLI attribute mutation)."""
    import pytest

    ns = pose_estimator.build_parser().parse_args(
        ['train', '--dataset', 'soyuz', '--weights', 'none',
         '--image_scale', '0.1',
         '--set', 'TRAIN_ACT_Q8=True', '--set', 'REMAT=narrow'])
    cfg = pose_estimator.make_config(ns)
    assert cfg.TRAIN_ACT_Q8 is True
    assert cfg.REMAT == 'narrow'

    ns = pose_estimator.build_parser().parse_args(
        ['train', '--dataset', 'soyuz', '--weights', 'none',
         '--image_scale', '0.1', '--set', 'NO_SUCH_KNOB=1'])
    with pytest.raises(SystemExit):
        pose_estimator.make_config(ns)
