#!/usr/bin/env python3
"""CLI driver — command surface parity with the reference
pose_estimator.py (argparse flags at pose_estimator.py:768-807, command
dispatch at 934-973), plus TPU-native knobs (mesh shape, on-device
augmentation, output dir).

Commands:
  train      train on URSO-style or SPEED datasets
  test       spot-check N random test images (+ optional --video)
  evaluate   full test-set metrics + CSV artifacts
  submit     ESA challenge submission (SPEED only)

Weights argument: a snapshot path, 'last', 'none' (random init),
'imagenet' / 'coco' / released model names ('soyuz_hard', 'dragon_hard',
'speed') — these last resolve to local .h5 files under --models_dir
(downloads are not attempted; place the files there), or a run name whose
latest checkpoint is used.
"""

from __future__ import annotations

import argparse
import os
import sys

ROOT_DIR = os.path.abspath(os.path.dirname(__file__))
DEFAULT_LOGS_DIR = os.path.join(ROOT_DIR, "models", "logs")
DEFAULT_DATA_DIR = os.path.join(ROOT_DIR, "datasets")
DEFAULT_MODELS_DIR = os.path.join(ROOT_DIR, "models")

ORIENTATION_PARAM_OPTIONS = {'euler_angles', 'quaternion', 'angle_axis'}
RELEASED_MODELS = {'soyuz_hard', 'dragon_hard', 'speed'}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("command", metavar="<command>",
                   help="'train', 'test', 'evaluate', 'submit' or "
                        "'export'")
    p.add_argument('--backbone', default='resnet50',
                   help='resnet18/34/50/101')
    p.add_argument('--dataset', required=True, help='Dataset name')
    p.add_argument('--epochs', default=100, type=int)
    p.add_argument('--image_scale', default=1.0, type=float)
    p.add_argument('--ori_weight', default=1.0, type=float)
    p.add_argument('--loc_weight', default=1.0, type=float)
    p.add_argument('--bottleneck', default=32, type=int)
    p.add_argument('--branch_size', default=1024, type=int)
    p.add_argument('--learn_rate', default=0.001, type=float)
    p.add_argument('--batch_size', default=4, type=int,
                   help='images per chip')
    p.add_argument('--rot_aug', action='store_true')
    p.add_argument('--rot_image_aug', action='store_true')
    p.add_argument('--classify_ori', dest='regress_ori',
                   action='store_false')
    p.add_argument('--regress_ori', dest='regress_ori', action='store_true')
    p.set_defaults(regress_ori=False)
    p.add_argument('--classify_loc', dest='regress_loc',
                   action='store_false')
    p.add_argument('--regress_loc', dest='regress_loc', action='store_true')
    p.set_defaults(regress_loc=True)
    p.add_argument('--regress_keypoints', action='store_true',
                   help='experimental; overrides the two above')
    p.add_argument('--sim2real', action='store_true')
    p.add_argument('--sim2real_per_image_order', action='store_true',
                   help='exact per-image op order for the on-device '
                        'sim2real pipeline (imgaug random_order '
                        'semantics) at ~4x the pipeline cost')
    p.add_argument('--clr', action='store_true')
    p.add_argument('--f16', action='store_true',
                   help='bfloat16 compute on TPU')
    p.add_argument('--square_image', action='store_true')
    p.add_argument('--ori_param', default='quaternion',
                   help="'quaternion' 'euler_angles' 'angle_axis'")
    p.add_argument('--ori_resolution', default=16, type=int,
                   help='bins per Euler dim (classification)')
    p.add_argument('--weights', required=True)
    p.add_argument('--logs', default=DEFAULT_LOGS_DIR)
    p.add_argument('--image', help='single image to evaluate')
    p.add_argument('--video', help='video to annotate (test command)')
    # --- TPU-native extras -------------------------------------------------
    p.add_argument('--data_dir', default=DEFAULT_DATA_DIR)
    p.add_argument('--models_dir', default=DEFAULT_MODELS_DIR)
    p.add_argument('--mesh_data', default=0, type=int,
                   help='data-parallel mesh axis (0 = all chips)')
    p.add_argument('--mesh_model', default=1, type=int,
                   help='tensor-parallel mesh axis over the heads')
    p.add_argument('--steps_per_epoch', default=None, type=int)
    p.add_argument('--keep_checkpoints', default=0, type=int,
                   help='keep only the newest N per-epoch snapshots '
                        '(0 = keep all, reference behavior)')
    p.add_argument('--host_augment', action='store_true',
                   help='run augmentation per-image on host (parity mode) '
                        'instead of batched on device')
    p.add_argument('--out_dir', default='.',
                   help='where eval CSVs / overlays / submissions go')
    p.add_argument('--eval_batch', default=1, type=int,
                   help='inference batch size for test/evaluate/submit '
                        '(the reference runs batch 1; larger batches use '
                        'the TPU far better)')
    p.add_argument('--seed', default=0, type=int)
    p.add_argument('--multimodal', action='store_true',
                   help='fit a quaternion GMM to the orientation PMF per '
                        'image (EM; classification mode only): test '
                        'prints per-mode quats/priors, evaluate reports '
                        'the best-of-2-modes oracle error')
    p.add_argument('--int8', action='store_true',
                   help='serve inference through the calibrated int8 PTQ '
                        'path (test/evaluate/submit; ~1.7x on v5e)')
    p.add_argument('--calib_batches', default=1, type=int,
                   help='with --int8: number of BATCH_SIZE dataset '
                        'batches to calibrate activation scales on '
                        '(running max; more batches = less clipping)')
    p.add_argument('--calib_headroom', default=1.0, type=float,
                   help='with --int8: scale factor on calibrated '
                        'max-abs activation ranges (<1 clips outliers '
                        'for finer bulk quantization)')
    p.add_argument('--smooth_quant', nargs='?', const=0.5, default=None,
                   type=float, metavar='ALPHA',
                   help='with --int8: SmoothQuant-style per-channel '
                        'scale migration after calibration (zero '
                        'serving cost; models/quant.py smooth). '
                        'Optional ALPHA in [0,1] balances activation- '
                        'vs weight-range flattening (default 0.5). '
                        'ON by default (0.5) when a classification '
                        'head is served — the measured parity combo, '
                        'PERF.md — pass a negative ALPHA to disable')
    p.add_argument('--smooth_max_spread', default=None, type=float,
                   metavar='RATIO',
                   help='with --smooth_quant: cap each migration '
                        "group's channel spread (max/min of the "
                        'migration vector) by clipping around its '
                        'geometric mean — protects per-output-channel '
                        'weight quantization from extreme migrated '
                        'outliers (models/quant.py smooth)')
    p.add_argument('--bias_correct', nargs='?', const=1, default=None,
                   type=int, metavar='PASSES',
                   help='with --int8: subtract per-channel quantization '
                        'bias measured on the calibration batch from '
                        'the int8 path (DFQ-style; models/quant.py '
                        'bias_correct). PASSES>1 re-measures with the '
                        'previous correction applied (default 1). ON '
                        'by default (1 pass) when a classification '
                        'head is served; pass 0 to disable')
    p.add_argument('--int8_float_finals', action='store_true',
                   help='with --int8: run the classification final '
                        'denses in float (decode-critical logits, '
                        '~0.04%% of FLOPs; halves the classification '
                        'int8 accuracy delta)')
    p.add_argument('--set', dest='config_overrides', action='append',
                   default=[], metavar='KEY=VALUE',
                   help='generic Config override applied before '
                        'update(), value parsed as a Python literal '
                        "(fallback: string) — e.g. --set REMAT=True "
                        "--set TRAIN_ACT_Q8=True. Mirrors the "
                        'reference pattern of mutating Config '
                        'attributes from the CLI '
                        '(pose_estimator.py:815-872).')
    return p


def make_config(args):
    import jax

    from ursonet_tpu.config import Config
    from ursonet_tpu.data import speed as speed_mod
    from ursonet_tpu.data import urso as urso_mod

    if args.ori_param not in ORIENTATION_PARAM_OPTIONS:
        raise SystemExit(
            f"--ori_param must be one of {sorted(ORIENTATION_PARAM_OPTIONS)}"
            f", got '{args.ori_param}'")

    config = Config()
    config.ORIENTATION_PARAM = args.ori_param
    config.ORI_BINS_PER_DIM = args.ori_resolution
    config.NAME = args.dataset
    config.EPOCHS = args.epochs
    config.NR_DENSE_LAYERS = 1
    config.LEARNING_RATE = args.learn_rate
    config.BOTTLENECK_WIDTH = args.bottleneck
    config.BRANCH_SIZE = args.branch_size
    config.BACKBONE = args.backbone
    config.ROT_AUG = args.rot_aug
    config.F16 = args.f16
    config.SIM2REAL_AUG = args.sim2real
    config.SIM2REAL_PER_IMAGE_ORDER = args.sim2real_per_image_order
    config.CLR = args.clr
    config.ROT_IMAGE_AUG = args.rot_image_aug
    config.OPTIMIZER = "SGD"
    config.REGRESS_ORI = args.regress_ori
    config.REGRESS_LOC = args.regress_loc
    config.REGRESS_KEYPOINTS = args.regress_keypoints
    config.LOSS_WEIGHTS['loc_loss'] = args.loc_weight
    config.LOSS_WEIGHTS['ori_loss'] = args.ori_weight
    config.SEED = args.seed
    config.QUANT_FLOAT_CLS_FINAL = getattr(args, 'int8_float_finals', False)
    config.AUGMENT_ON_DEVICE = not args.host_augment
    config.IMAGE_RESIZE_MODE = 'square' if args.square_image else 'pad64'

    if args.dataset == "speed":
        w0, h0 = speed_mod.Camera.width, speed_mod.Camera.height
    else:
        w0, h0 = urso_mod.Camera.width, urso_mod.Camera.height
    config.IMAGE_MAX_DIM = round(w0 * args.image_scale)
    if config.IMAGE_MAX_DIM % 64 > 0:
        raise SystemExit(
            "Scale problem. Image maximum dimension must be dividable "
            "by 2 at least 6 times.")
    h = round(h0 * args.image_scale)
    config.IMAGE_MIN_DIM = h - h % 64 + 64 if h % 64 else h

    config.IMAGES_PER_GPU = args.batch_size if args.command == 'train' \
        else max(1, args.eval_batch)
    n_dev = len(jax.devices())
    config.MESH_MODEL = max(1, args.mesh_model)
    if args.mesh_data > 0:
        config.MESH_DATA = args.mesh_data
    else:
        config.MESH_DATA = max(1, n_dev // config.MESH_MODEL)
    if args.steps_per_epoch:
        config.STEPS_PER_EPOCH = args.steps_per_epoch
    if args.keep_checkpoints:
        config.CHECKPOINT_KEEP = args.keep_checkpoints
    for item in getattr(args, 'config_overrides', []) or []:
        key, sep, raw = item.partition('=')
        key = key.strip()
        if not sep or not key:
            raise SystemExit(f"--set expects KEY=VALUE, got '{item}'")
        if not hasattr(config, key):
            raise SystemExit(f"--set: Config has no attribute '{key}'")
        if key != key.upper() or callable(getattr(config, key)):
            raise SystemExit(
                f"--set: '{key}' is not a config knob (knobs are "
                f"UPPER_CASE attributes, not methods)")
        import ast
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        setattr(config, key, value)
    config.update()
    return config


def resolve_and_load_weights(engine, args):
    """Weight-source resolution (reference pose_estimator.py:884-913)."""
    from ursonet_tpu.checkpoint.h5_import import check_released_config

    w = args.weights.lower()
    if w == 'none':
        engine.initialize()
        return
    if w == 'last':
        path = engine.find_last()
        engine.load_weights(path, verbose=True)
        return
    if w == 'coco':
        path = os.path.join(args.models_dir, 'mask_rcnn_coco.h5')
        if not os.path.exists(path):
            raise SystemExit(
                f"COCO weights not found at {path}; download "
                "mask_rcnn_coco.h5 there (no network access here).")
        engine.load_weights(path, exclude=[
            "mrcnn_class_logits", "mrcnn_bbox_fc", "mrcnn_bbox",
            "mrcnn_mask"], verbose=True)
        return
    if w == 'imagenet':
        from ursonet_tpu.checkpoint.h5_import import find_released_file
        path = find_released_file(args.models_dir,
                                  f'imagenet_{engine.config.BACKBONE}')
        if path is None:
            raise SystemExit(
                f"ImageNet weights not found under {args.models_dir}; "
                f"place the Keras {engine.config.BACKBONE} notop weights "
                "there (tools/verify_artifacts.py lists the filenames).")
        engine.load_weights(path, verbose=True)
        return
    if w in RELEASED_MODELS:
        from ursonet_tpu.checkpoint.h5_import import find_released_file
        err = check_released_config(w, engine.config)
        if err:
            raise SystemExit(err)
        key = w if w != 'speed' else \
            f'speed_{engine.config.BOTTLENECK_WIDTH}_' \
            f'{engine.config.ORI_BINS_PER_DIM}'
        path = find_released_file(args.models_dir, key)
        if path is None:
            raise SystemExit(
                f"Released weights for '{w}' not found under "
                f"{args.models_dir} (tools/verify_artifacts.py lists the "
                "expected filenames).")
        engine.load_weights(path, verbose=True)
        return
    if os.path.exists(args.weights):
        engine.load_weights(args.weights, verbose=True)
        return
    # a run/model name: use its latest checkpoint
    path = engine.get_last_checkpoint(args.weights)
    engine.load_weights(path, verbose=True)


def load_datasets(args, config, subsets):
    from ursonet_tpu.data.speed import Speed
    from ursonet_tpu.data.urso import Urso

    dataset_dir = os.path.join(args.data_dir, args.dataset)
    out = []
    for subset in subsets:
        ds = Speed() if args.dataset == 'speed' else Urso()
        ds.load_dataset(dataset_dir, config, subset)
        out.append(ds)
    return out


def calibrate_int8(engine, args, dataset, config):
    """Eager, deterministic int8 calibration for the CLI inference
    commands: activation scales come from the first
    --calib_batches × BATCH_SIZE images of the given dataset (a fixed
    sample), not from whatever batch reaches the serving path first.
    Extra batches can only widen scales (running max across calls,
    models/quant.py calibrate), tightening worst-case clipping on
    activations the first batch under-represents."""
    if not args.int8 or args.command in ('train', 'export'):
        return
    n_batches = max(1, getattr(args, 'calib_batches', 1) or 1)
    all_ids = list(dataset.image_ids)
    if not all_ids:
        raise SystemExit("--int8: no images available to calibrate on")
    used = []
    for b in range(n_batches):
        ids = all_ids[b * config.BATCH_SIZE:(b + 1) * config.BATCH_SIZE]
        if not ids:
            break
        ids += [ids[-1]] * (config.BATCH_SIZE - len(ids))
        images = [dataset.load_image(i) for i in ids]
        hr = getattr(args, 'calib_headroom', 1.0) or 1.0
        if b == 0:
            engine.quantize(images, headroom=hr)
        else:
            molded, _, _ = engine.mold_inputs(images)
            engine._qmodel.calibrate(engine._host_s2d_maybe(molded),
                                     percentile_headroom=hr)
        used += ids
    print(f"int8: calibrated on {len(set(used))} fixed images "
          f"({n_batches} batch(es), ids {used[0]}..{max(set(used))})")
    def molded_fn():
        ids = all_ids[:config.BATCH_SIZE]
        ids += [ids[-1]] * (config.BATCH_SIZE - len(ids))
        molded, _, _ = engine.mold_inputs(
            [dataset.load_image(i) for i in ids])
        return engine._host_s2d_maybe(molded)

    apply_ptq_refinements(engine, args, config, molded_fn)


def apply_ptq_refinements(engine, args, config, molded_fn):
    """SmoothQuant migration + bias correction on the calibrated model.

    Production default for classification-head serving: the measured
    float-parity combo is smooth_quant 0.5 + bias_correct 1 (PERF.md
    round-4 ablation: +0.13%% ESA vs +2.4%% plain PTQ). Regression heads
    keep plain PTQ as default (+0.45%% measured there; the techniques are
    ~neutral). Explicit flags always win: a negative ALPHA disables the
    migration, PASSES=0 disables the correction."""
    classification = not (config.REGRESS_ORI and config.REGRESS_LOC)
    alpha = getattr(args, 'smooth_quant', None)
    passes = getattr(args, 'bias_correct', None)
    if classification:
        alpha = 0.5 if alpha is None else alpha
        passes = 1 if passes is None else passes
    if alpha is not None and alpha >= 0:
        cap = getattr(args, 'smooth_max_spread', None)
        report = engine._qmodel.smooth(alpha, max_spread=cap)
        worst = max(report.values()) if report else 1.0
        print(f"int8: SmoothQuant migration applied (alpha={alpha}, "
              f"cap={cap}, {len(report)} groups, worst channel spread "
              f"{worst:.1f}x)")
    passes = passes or 0
    if passes:
        engine._qmodel.bias_correct(molded_fn(), passes=passes)
        print(f"int8: bias correction applied ({passes} pass(es))")


def main(argv=None):
    args = build_parser().parse_args(argv)
    print("Command: ", args.command)
    print("Dataset: ", args.dataset)
    print("Logs: ", args.logs)

    config = make_config(args)
    config.display()

    from ursonet_tpu.engine import UrsoNet

    mode = 'training' if args.command == 'train' else 'inference'
    engine = UrsoNet(mode=mode, config=config, model_dir=args.logs)
    resolve_and_load_weights(engine, args)
    if args.int8 and args.command == 'train':
        raise SystemExit("--int8 is an inference-serving flag; "
                         "training runs bf16/f32")
    if args.multimodal and config.REGRESS_ORI:
        raise SystemExit("--multimodal requires orientation "
                         "soft-classification (drop --regress_ori)")
    # (int8 calibration happens eagerly per-command below, on a fixed
    # dataset sample — lazy first-batch calibration would make results
    # depend on chunk order; export builds its own calibrated model.)

    if args.command == 'export':
        # Serving/interop artifacts: Keras-h5 weights (round-trips with
        # the import bridge) and, with --int8, a calibrated quantized
        # serving artifact (checkpoint/quant_store.py).
        from ursonet_tpu.checkpoint.h5_import import save_keras_h5
        if engine.state is None:
            engine.initialize()
        os.makedirs(args.out_dir, exist_ok=True)
        h5_path = os.path.join(args.out_dir, f'{config.NAME}_weights.h5')
        save_keras_h5(h5_path, engine.state.params,
                      engine.state.batch_stats)
        print(f"Keras-h5 weights written to {h5_path}")
        if args.int8:
            from ursonet_tpu.checkpoint.quant_store import save_quantized
            subset = 'val' if args.dataset == 'speed' else 'test'
            (dataset,) = load_datasets(args, config, (subset,))
            ids = list(dataset.image_ids[:config.BATCH_SIZE])
            if not ids:
                raise SystemExit(
                    f"export --int8: no images in the '{subset}' subset "
                    "to calibrate on")
            ids += [ids[-1]] * (config.BATCH_SIZE - len(ids))
            images = [dataset.load_image(i) for i in ids]
            qmodel = engine.quantize(images)  # rebuild + calibrate
            molded, _, _ = engine.mold_inputs(images)
            apply_ptq_refinements(
                engine, args, config,
                lambda: engine._host_s2d_maybe(molded))
            q_path = os.path.join(args.out_dir, f'{config.NAME}_int8.msgpack')
            save_quantized(q_path, qmodel)
            print(f"int8 serving artifact written to {q_path}")
        return 0

    if args.command == 'train':
        if args.dataset == 'speed':
            train_ds, val_ds = load_datasets(args, config,
                                             ('train_no_val', 'val'))
        else:
            train_ds, val_ds = load_datasets(args, config, ('train', 'val'))
        n = len(train_ds.image_ids)
        if args.steps_per_epoch is None:
            # reference clamp (pose_estimator.py:750); an explicit
            # --steps_per_epoch overrides it so long runs on small sets
            # need not checkpoint every few seconds
            config.STEPS_PER_EPOCH = min(config.STEPS_PER_EPOCH,
                                         max(1, n // config.BATCH_SIZE))
        engine.train(train_ds, val_ds, config.LEARNING_RATE,
                     epochs=config.EPOCHS, layers='all')
    elif args.command == 'test':
        subset = 'val' if args.dataset == 'speed' else 'test'
        (dataset,) = load_datasets(args, config, (subset,))
        calibrate_int8(engine, args, dataset, config)
        if args.image:
            import numpy as np

            from ursonet_tpu.data.dataset import load_image_rgb
            from ursonet_tpu.evaluate import decode_results
            from ursonet_tpu.ops import viz
            image = load_image_rgb(args.image)
            outputs = engine.detect([image] * config.BATCH_SIZE)
            raw = {k: np.stack([outputs[0][k]])
                   for k in outputs[0]}
            locs, qs = decode_results(raw, config, dataset)
            print(f"loc: {locs[0]}  quaternion (scalar-last): {qs[0]}")
            os.makedirs(args.out_dir, exist_ok=True)
            out_png = os.path.join(args.out_dir, 'single_image_pose.png')
            viz.save_axes_overlay(
                image, dataset.camera.K, locs[0], qs[0], path=out_png,
                frame='unreal' if args.dataset != 'speed' else 'camera')
            print(f"overlay saved to {out_png}")
        elif args.video:
            from ursonet_tpu.video import detect_video
            detect_video(engine, dataset, args.video,
                         out_path=os.path.join(
                             args.out_dir, os.path.basename(
                                 args.video) + '_annotated.mp4'))
        else:
            from ursonet_tpu.evaluate import detect_dataset
            detect_dataset(engine, dataset, 10,
                           out_dir=os.path.join(args.out_dir, 'overlays'),
                           multimodal=args.multimodal)
    elif args.command == 'evaluate':
        subset = 'val' if args.dataset == 'speed' else 'test'
        (dataset,) = load_datasets(args, config, (subset,))
        calibrate_int8(engine, args, dataset, config)
        from ursonet_tpu.evaluate import evaluate
        evaluate(engine, dataset, out_dir=args.out_dir,
                 multimodal=args.multimodal)
    elif args.command == 'submit':
        if args.dataset != 'speed':
            raise SystemExit("submit requires --dataset speed")
        real_ds, virtual_ds = load_datasets(args, config,
                                            ('real_test', 'test'))
        calibrate_int8(engine, args, virtual_ds, config)
        from ursonet_tpu.submission import test_and_submit
        test_and_submit(engine, virtual_ds, real_ds, out_dir=args.out_dir)
    else:
        print("wrong command")
        return 2
    return 0


if __name__ == '__main__':
    sys.exit(main())
