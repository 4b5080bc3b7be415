"""Configuration system.

Keeps the reference's knob names and derived-field semantics
(reference: config.py:13-197) while adding TPU-native knobs (mesh shape,
precision policy). Flat attribute-style config: the CLI mutates attributes
after construction and then calls `update()` to recompute derived fields,
exactly like the reference driver (pose_estimator.py:815-872).
"""

from __future__ import annotations

import json
import os

import numpy as np


class Config:
    """Base configuration. Subclass and override attributes to customise.

    Derived fields (BATCH_SIZE, IMAGE_SHAPE, IMAGE_META_SIZE) are computed
    by `update()` (reference config.py:151-166).
    """

    NAME = "ursonet"

    # --- device / parallelism (TPU-native replacement of GPU_COUNT) -------
    # Number of accelerator chips used for data parallelism. The reference's
    # GPU_COUNT participates only in effective batch size (config.py:20,154);
    # here it also sizes the `data` axis of the device mesh.
    GPU_COUNT = 1          # kept name for CLI/compat; == number of chips
    IMAGES_PER_GPU = 2     # per-chip batch size

    # Device mesh: (data, model). `model` > 1 shards the (potentially huge)
    # head Dense layers across chips (tensor parallelism). Total devices
    # used = MESH_DATA * MESH_MODEL; GPU_COUNT is kept in sync by update().
    MESH_DATA = 1
    MESH_MODEL = 1

    # --- training schedule --------------------------------------------------
    STEPS_PER_EPOCH = 1000
    VALIDATION_STEPS = 50
    EPOCHS = 100

    # --- model ---------------------------------------------------------------
    BACKBONE = "resnet101"          # resnet18/34/50/101
    BOTTLENECK_WIDTH = 128          # filters of the final stride-2 conv (net.py:639)
    BRANCH_SIZE = 1024              # width of head dense layers
    NR_DENSE_LAYERS = 1             # dense layers per head (pose_estimator.py:820)

    # --- input resizing (reference config.py:49-76) --------------------------
    IMAGE_RESIZE_MODE = "pad64"     # none | square | pad64 | crop
    IMAGE_MIN_DIM = 480
    IMAGE_MAX_DIM = 512
    IMAGE_MIN_SCALE = 0
    NR_IMAGE_CHANNELS = 3
    MEAN_PIXEL = np.array([123.7, 116.8, 103.9])

    # --- optimisation ---------------------------------------------------------
    LEARNING_RATE = 0.001
    LEARNING_MOMENTUM = 0.9
    CLR = False
    MAX_LEARNING_RATE = 0.0005
    BASE_LEARNING_RATE = 0.0001
    CLR_STEP_SIZE = 4000
    OPTIMIZER = 'SGD'               # SGD | ADAM
    WEIGHT_DECAY = 0.0001
    GRADIENT_CLIP_NORM = 5.0

    # --- heads / pose parameterisation ---------------------------------------
    REGRESS_ORI = True
    REGRESS_LOC = True
    REGRESS_KEYPOINTS = False
    ORIENTATION_PARAM = 'quaternion'  # quaternion | euler_angles | angle_axis
    DECOUPLE_ORIENTATION = False
    LOC_BINS_PER_DIM = 16
    ORI_BINS_PER_DIM = 32
    BETA = 6.0                      # soft-assignment kernel width scale

    # --- augmentation ----------------------------------------------------------
    ROT_AUG = True                  # camera-rotation homography warp
    SIM2REAL_AUG = False            # grayscale + noise/blur/brightness/dropout
    # Exact per-image op ORDER for the on-device sim2real pipeline
    # (imgaug random_order semantics, reference net.py:397). Default
    # False = one order per step shared across the batch (per-image
    # magnitudes; identical marginal distribution) at ~1/4 the pipeline
    # cost. Host-side augmentation (--host_augment) is always exact.
    SIM2REAL_PER_IMAGE_ORDER = False
    ROT_IMAGE_AUG = False           # in-plane roll warp
    # 'nearest' matches the reference cv2.warpPerspective flag bit-pattern
    # (utils.py:50 passes WARP_INVERSE_MAP alone => INTER_NEAREST);
    # 'bilinear' is higher quality.
    WARP_INTERPOLATION = 'nearest'
    # Use the Pallas MXU warp kernel (ops/warp_pallas.py) on TPU when the
    # image shape tiles; falls back to the XLA gather path otherwise.
    PALLAS_WARP = True
    # Run augmentation batched on-device (TPU) instead of per-image on host.
    AUGMENT_ON_DEVICE = True
    # Use the native C++ threaded decode+resize batch loader when built
    # (native/host_loader.cpp); falls back to PIL/numpy automatically.
    NATIVE_LOADER = True
    # Keep small training/validation datasets device-resident: one bulk
    # upload, then batches are index-gathered on device inside the jitted
    # step — zero per-step host->device transfers ('auto' sizes against
    # DATA_ON_DEVICE_MAX_MB; requires AUGMENT_ON_DEVICE). Besides the
    # throughput win, this sidesteps host-buffer pinning per transfer on
    # remote-tunnel device links (PERF.md).
    DATA_ON_DEVICE = 'auto'     # True | False | 'auto'
    DATA_ON_DEVICE_MAX_MB = 1024

    # --- TPU compute-path optimizations ------------------------------------------
    # Rewrite the 7x7/2 stem conv as its exact space-to-depth equivalent
    # (4x4/1 on 2x2-packed input; models/resnet.py:space_to_depth2).
    # Weight imports remap automatically. Halves the stem in isolation
    # (11.8ms -> 6.1ms @ 512x640x32 on v5e) but is end-to-end neutral in
    # the full fused graph there, so it defaults off; flip it on when
    # profiling shows the stem dominating (small models / other TPU gens).
    STEM_SPACE_TO_DEPTH = False

    # Reduced-FLOP serving variant (bottleneck backbones only): scale the
    # INNER widths (f1, f2) of every bottleneck block by this factor,
    # rounded to a multiple of 8. The residual-stream widths (256..2048),
    # the stem, the bottleneck layer and the heads are untouched, so the
    # checkpoint interface stays flagship-shaped and a trained flagship
    # prunes into this architecture by structured channel selection
    # (tools/prune_inner.py) + fine-tune. At 0.5 the per-block FLOPs drop
    # 2.85 -> 1.05 GFLOP (1x1s halve, the 3x3 quarters): ResNet-50
    # 512x640 falls 53.65 -> ~24 GFLOP/img, roughly doubling the int8
    # serving speed-of-light (PERF.md round-4 FLOP-cut section).
    INNER_WIDTH_MULT = 1.0

    # int8-PTQ serving knobs (models/quant.py). QUANT_STEM_S2D rewrites
    # the stem kernel into the s2d form at quantization time — exact,
    # works on any checkpoint, needs even molded H,W. Measured -3.6%
    # end-to-end on v5e int8 serving (the s2d transpose of the int8
    # input costs more than the 12-channel stem saves; PERF.md
    # ablation), so it defaults off like STEM_SPACE_TO_DEPTH; flip it
    # on where profiling shows the stem dominating. INT8_U8_INPUT ships
    # served batches as raw uint8 pixels (1 byte/px vs 4) and folds the
    # mean-subtract into the on-device input quantize — rounding the
    # molded float to the nearest integer pixel, lossless for integer
    # sources and far below the input int8 step (~1.6) otherwise;
    # measured +1.8% on-device plus 4x less host->device traffic.
    QUANT_STEM_S2D = False
    INT8_U8_INPUT = True
    # Ship served uint8 batches ALREADY in space-to-depth layout
    # ([B,H/2,W/2,12], channel order (dy,dx,c)) so the device never pays
    # the s2d transpose that made QUANT_STEM_S2D a net loss (-3.6%): the
    # host reindex is free relative to the transfer, and the stem then
    # runs as the 4x4/1 12-channel conv with zero relayout. Requires
    # QUANT_STEM_S2D (the kernel must be in s2d form); no effect
    # otherwise. engine.predict_molded applies the host reindex.
    QUANT_HOST_S2D = False
    # Run the stem conv (and the molded input) in bf16 inside the int8
    # serving path: skips the input quantize + s8 relayout and XLA's
    # slow 3-channel int8 conv emitter, at 2 bytes/px input traffic.
    # Strictly MORE accurate than the s8 input. Off by default until
    # measured on hardware (flip requires regenerating committed int8
    # goldens, tools/make_gate_artifact.py).
    QUANT_BF16_STEM = False
    # Run the CLASSIFICATION final denses in float inside the int8
    # serving path (the regression/quaternion finals already do): the
    # bins³ logits feed the softmax-moment decode directly and their
    # dense is ~0.04% of flagship FLOPs. Measured on the trained 24³
    # checkpoint this is accuracy-NEUTRAL (ESA 0.11613 vs 0.11616) —
    # i.e. the classification int8 delta comes from backbone activation
    # quantization, not the wide final logits (PERF.md round 3). Kept
    # as the ablation that proves it. Off by default.
    QUANT_FLOAT_CLS_FINAL = False
    # Run METRIC-REGRESSION heads (hidden dense + final) fully in float
    # inside the int8 serving path. Measured NEGATIVE on the trained
    # flagship (PERF.md round-5 ablation): the loc degradation is
    # backbone-activation drift, and the int8 dense head + bias_correct
    # acts as a learned linear recalibration that absorbs it (loc err
    # 1.19 m vs 7.81 m with a float head that gets no correction; float
    # reference 0.32 m). Kept as the ablation knob that proves the
    # localization; off by default.
    QUANT_FLOAT_REG_HEAD = False

    # Rematerialize residual blocks in the backward pass (jax.checkpoint):
    # trades FLOPs for activation HBM at high resolution. Values:
    #   False     no explicit remat (XLA force-remats under HBM pressure)
    #   True/'all' full block remat (nothing saved inside blocks)
    #   'narrow'  save only the narrow f1/f2-wide activations; backward
    #             re-runs the cheap 1x1 expansion, never the 3x3 conv
    #   'dots'    jax checkpoint_dots policy (degenerates to 'all' for
    #             conv nets — documented by tools/sweep_remat.py)
    # Gradients are identical across policies (tests/test_model.py).
    REMAT = False

    # int8 saved-activation training (models/actq.py): backbone convs
    # save an int8 copy of their input for the weight gradient instead of
    # the bf16 original, halving saved-activation HBM. Forward values and
    # input gradients are exact; only wgrad sees 8-bit rounding (<1%
    # relative noise, tests/test_model.py). Values: True (bf16 wgrad
    # from the dequantized copy — measured to LOSE end-to-end on v5e,
    # PERF.md), 'wgrad8' (direct int8×int8 weight gradient, no bf16
    # rematerialization; also quantizes the output gradient). Default
    # off; orthogonal to REMAT.
    TRAIN_ACT_Q8 = False

    # --- precision ---------------------------------------------------------------
    # Reference --f16 flips Keras to float16 (net.py:589-593). On TPU the
    # native fast dtype is bfloat16: F16 selects bf16 compute with f32
    # params/optimizer state.
    F16 = False

    # --- losses ---------------------------------------------------------------
    LEARNABLE_LOSS_WEIGHTS = False
    LOSS_WEIGHTS = {
        "loc_loss": 1.,
        "ori_loss": 1.,
        "k2_loss": 1.,
        "k3_loss": 1.
    }

    # --- batch norm -------------------------------------------------------------
    #  None: train BN layers   False: freeze (use running stats)   True: don't use
    TRAIN_BN = False

    # --- misc -------------------------------------------------------------------
    # Per-step scalar logging to metrics.jsonl every N steps (0 = per-epoch
    # only) — the reference BatchLogger equivalent (net.py:1106-1115).
    LOG_EVERY_STEPS = 0
    SEED = 0
    CHECKPOINT_FORMAT = 'msgpack'   # msgpack | orbax
    # Keep only the newest N per-epoch weight snapshots (0 = keep all,
    # reference behavior net.py:1120); state_latest always remains.
    CHECKPOINT_KEEP = 0
    DEBUG_NANS = False

    def update(self):
        """Recompute derived fields (reference config.py:151-166)."""
        if self.TRAIN_ACT_Q8 not in (False, True, 'wgrad8'):
            raise ValueError(
                f"TRAIN_ACT_Q8 must be False, True, or 'wgrad8' "
                f"(got {self.TRAIN_ACT_Q8!r})")
        # Keep mesh and GPU_COUNT consistent: chips = data * model shards.
        # Without an explicit mesh, GPU_COUNT chips all go to the data axis
        # (reference semantics: BATCH_SIZE = IMAGES_PER_GPU * GPU_COUNT,
        # config.py:154).
        if self.MESH_DATA * self.MESH_MODEL > 1:
            self.GPU_COUNT = self.MESH_DATA * self.MESH_MODEL
        else:
            self.MESH_DATA = self.GPU_COUNT
            self.MESH_MODEL = 1
        self.BATCH_SIZE = self.IMAGES_PER_GPU * self.MESH_DATA

        if self.IMAGE_RESIZE_MODE == "crop":
            self.IMAGE_SHAPE = np.array(
                [self.IMAGE_MIN_DIM, self.IMAGE_MIN_DIM, self.NR_IMAGE_CHANNELS])
        elif self.IMAGE_RESIZE_MODE == "pad64":
            # Assumes wide images (reference config.py:159-161)
            self.IMAGE_SHAPE = np.array(
                [self.IMAGE_MIN_DIM, self.IMAGE_MAX_DIM, self.NR_IMAGE_CHANNELS])
        else:
            self.IMAGE_SHAPE = np.array(
                [self.IMAGE_MAX_DIM, self.IMAGE_MAX_DIM, self.NR_IMAGE_CHANNELS])

        # meta = id(1) + original_shape(3) + shape(3) + window(4) + scale(1)
        self.IMAGE_META_SIZE = 1 + self.NR_IMAGE_CHANNELS + 3 + 4 + 1

    def __init__(self):
        self.update()

    # -- introspection ------------------------------------------------------

    def display(self):
        """Print all configuration values (reference config.py:172-178)."""
        print("\nConfigurations:")
        for a in dir(self):
            if not a.startswith("__") and not callable(getattr(self, a)):
                print("{:30} {}".format(a, getattr(self, a)))
        print("\n")

    def to_dict(self):
        d = {}
        for a in dir(self):
            v = getattr(self, a)
            if a.startswith("__") or callable(v):
                continue
            if isinstance(v, np.ndarray):
                continue
            d[a] = v
        return d

    def write_to_file(self, filepath):
        """Persist as JSON (reference config.py:180-196)."""
        directory = os.path.dirname(filepath)
        if directory and not os.path.isdir(directory):
            os.makedirs(directory)
        with open(filepath, 'w+') as f:
            f.write(json.dumps(self.to_dict(), default=str))

    @classmethod
    def from_dict(cls, d):
        cfg = cls()
        for k, v in d.items():
            setattr(cfg, k, v)
        cfg.update()
        return cfg

    # -- derived helpers ------------------------------------------------------

    @property
    def compute_dtype(self):
        import jax.numpy as jnp
        return jnp.bfloat16 if self.F16 else jnp.float32

    def head_input_features(self) -> int:
        """Flattened feature count after the stride-2 bottleneck conv
        (reference net.py:640)."""
        return int(self.BOTTLENECK_WIDTH * self.IMAGE_SHAPE[0] *
                   self.IMAGE_SHAPE[1] / (64 ** 2))

    def loc_output_size(self) -> int:
        return 3 if self.REGRESS_LOC else self.LOC_BINS_PER_DIM ** 3

    def ori_output_size(self) -> int:
        if self.REGRESS_ORI:
            return 4 if self.ORIENTATION_PARAM == 'quaternion' else 3
        return self.ORI_BINS_PER_DIM ** 3
