"""Pre-flight HBM estimate for training configurations.

XLA reports compile-time OOM only after a full (remote, ~60-95 s)
compilation with an opaque "Ran out of memory in memory space hbm"
error. This module gives a cheap analytic estimate of the dominant
training-memory terms so the engine can warn (or the user can size
batch/scale/REMAT) before compiling:

  * saved forward activations (every residual-block relu output kept
    for the backward), in the compute dtype;
  * parameters + gradients + SGD-momentum/Adam slots (f32);
  * the input batch.

The estimate is structural (same block plan as models/resnet.py) and a
LOWER bound — it tracks the saved-activation total, not XLA's exact
liveness (preprocess buffers, cotangent working set, and fusion slack
add a config-dependent margin on top). Calibration against real v5e
compiles: a 960×1280 batch-32 resnet18 f32 step that OOM'd 15.75 GB
estimates ~9.7 GB (61%); a 512×640 batch-128 resnet50 bf16 step that
fit with <1 GB to spare estimates ~19 GB of which ~15.2 GB are the
saved activations. Hence the warning threshold: >60% of HBM means
"borderline, may not compile".
"""

from __future__ import annotations

V5E_HBM_GB = 16.0


def _backbone_act_elems(architecture: str, h: int, w: int) -> float:
    """Per-image saved-activation element count for the backbone fwd."""
    e = 0.0
    h, w = h / 2, w / 2              # stem /2
    e += h * w * 64                  # stem relu
    h, w = h / 2, w / 2              # maxpool /2
    if architecture in ('resnet50', 'resnet101'):
        widths = [(64, 256), (128, 512), (256, 1024), (512, 2048)]
        reps = [3, 4, 6, 3] if architecture == 'resnet50' \
            else [3, 4, 23, 3]
        for (f1, f3), n in zip(widths, reps):
            for b in range(n):
                # 2 narrow relus + 1 wide block output per bottleneck
                e += h * w * (2 * f1 + f3)
            if f3 != 2048:
                h, w = h / 2, w / 2
    else:
        reps = [2, 2, 2, 2] if architecture == 'resnet18' else [3, 4, 6, 3]
        for stage, n in enumerate(reps):
            f = 64 * (2 ** stage)
            for b in range(n):
                e += h * w * 2 * f   # conv1 relu + block output
            if stage < 3:
                h, w = h / 2, w / 2
    return e


def _param_count(architecture: str, config) -> float:
    counts = {'resnet18': 11.2e6, 'resnet34': 21.3e6,
              'resnet50': 23.5e6, 'resnet101': 42.5e6}
    p = counts.get(architecture, 25e6)
    # bottleneck + heads (dense over flattened C6)
    h, w = config.IMAGE_SHAPE[0] / 64, config.IMAGE_SHAPE[1] / 64
    feats = h * w * config.BOTTLENECK_WIDTH
    c5 = 512 if architecture in ('resnet18', 'resnet34') else 2048
    p += 9 * c5 * config.BOTTLENECK_WIDTH
    n_heads = 1 if config.REGRESS_KEYPOINTS else 2
    if config.NR_DENSE_LAYERS > 0:
        # first hidden dense consumes feats; the rest are BRANCH_SIZE²
        p += n_heads * (feats * config.BRANCH_SIZE
                        + (config.NR_DENSE_LAYERS - 1)
                        * config.BRANCH_SIZE ** 2)
        fin_in = config.BRANCH_SIZE
    else:
        fin_in = feats
    # Final denses: the classification finals (bins³ outputs) dominate
    # wide configs — e.g. speed 64³ is fin_in × 262144.
    if config.REGRESS_KEYPOINTS:
        p += fin_in * 9
    else:
        loc_out = 3 if config.REGRESS_LOC else config.LOC_BINS_PER_DIM ** 3
        ori_out = (4 if config.ORIENTATION_PARAM == 'quaternion' else 3) \
            if config.REGRESS_ORI else config.ORI_BINS_PER_DIM ** 3
        p += fin_in * (loc_out + ori_out)
    return p


def _components_bytes(config):
    """(activation, param-state, batch) byte totals for one train step
    over the GLOBAL batch."""
    h, w = float(config.IMAGE_SHAPE[0]), float(config.IMAGE_SHAPE[1])
    batch = float(config.BATCH_SIZE)
    act_bytes = 2.0 if getattr(config, 'F16', False) else 4.0
    acts = _backbone_act_elems(config.BACKBONE, h, w) * batch * act_bytes
    if getattr(config, 'REMAT', False):
        acts *= 0.15                 # only block boundaries survive
    params = _param_count(config.BACKBONE, config)
    # f32 params + grads + 1-2 optimizer slots + bf16 compute copy
    param_bytes = params * 4 * (3.5 if config.OPTIMIZER != 'SGD' else 2.5)
    batch_bytes = batch * h * w * 3 * 4
    return acts, param_bytes, batch_bytes


def estimate_train_hbm_gb(config) -> float:
    """Rough peak-HBM estimate (GB) of one jitted train step over the
    global batch (cotangent working set folded into the 1.25 fudge)."""
    acts, param_bytes, batch_bytes = _components_bytes(config)
    return 1.25 * (acts + param_bytes + batch_bytes) / 1e9


def check_train_memory(config, log_fn=print,
                       hbm_gb: float = V5E_HBM_GB) -> float:
    """Warn when the estimate approaches the per-chip HBM. Returns the
    GLOBAL estimate in GB."""
    est = estimate_train_hbm_gb(config)
    # Per chip: batch-scaled terms shard over the 'data' axis, but the
    # param/grad/optimizer state is REPLICATED on every data-parallel
    # chip (only 'model'-axis sharding splits it) — the dominant term
    # for the wide classification heads.
    md = max(1, int(getattr(config, 'MESH_DATA', 1) or 1))
    mm = max(1, int(getattr(config, 'MESH_MODEL', 1) or 1))
    acts, param_bytes, batch_bytes = _components_bytes(config)
    per_chip = 1.25 * ((acts + batch_bytes) / md
                       + param_bytes / mm) / 1e9
    if per_chip > 0.6 * hbm_gb:
        log_fn(
            f"WARNING: estimated training memory >= {per_chip:.1f} GB/chip "
            f"(lower bound) against {hbm_gb:.0f} GB HBM per v5e chip — "
            "the step may fail to compile. Consider REMAT=True, a "
            "smaller --batch_size / --image_scale, or more data-parallel "
            "chips.")
    return est
