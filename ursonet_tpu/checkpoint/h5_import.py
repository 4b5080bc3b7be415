"""Keras-HDF5 → Flax weight import bridge.

Loads reference-format weight files — the released UrsoNet models, the
Keras ImageNet ResNets, and the COCO Mask-RCNN file (reference
net.py:816-940, pose_estimator.py:884-906) — into the Flax param /
batch_stats trees by layer name, with optional layer exclusion, i.e. the
Keras `load_weights(by_name=True, exclude=...)` contract.

Name/shape correspondence (why this works 1:1):
  * our modules are named exactly after the reference Keras layers
    (models/resnet.py, models/heads.py);
  * Keras Conv2D kernels are (kh, kw, in, out) and Dense kernels
    (in, out) — identical to Flax NHWC conventions, no transposition;
  * Keras BatchNormalization {gamma, beta, moving_mean, moving_variance}
    map to Flax {scale, bias} in params and {mean, var} in batch_stats,
    under the 'bn' submodule of FrozenAwareBN;
  * the head flatten is NHWC row-major in both (net.py:298).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

_BN_MAP = {
    'gamma': ('params', 'scale'),
    'beta': ('params', 'bias'),
    'moving_mean': ('batch_stats', 'mean'),
    'moving_variance': ('batch_stats', 'var'),
}


def _iter_keras_weights(h5file):
    """Yield (layer_name, weight_name, np.ndarray) from a Keras weights
    file (handles both plain and nested 'model_weights' layouts)."""
    root = h5file['model_weights'] if 'model_weights' in h5file else h5file
    layer_names = [n.decode() if isinstance(n, bytes) else n
                   for n in root.attrs.get('layer_names', list(root.keys()))]
    for lname in layer_names:
        if lname not in root:
            continue
        g = root[lname]
        wnames = [n.decode() if isinstance(n, bytes) else n
                  for n in g.attrs.get('weight_names', [])]
        if not wnames:  # fall back to walking the group
            def walk(grp, prefix=''):
                import h5py
                for k, v in grp.items():
                    if isinstance(v, h5py.Dataset):
                        yield prefix + k, np.asarray(v)
                    else:
                        yield from walk(v, prefix + k + '/')
            for wname, arr in walk(g):
                yield lname, wname, arr
        else:
            for wname in wnames:
                yield lname, wname, np.asarray(g[wname])


def index_layers(params) -> Dict[str, Tuple[str, ...]]:
    """Map module (layer) name -> path of its param sub-dict, scanning the
    whole tree (layers live at different depths: backbone blocks, heads,
    top-level bottleneck_layer)."""
    out: Dict[str, Tuple[str, ...]] = {}

    def visit(node, path):
        if not isinstance(node, dict):
            return
        for k, v in node.items():
            if isinstance(v, dict):
                leaf_children = any(not isinstance(c, dict)
                                    for c in v.values())
                if leaf_children or 'bn' in v:
                    out.setdefault(k, path + (k,))
                visit(v, path + (k,))

    visit(params, ())
    return out


def load_keras_h5(path: str, params, batch_stats=None,
                  exclude: Sequence[str] = (), verbose: bool = False):
    """Merge a Keras h5 weight file into (params, batch_stats) by name.

    Returns (params, batch_stats, report) where report lists loaded /
    skipped-by-exclusion / unmatched layer names. Unmatched reference-only
    layers (e.g. Mask-RCNN FPN heads in the COCO file) are skipped
    silently, like Keras by_name loading (net.py:849-852).
    """
    import copy
    import re

    import h5py

    params = copy.deepcopy(_to_plain(params))
    batch_stats = copy.deepcopy(_to_plain(batch_stats)) if batch_stats \
        else None
    layer_index = index_layers(params)
    loaded, excluded, unmatched, mismatched = [], [], [], []

    def is_excluded(name: str) -> bool:
        return any(re.fullmatch(pat, name) for pat in exclude)

    with h5py.File(path, 'r') as f:
        for lname, wname, arr in _iter_keras_weights(f):
            leaf = wname.split('/')[-1].split(':')[0]
            if lname not in layer_index:
                unmatched.append(f"{lname}/{leaf}")
                continue
            if is_excluded(lname):
                excluded.append(f"{lname}/{leaf}")
                continue
            ppath = layer_index[lname]
            if leaf in ('kernel', 'bias'):
                ok = _assign(params, ppath + (leaf,), arr)
            elif leaf in _BN_MAP:
                coll, newleaf = _BN_MAP[leaf]
                target = params if coll == 'params' else batch_stats
                if target is None:
                    continue
                ok = _assign(target, ppath + ('bn', newleaf), arr)
            else:
                unmatched.append(f"{lname}/{leaf}")
                continue
            (loaded if ok else mismatched).append(f"{lname}/{leaf}")

    report = {'loaded': loaded, 'excluded': excluded,
              'unmatched': unmatched, 'mismatched': mismatched}
    if verbose:
        print(f"h5 import: {len(loaded)} loaded, {len(excluded)} excluded, "
              f"{len(unmatched)} unmatched, {len(mismatched)} shape-mismatched")
    return params, batch_stats, report


def _to_plain(tree):
    if tree is None:
        return None
    if isinstance(tree, dict):
        return {k: _to_plain(v) for k, v in tree.items()}
    try:  # FrozenDict
        return {k: _to_plain(v) for k, v in tree.items()}
    except AttributeError:
        return tree


def _assign(tree, path, arr) -> bool:
    node = tree
    for k in path[:-1]:
        if not isinstance(node, dict) or k not in node:
            return False
        node = node[k]
    leaf = path[-1]
    if not isinstance(node, dict) or leaf not in node:
        return False
    cur = node[leaf]
    if tuple(np.shape(cur)) != tuple(np.shape(arr)):
        # Space-to-depth stem: a reference (7,7,C,O) stem kernel maps
        # exactly onto our (4,4,4C,O) s2d kernel (models/resnet.py).
        if (np.ndim(arr) == 4 and np.shape(arr)[:2] == (7, 7)
                and tuple(np.shape(cur)) ==
                (4, 4, 4 * np.shape(arr)[2], np.shape(arr)[3])):
            from ursonet_tpu.models.resnet import stem_kernel_to_s2d
            arr = stem_kernel_to_s2d(np.asarray(arr))
        else:
            return False
    node[leaf] = np.asarray(arr, dtype=np.asarray(cur).dtype)
    return True


def save_keras_h5(path: str, params, batch_stats=None):
    """Export the Flax trees as a reference-layout Keras weights file —
    the inverse of `load_keras_h5`, so weights round-trip between this
    framework and the reference's `load_weights(by_name=True)`.

    Layout: one group per layer with a `weight_names` attribute;
    conv/dense -> kernel/bias, BN -> gamma/beta + moving_mean/variance
    (from batch_stats). The s2d stem kernel shape (4,4,4C,O) is exported
    as-is — convert with models.resnet.stem_kernel_to_s2d's inverse
    before export if reference-shape stems are required.
    """
    import h5py

    params = _to_plain(params)
    batch_stats = _to_plain(batch_stats) if batch_stats else {}
    layer_index = index_layers(params)
    stats_index = index_layers(batch_stats) if batch_stats else {}

    def get(tree, pth):
        node = tree
        for k in pth:
            node = node[k]
        return node

    with h5py.File(path, 'w') as f:
        layer_names = []
        for lname, ppath in sorted(layer_index.items()):
            if lname == 'bn':  # inner FrozenAwareBN submodule, not a layer
                continue
            node = get(params, ppath)
            weights = {}
            if 'bn' in node:  # FrozenAwareBN wrapper
                bn = node['bn']
                weights['gamma'] = bn['scale']
                weights['beta'] = bn['bias']
                spath = stats_index.get(lname)
                if spath is not None:
                    sbn = get(batch_stats, spath)['bn']
                    weights['moving_mean'] = sbn['mean']
                    weights['moving_variance'] = sbn['var']
            else:
                for leaf in ('kernel', 'bias'):
                    if leaf in node and not isinstance(node[leaf], dict):
                        weights[leaf] = node[leaf]
            if not weights:
                continue
            g = f.create_group(lname)
            wnames = []
            for leaf, arr in weights.items():
                wname = f"{lname}/{leaf}:0"
                g.create_dataset(wname, data=np.asarray(arr, np.float32))
                wnames.append(wname.encode())
            g.attrs['weight_names'] = wnames
            layer_names.append(lname.encode())
        f.attrs['layer_names'] = layer_names
    return path


# Released-weights config assertions (reference net.py:886-940).
RELEASED_CONFIGS = {
    'soyuz_hard': dict(BACKBONE='resnet50', BOTTLENECK_WIDTH=128,
                       ORI_BINS_PER_DIM=24, REGRESS_ORI=False),
    'dragon_hard': dict(BACKBONE='resnet50', BOTTLENECK_WIDTH=128,
                        ORI_BINS_PER_DIM=24, REGRESS_ORI=False),
    'speed': dict(BACKBONE='resnet101', REGRESS_ORI=False),
}


def check_released_config(name: str, config) -> Optional[str]:
    """Return an error string if config is incompatible with the named
    released model (reference asserts, net.py:897-931)."""
    want = RELEASED_CONFIGS.get(name)
    if not want:
        return None
    for k, v in want.items():
        if getattr(config, k) != v:
            return f"released model '{name}' requires {k}={v}"
    if name == 'speed' and (config.BOTTLENECK_WIDTH, config.ORI_BINS_PER_DIM) \
            not in ((528, 32), (800, 64)):
        return ("released model 'speed' requires bottleneck/bins "
                "528/32 or 800/64")
    return None


# ---------------------------------------------------------------------------
# Released-artifact registry (turnkey real-weight ingestion)
# ---------------------------------------------------------------------------
# Canonical filenames exactly as the reference downloads them
# (net.py:854-940): drop the files into --models_dir and the CLI,
# tools/verify_artifacts.py, and tests/test_artifacts.py light up with
# no code changes. md5s are the ones the reference pins (net.py:861-883);
# the UrsoNet release files publish none.
RELEASED_FILES = {
    'soyuz_hard': ('resnet50_soyuz_hard_128_24.h5', None),
    'dragon_hard': ('resnet50_dragon_hard_128_24.h5', None),
    'speed_528_32': ('resnet101_speed_528_32.h5', None),
    'speed_800_64': ('resnet101_speed_800_64.h5', None),
    'coco': ('mask_rcnn_coco.h5', None),
    'imagenet_resnet50': (
        'resnet50_weights_tf_dim_ordering_tf_kernels_notop.h5',
        'a268eb855778b3df3c7506639542a6af'),
    'imagenet_resnet101': (  # reference reuses the resnet50 file
        'resnet50_weights_tf_dim_ordering_tf_kernels_notop.h5',
        'a268eb855778b3df3c7506639542a6af'),
    'imagenet_resnet18': ('resnet18_imagenet_1000_no_top.h5',
                          '318e3ac0cd98d51e917526c9f62f0b50'),
    'imagenet_resnet34': ('resnet34_imagenet_1000_no_top.h5',
                          '8caaa0ad39d927cb8ba5385bf945d582'),
}


def find_released_file(models_dir: str, key: str) -> Optional[str]:
    """Locate a released artifact under models_dir by its canonical
    reference filename, or by this repo's short alias
    (ursonet_<name>.h5 / imagenet_<backbone>.h5). None if absent."""
    canonical, _ = RELEASED_FILES.get(key, (None, None))
    candidates = []
    if canonical:
        candidates.append(canonical)
    if key.startswith('imagenet_'):
        candidates.append(f'{key}.h5')
    elif key != 'coco':
        candidates.append(f'ursonet_{key}.h5')
    for fn in candidates:
        path = os.path.join(models_dir, fn)
        if os.path.exists(path):
            return path
    return None
