"""Weight/state snapshots and the reference checkpoint/resume contract.

Reference semantics reproduced (net.py:768-814, 944-967, 1120-1121):
  * run dir `{name.lower()}{YYYYMMDDTHHMM}` inside the model dir;
  * per-epoch weight snapshot `weights_{name.lower()}_{epoch:04d}.<ext>`;
  * `find_last()` discovers the newest run dir / snapshot by
    lexicographic sort; the epoch counter is parsed from the filename;
  * by-name partial loading with layer exclusion for transfer learning
    (net.py:816-852).

TPU-native differences: snapshots are flax msgpack trees ('.msgpack')
written *atomically* (tmp file + rename — SURVEY.md §5.3), hold
params + batch_stats (and optionally full optimizer state for exact
resume, which the reference cannot do).
"""

from __future__ import annotations

import datetime
import os
import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from flax import serialization

from ursonet_tpu.train.state import layer_name_of

WEIGHTS_EXT = '.msgpack'


# ---------------------------------------------------------------------------
# Run-dir bookkeeping
# ---------------------------------------------------------------------------

def set_log_dir(model_dir: str, name: str,
                weights_path: Optional[str] = None,
                now: Optional[datetime.datetime] = None,
                ext: str = WEIGHTS_EXT) -> Tuple[str, str, int]:
    """Compute (log_dir, checkpoint_template, epoch0).

    When resuming from a snapshot path, reuse its run dir and parse the
    epoch from the filename (reference net.py:944-967).
    """
    now = now or datetime.datetime.now()
    epoch = 0
    if weights_path:
        m = re.match(
            r".*[/\\][\w\-]+(\d{4}T\d{4})[/\\]weights\_[\w\-]+\_(\d{4})\."
            r"(h5|msgpack|orbax)", weights_path)
        if m:
            log_dir = os.path.dirname(weights_path)
            epoch = int(m.group(2)) + 1
        else:
            log_dir = os.path.join(
                model_dir, f"{name.lower()}{now:%Y%m%dT%H%M}")
    else:
        log_dir = os.path.join(model_dir, f"{name.lower()}{now:%Y%m%dT%H%M}")
    template = os.path.join(
        log_dir, f"weights_{name.lower()}_*epoch*{ext}")
    return log_dir, template, epoch


def checkpoint_epoch(template: str, epoch: int) -> str:
    return template.replace("*epoch*", f"{epoch:04d}")


def _run_dirs(model_dir: str, name_prefix: Optional[str] = None):
    if not os.path.isdir(model_dir):
        return []
    names = sorted(os.listdir(model_dir))
    if name_prefix:
        names = [n for n in names if n.startswith(name_prefix.lower())]
    return [n for n in names if os.path.isdir(os.path.join(model_dir, n))]


def latest_in_dir(run_dir: str) -> Optional[str]:
    """Newest weight snapshot inside one run dir (msgpack files or orbax
    directories)."""
    if not os.path.isdir(run_dir):
        return None
    cands = sorted(f for f in os.listdir(run_dir)
                   if f.startswith("weights_")
                   and (f.endswith(WEIGHTS_EXT) or f.endswith('.orbax')))
    return os.path.join(run_dir, cands[-1]) if cands else None


def find_last(model_dir: str) -> str:
    """Newest snapshot of the newest run dir (reference find_last,
    net.py:791-814). Raises FileNotFoundError when nothing is found."""
    for d in reversed(_run_dirs(model_dir)):
        ckpt = latest_in_dir(os.path.join(model_dir, d))
        if ckpt:
            return ckpt
    raise FileNotFoundError(
        f"Could not find weight files in {model_dir}")


def get_last_checkpoint(model_dir: str, model_name: str) -> str:
    """Newest snapshot among run dirs named after `model_name`
    (reference get_last_checkpoint, net.py:768-788)."""
    for d in reversed(_run_dirs(model_dir, model_name)):
        ckpt = latest_in_dir(os.path.join(model_dir, d))
        if ckpt:
            return ckpt
    raise FileNotFoundError(
        f"Could not find weight files for {model_name} in {model_dir}")


# ---------------------------------------------------------------------------
# Serialization (atomic)
# ---------------------------------------------------------------------------

def _atomic_write(path: str, payload: bytes):
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _to_host(tree):
    """Host copy; on a multi-process cluster cross-host-sharded leaves
    are allgathered (every process must call this — it is collective)."""
    if jax.process_count() > 1:
        from ursonet_tpu.parallel.multihost import fetch_global
        return fetch_global(tree)
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def _is_writer() -> bool:
    """Process-0-writes policy for msgpack snapshots (multi-host)."""
    return jax.process_index() == 0


def _barrier(tag: str) -> None:
    """Block every process until all reach this point (multi-host only).

    Placed after checkpoint writes so (a) a process-0-only call path
    deadlocks HERE with a named barrier tag instead of silently inside
    the allgather, and (b) no process can race ahead and try to resume
    from a file process 0 has not finished writing. Resume across hosts
    assumes the checkpoint dir is on a SHARED filesystem (or is synced
    out-of-band) — only process 0 has the bytes locally."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)


def save_weights_file(path: str, params, batch_stats=None):
    """Atomic weight snapshot: {'params', 'batch_stats'}.

    COLLECTIVE on multi-host: every process must call this with the
    same tree structure (the allgather of sharded leaves and the final
    barrier otherwise deadlock); only process 0 writes the file, so
    multi-host resume needs `path` on a shared filesystem."""
    tree = {'params': _to_host(params),
            'batch_stats': _to_host(batch_stats) if batch_stats is not None
            else {}}
    if _is_writer():
        _atomic_write(path, serialization.msgpack_serialize(tree))
    _barrier(f'save_weights:{os.path.basename(path)}')


def load_weights_file(path: str) -> Dict[str, Any]:
    with open(path, 'rb') as f:
        tree = serialization.msgpack_restore(f.read())
    if not tree.get('batch_stats'):
        tree['batch_stats'] = None
    return tree


def save_state(path: str, state, epoch: int):
    """Full-train-state snapshot (exact resume incl. optimizer).

    COLLECTIVE on multi-host: every process must call this (allgather +
    barrier, see _barrier); only process 0 writes, so multi-host resume
    needs `path` on a shared filesystem."""
    tree = {
        'step': int(state.step),
        'epoch': int(epoch),
        'params': _to_host(state.params),
        'batch_stats': (_to_host(state.batch_stats)
                        if state.batch_stats is not None else {}),
        'opt_state': _to_host(serialization.to_state_dict(state.opt_state)),
    }
    if _is_writer():
        _atomic_write(path, serialization.msgpack_serialize(tree))
    _barrier(f'save_state:{os.path.basename(path)}')


def load_state(path: str) -> Dict[str, Any]:
    with open(path, 'rb') as f:
        tree = serialization.msgpack_restore(f.read())
    if not tree.get('batch_stats'):
        tree['batch_stats'] = None
    return tree


# ---------------------------------------------------------------------------
# By-name partial loading (transfer learning)
# ---------------------------------------------------------------------------

def merge_params(current, incoming, exclude: Sequence[str] = ()):
    """Merge `incoming` into `current` by tree path, skipping excluded
    layers and shape mismatches — the Keras by-name load with layer
    exclusion (reference load_weights net.py:816-852).

    Returns (merged, loaded_layer_names, skipped_layer_names).
    """
    exclude = list(exclude or ())
    cur_flat = {tuple(str(getattr(k, 'key', k)) for k in p): v
                for p, v in jax.tree_util.tree_leaves_with_path(current)}
    inc_flat = {tuple(str(getattr(k, 'key', k)) for k in p): v
                for p, v in jax.tree_util.tree_leaves_with_path(incoming)}
    loaded, skipped = set(), set()

    def excluded(layer: str) -> bool:
        return any(re.fullmatch(pat, layer) for pat in exclude)

    merged_flat = {}
    for path, cur in cur_flat.items():
        layer = _layer_from_keys(path)
        inc = inc_flat.get(path)
        if inc is not None and not excluded(layer) \
                and tuple(np.shape(inc)) == tuple(np.shape(cur)):
            merged_flat[path] = np.asarray(inc, dtype=np.asarray(cur).dtype)
            loaded.add(layer)
        else:
            merged_flat[path] = cur
            if inc is not None:
                skipped.add(layer)
    merged = _unflatten(current, merged_flat)
    return merged, sorted(loaded), sorted(skipped)


def _layer_from_keys(keys) -> str:
    i = len(keys) - 2
    if i >= 0 and keys[i] == 'bn':
        i -= 1
    return keys[i] if i >= 0 else keys[-1]


def _unflatten(ref_tree, flat: Dict[tuple, Any]):
    leaves_paths = jax.tree_util.tree_leaves_with_path(ref_tree)
    vals = [flat[tuple(str(getattr(k, 'key', k)) for k in p)]
            for p, _ in leaves_paths]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(ref_tree), vals)
