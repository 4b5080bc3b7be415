"""Orbax checkpoint backend (CHECKPOINT_FORMAT='orbax').

The default msgpack backend (checkpoint/store.py) gives single-file
snapshots with the reference's naming contract. This backend stores the
same trees through Orbax for multi-host / async-friendly checkpointing
(SURVEY.md §5.4): each snapshot is a directory
`weights_{name}_{epoch:04d}.orbax/`; discovery (find_last /
get_last_checkpoint) keeps working because the store treats both layouts
uniformly via `is_checkpoint_path`.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

ORBAX_SUFFIX = '.orbax'


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def save_weights_dir(path: str, params, batch_stats=None):
    """Save {'params','batch_stats'} as an Orbax checkpoint directory."""
    tree = {'params': jax.device_get(params),
            'batch_stats': (jax.device_get(batch_stats)
                            if batch_stats is not None else {})}
    ckptr = _checkpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_weights_dir(path: str) -> Dict[str, Any]:
    ckptr = _checkpointer()
    tree = ckptr.restore(os.path.abspath(path))
    tree = jax.tree.map(np.asarray, tree)
    if not tree.get('batch_stats'):
        tree['batch_stats'] = None
    return tree


def save_state_dir(path: str, state, epoch: int):
    """Full-train-state snapshot (exact resume incl. optimizer)."""
    from flax import serialization
    tree = {
        'meta': {'step': int(state.step), 'epoch': int(epoch)},
        'params': jax.device_get(state.params),
        'batch_stats': (jax.device_get(state.batch_stats)
                        if state.batch_stats is not None else {}),
        'opt_state': jax.device_get(
            serialization.to_state_dict(state.opt_state)),
    }
    ckptr = _checkpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_state_dir(path: str) -> Dict[str, Any]:
    ckptr = _checkpointer()
    tree = ckptr.restore(os.path.abspath(path))
    out = {
        'step': int(tree['meta']['step']),
        'epoch': int(tree['meta']['epoch']),
        'params': jax.tree.map(np.asarray, tree['params']),
        'batch_stats': (jax.tree.map(np.asarray, tree['batch_stats'])
                        if tree.get('batch_stats') else None),
        'opt_state': jax.tree.map(np.asarray, tree['opt_state']),
    }
    return out


def is_orbax_path(path: Optional[str]) -> bool:
    return bool(path) and path.endswith(ORBAX_SUFFIX)
