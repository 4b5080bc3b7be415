"""Checkpointing: atomic msgpack weight snapshots, run-dir bookkeeping,
resume discovery, and the Keras-h5 import bridge for released weights."""

from ursonet_tpu.checkpoint.store import (checkpoint_epoch, find_last,
                                          get_last_checkpoint, latest_in_dir,
                                          load_weights_file, merge_params,
                                          save_state, load_state,
                                          save_weights_file, set_log_dir)

__all__ = [
    'checkpoint_epoch', 'find_last', 'get_last_checkpoint', 'latest_in_dir',
    'load_weights_file', 'merge_params', 'save_state', 'load_state',
    'save_weights_file', 'set_log_dir',
]
