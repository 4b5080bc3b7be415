"""Multi-host (pod) operation: per-process input sharding + helpers.

The reference feeds one process from a multiprocessing worker pool
(reference net.py:1147-1163) — single host by construction. At pod scale
the TPU-native replacement is: every host runs the same program,
`jax.distributed.initialize` forms the cluster, the global mesh spans all
chips, and EACH HOST LOADS ONLY ITS OWN SLICE of every global batch
(deterministic shuffle order keeps the global batch composition identical
across hosts with no communication). Host-local arrays are assembled into
global jax.Arrays with `jax.make_array_from_process_local_data`; XLA's
collectives do the rest.

On CPU test clusters the gloo collectives backend is selected
automatically (tests/test_multihost.py runs a real 2-process × 4-device
cluster).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np

from ursonet_tpu.parallel.mesh import AXIS_DATA
from ursonet_tpu.parallel.sharding import batch_sharding


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Bring up jax.distributed (SURVEY.md §5.8). On the CPU platform the
    gloo cross-process collectives implementation is selected (the
    default 'none' cannot execute psum across processes). Safe no-op when
    the env provides no topology."""
    try:
        jax.config.update('jax_cpu_collectives_implementation', 'gloo')
    except Exception:
        pass  # knob absent on this jaxlib — TPU backends don't need it
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            return False
        return True
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def local_batch_slice(mesh, batch_size: int):
    """The global batch rows this process must load.

    Returns an (lo, hi) tuple when the process's devices back a
    CONTIGUOUS range of data-axis rows — true for the standard
    devices-ordered-by-process mesh construction — else a sorted int
    array of the global row indices (a slice topology may interleave
    processes across the 'data' axis; both forms are understood by
    data_generator(batch_slice=...) and shard_batch_local).
    """
    axes = list(mesh.axis_names)
    di = axes.index(AXIS_DATA)
    grid = np.asarray(mesh.devices)
    n_rows = grid.shape[di]
    assert batch_size % n_rows == 0, \
        f"batch {batch_size} not divisible by data axis {n_rows}"
    per_row = batch_size // n_rows
    pid = jax.process_index()
    rows = [r for r in range(n_rows)
            if any(d.process_index == pid
                   for d in np.take(grid, r, axis=di).flatten())]
    assert rows, "process owns no devices on the data axis"
    if rows == list(range(rows[0], rows[0] + len(rows))):
        return rows[0] * per_row, (rows[-1] + 1) * per_row
    return np.concatenate([np.arange(r * per_row, (r + 1) * per_row)
                           for r in rows])


def slice_rows(batch_slice, batch_size: int) -> np.ndarray:
    """Normalize a batch_slice (None | (lo,hi) | index array) to the
    sorted array of global batch rows it selects."""
    if batch_slice is None:
        return np.arange(batch_size)
    if isinstance(batch_slice, tuple):
        return np.arange(batch_slice[0], batch_slice[1])
    return np.asarray(batch_slice, np.int64)


def shard_batch_local(mesh, local_batch: dict, batch_size: int,
                      batch_slice=None) -> dict:
    """Assemble global batch arrays from this process's local rows
    (the multi-host replacement for parallel.shard_batch).

    batch_slice: the same value local_batch_slice() returned — needed
    to place rows when the process's range is non-contiguous."""
    sh = batch_sharding(mesh)
    contiguous = batch_slice is None or isinstance(batch_slice, tuple)
    rows = None if contiguous else slice_rows(batch_slice, batch_size)
    out = {}
    for k, v in local_batch.items():
        v = np.asarray(v)
        gshape = (batch_size,) + v.shape[1:]
        if contiguous:
            out[k] = jax.make_array_from_process_local_data(sh, v, gshape)
        else:
            # Interleaved topology: hand each addressable device exactly
            # its shard, looked up by global row index in the local rows.
            pos = {int(g): i for i, g in enumerate(rows)}
            per_dev = {}
            for d, idx in sh.addressable_devices_indices_map(gshape).items():
                bsl = idx[0]
                lo = 0 if bsl.start is None else bsl.start
                hi = gshape[0] if bsl.stop is None else bsl.stop
                local_idx = np.array([pos[g] for g in range(lo, hi)])
                per_dev[d] = jax.device_put(v[local_idx], d)
            out[k] = jax.make_array_from_single_device_arrays(
                gshape, sh, [per_dev[d] for d in sh.addressable_devices])
    return out


def fetch_global(tree):
    """Host copy of a (possibly cross-host-sharded) array tree: replicated
    leaves read locally, sharded leaves allgathered across processes.
    Used for process-0 checkpoint writes when MESH_MODEL spans hosts."""
    if not is_multiprocess():
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    def get(x):
        if not isinstance(x, jax.Array):
            return np.asarray(x)
        if x.is_fully_addressable:
            return np.asarray(jax.device_get(x))
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    return jax.tree.map(get, tree)
