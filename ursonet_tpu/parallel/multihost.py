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


def local_batch_slice(mesh, batch_size: int) -> Tuple[int, int]:
    """This process's [lo, hi) row range of a global batch split over the
    mesh 'data' axis.

    Requires the local devices to back a CONTIGUOUS range of data rows
    (true for the standard devices-ordered-by-process mesh construction;
    asserted here), so a host can load rows lo:hi of each deterministic
    global batch with no inter-host exchange.
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
    assert rows == list(range(rows[0], rows[0] + len(rows))), \
        "local devices must back a contiguous data-row range"
    return rows[0] * per_row, (rows[-1] + 1) * per_row


def shard_batch_local(mesh, local_batch: dict, batch_size: int) -> dict:
    """Assemble global batch arrays from this process's local rows
    (the multi-host replacement for parallel.shard_batch)."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in local_batch.items():
        v = np.asarray(v)
        out[k] = jax.make_array_from_process_local_data(
            sh, v, (batch_size,) + v.shape[1:])
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
