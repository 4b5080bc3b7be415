"""Profiling & observability (reference component #31).

The reference wraps the TF graph profiler for a one-off FLOP count
(get_flops, net.py:1361-1369) and prints tensor stats (log, net.py:46-57).
TPU-native equivalents:

  * get_flops/cost_analysis — XLA's own cost model from the compiled HLO
    (exact for the program actually executed, unlike graph estimates);
  * trace — jax.profiler context manager producing TensorBoard/XProf
    traces;
  * log_tensor_stats — shape/min/max printer for host or device arrays.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Optional

import jax
import numpy as np


def cost_analysis(fn, *args, **kwargs) -> Dict[str, Any]:
    """Compile `fn` for the given args and return XLA's cost analysis
    (flops, bytes accessed, ...). fn must be jittable."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0]
    return dict(analysis) if analysis else {}


def get_flops(fn, *args, **kwargs) -> float:
    """Total FLOPs of the compiled program (reference get_flops,
    net.py:1361-1369 — but exact, from the XLA cost model)."""
    return float(cost_analysis(fn, *args, **kwargs).get('flops', 0.0))


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf:

        with profiling.trace('/tmp/trace'):
            train_step(...)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_tensor_stats(text: str, array: Optional[Any] = None,
                     log_fn=print):
    """Shape/dtype/min/max printer (reference log, net.py:46-57)."""
    if array is not None:
        a = np.asarray(array)
        text = text.ljust(25)
        if a.size:
            text += (f"shape: {str(a.shape):20}  "
                     f"min: {a.min():10.5f}  max: {a.max():10.5f}")
        else:
            text += f"shape: {str(a.shape):20}  min:     empty  max: empty"
        text += f"  {a.dtype}"
    log_fn(text)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None):
    """Multi-host bring-up (SURVEY.md §5.8) — delegates to
    parallel.multihost.initialize (per-process input sharding and the
    rest of the pod path live there)."""
    from ursonet_tpu.parallel import multihost
    return multihost.initialize(coordinator_address, num_processes,
                                process_id)
