"""Utilities: profiling/FLOPs accounting, tensor-stats logging, and
multi-host initialization."""

from ursonet_tpu.utils.profiling import (cost_analysis, get_flops,
                                         log_tensor_stats, trace)

__all__ = ['cost_analysis', 'get_flops', 'log_tensor_stats', 'trace']
