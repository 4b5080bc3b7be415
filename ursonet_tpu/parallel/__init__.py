"""TPU parallelism layer: device mesh, shardings, collective train step.

The reference has no working distributed backend (its multi-GPU
ParallelModel is commented out — reference net.py:694-697; GPU_COUNT only
scales the batch size, config.py:154). This package supplies the
first-class TPU-native replacement (SURVEY.md §2 parallelism table, §5.8):

  * a (data, model) `jax.sharding.Mesh` over the chips;
  * batch sharding over the 'data' axis (data parallelism over ICI);
  * Megatron-style tensor parallelism of the head Dense layers over the
    'model' axis (the kernels are annotated in models/heads.py);
  * jit-compiled train/eval steps where XLA inserts the gradient
    all-reduce / activation collectives automatically.
"""

from ursonet_tpu.parallel import multihost
from ursonet_tpu.parallel.mesh import (AXIS_DATA, AXIS_MODEL, make_mesh,
                                       mesh_devices)
from ursonet_tpu.parallel.sharding import (batch_sharding, replicated,
                                           shard_batch, variable_shardings)

__all__ = [
    'AXIS_DATA', 'AXIS_MODEL', 'make_mesh', 'mesh_devices',
    'batch_sharding', 'multihost', 'replicated', 'shard_batch',
    'variable_shardings',
]
