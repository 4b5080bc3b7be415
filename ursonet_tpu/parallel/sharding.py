"""Sharding utilities: partition specs → NamedShardings, batch placement.

Parameters annotated with nn.with_partitioning (the head Dense kernels,
models/heads.py) carry logical axis names that are *physical* mesh axis
names here ('model'); everything else is replicated. The batch is always
split over the 'data' axis.
"""

from __future__ import annotations

import jax
import flax.linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ursonet_tpu.parallel.mesh import AXIS_DATA


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dimension split over the data axis."""
    return NamedSharding(mesh, P(AXIS_DATA))


def variable_shardings(mesh: Mesh, abstract_variables):
    """NamedSharding tree for a (possibly boxed) variable tree.

    `abstract_variables` is the output of jax.eval_shape over model.init —
    nn.Partitioned leaves yield their PartitionSpec, plain leaves P().
    Returns a tree with the *unboxed* structure.
    """
    specs = nn.get_partition_spec(abstract_variables)
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs, is_leaf=lambda x: isinstance(x, P))


def shard_batch(mesh: Mesh, batch: dict):
    """Place a host batch dict onto the mesh, split over 'data'.

    Arrays keep their global shape; each data-row of the mesh holds
    batch/data_parallel rows (per-chip batch = IMAGES_PER_GPU).
    """
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
