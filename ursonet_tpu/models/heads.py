"""Bottleneck conv + dual pose heads.

Reference design (net.py:288-352, 635-643): instead of a global average
pool, a stride-2 3×3 conv of width BOTTLENECK_WIDTH keeps spatial
resolution; its NHWC flatten feeds two parallel stacks of
NR_DENSE_LAYERS × (Dense(BRANCH_SIZE) [+BN if TRAIN_BN] + ReLU) and a
final Dense per head:

  location head:  Dense(3) linear (regression) | Dense(LOC_BINS³) ReLU
                  (classification) | 3 × Dense(3) (keypoints k1/k2/k3)
  orientation:    Dense(4)+L2-normalize (quaternion) | Dense(3)
                  (euler/angle-axis) | Dense(ORI_BINS³) ReLU

The flatten order is NHWC row-major, matching the Keras Reshape
(net.py:298,332) so imported dense kernels line up.

Tensor parallelism: the head Dense kernels can dwarf the backbone (e.g.
speed 800/64³: ≈117M + 268M params in one head). Kernels are annotated
with logical sharding axes via nn.with_partitioning — first (hidden)
dense is column-parallel on the 'model' mesh axis, the final dense
row-parallel, the Megatron pattern — so pjit shards them when MESH_MODEL>1.
"""

from __future__ import annotations

from typing import Any

import jax
import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def _dense(features, name, dtype, in_axis=None, out_axis=None):
    kernel_init = nn.initializers.lecun_normal()
    bias_init = nn.initializers.zeros_init()
    if in_axis or out_axis:
        kernel_init = nn.with_partitioning(kernel_init, (in_axis, out_axis))
        bias_init = nn.with_partitioning(bias_init, (out_axis,))
    return nn.Dense(features, name=name, dtype=dtype,
                    kernel_init=kernel_init, bias_init=bias_init)


class PoseHead(nn.Module):
    """One head (loc or ori) on the flattened bottleneck features
    (reference build_loc_graph/build_ori_graph net.py:288-352)."""
    prefix: str                  # 'loc' or 'ori'
    nr_dense_layers: int
    branch_size: int
    final_features: int
    final_activation: str        # 'linear' | 'relu' | 'l2norm'
    final_name: str
    train_bn: Any = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        from ursonet_tpu.models.resnet import FrozenAwareBN
        for i in range(self.nr_dense_layers):
            # Column-parallel hidden dense: activations shard on 'model'.
            x = _dense(self.branch_size, f"{self.prefix}_dense_{i}",
                       self.dtype, in_axis=None, out_axis='model')(x)
            if self.train_bn:
                x = FrozenAwareBN(self.train_bn, self.dtype,
                                  name=f"{self.prefix}_bn_{i}")(x, training)
            x = nn.relu(x)
        # Row-parallel final dense consumes the sharded activation; when
        # nr_dense_layers == 0 the input is replicated so shard the output.
        if self.nr_dense_layers > 0:
            out = _dense(self.final_features, self.final_name, self.dtype,
                         in_axis='model', out_axis=None)(x)
        else:
            out = _dense(self.final_features, self.final_name, self.dtype,
                         in_axis=None, out_axis='model')(x)
        if self.final_activation == 'relu':
            out = nn.relu(out)
        elif self.final_activation == 'l2norm':
            # tf.nn.l2_normalize semantics (reference K.l2_normalize,
            # net.py:346): x / sqrt(max(sum(x²), 1e-12)) — zero-safe.
            sq = jnp.sum(jnp.square(out.astype(jnp.float32)), axis=-1,
                         keepdims=True)
            out = (out.astype(jnp.float32) *
                   jax.lax.rsqrt(jnp.maximum(sq, 1e-12))).astype(out.dtype)
        return out


class KeypointHead(nn.Module):
    """Keypoint-mode location head: shared dense stack, three Dense(3)
    outputs k1/k2/k3 (reference net.py:309-313)."""
    nr_dense_layers: int
    branch_size: int
    train_bn: Any = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        from ursonet_tpu.models.resnet import FrozenAwareBN
        for i in range(self.nr_dense_layers):
            x = _dense(self.branch_size, f"loc_dense_{i}", self.dtype,
                       in_axis=None, out_axis='model')(x)
            if self.train_bn:
                x = FrozenAwareBN(self.train_bn, self.dtype,
                                  name=f"loc_bn_{i}")(x, training)
            x = nn.relu(x)
        k1 = _dense(3, "k1_final", self.dtype)(x)
        k2 = _dense(3, "k2_final", self.dtype)(x)
        k3 = _dense(3, "k3_final", self.dtype)(x)
        return k1, k2, k3
