"""ursonet_tpu — a TPU-native monocular spacecraft pose-estimation framework.

A ground-up JAX/XLA/Flax/Pallas re-design of the capabilities of the
UrsoNet reference (TF1/Keras): ResNet backbone + dual location/orientation
heads with soft-classification or regression outputs, URSO/SPEED dataset
adapters, on-device augmentation, data/tensor-parallel training over a
`jax.sharding.Mesh`, checkpoint/resume, evaluation with the ESA score,
and an ESA-challenge submission writer.

Public surface mirrors the reference driver (pose_estimator.py) while the
internals are TPU-first: everything on the compute path is jit-compiled
with static shapes, batched, and sharded via pjit/shard_map.
"""

from ursonet_tpu.config import Config

__version__ = "0.1.0"

__all__ = ["Config", "UrsoNet", "QuantizedModel", "evaluate",
           "__version__"]


def __getattr__(name):
    # Lazy top-level API (keeps `import ursonet_tpu` cheap — jax/flax load
    # only when the engine or evaluation entry points are touched).
    if name == "UrsoNet":
        from ursonet_tpu.engine import UrsoNet
        return UrsoNet
    if name == "QuantizedModel":
        from ursonet_tpu.models.quant import QuantizedModel
        return QuantizedModel
    if name == "evaluate":
        from ursonet_tpu import evaluate
        return evaluate
    raise AttributeError(name)
