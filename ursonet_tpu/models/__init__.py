"""Model graphs: ResNet backbones, bottleneck + dual pose heads."""

from ursonet_tpu.models.ursonet import UrsoNetModule, build_model

__all__ = ["UrsoNetModule", "build_model"]
