"""Datasets and the host input pipeline."""

from ursonet_tpu.data.dataset import Dataset
from ursonet_tpu.data.urso import Urso
from ursonet_tpu.data.speed import Speed

__all__ = ["Dataset", "Urso", "Speed"]
