"""The full UrsoNet model: backbone → bottleneck conv → dual heads.

Assembles the graph of the reference UrsoNet.build (net.py:581-699):
backbone C5 features → stride-2 3×3 bottleneck conv ('bottleneck_layer',
net.py:639) → NHWC flatten → location + orientation heads. Returns a dict
of raw head outputs; losses live in ursonet_tpu/train/losses.py and are
applied by the training step (the reference attaches them as graph Lambda
layers, net.py:656-669 — here they are ordinary functions of the outputs).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from ursonet_tpu.models.heads import KeypointHead, PoseHead
from ursonet_tpu.models.resnet import make_backbone


class UrsoNetModule(nn.Module):
    """Flax module for the full network.

    Configured from a `Config` snapshot (plain fields so the module is
    hashable / jit-stable).
    """
    backbone: str = 'resnet50'
    bottleneck_width: int = 128
    branch_size: int = 1024
    nr_dense_layers: int = 1
    regress_loc: bool = True
    regress_ori: bool = True
    regress_keypoints: bool = False
    orientation_param: str = 'quaternion'
    loc_bins: int = 16
    ori_bins: int = 32
    train_bn: Any = False
    dtype: Any = jnp.float32
    stem_s2d: bool = False
    remat: Any = False
    act_q8: bool = False
    inner_mult: float = 1.0

    @nn.compact
    def __call__(self, images, training: bool = False) -> Dict[str, jnp.ndarray]:
        x = images.astype(self.dtype)
        c5 = make_backbone(self.backbone, self.train_bn, self.dtype,
                           self.stem_s2d, self.remat,
                           self.act_q8, self.inner_mult)(x, training)
        c6 = nn.Conv(self.bottleneck_width, (3, 3), strides=(2, 2),
                     padding='SAME', name='bottleneck_layer',
                     dtype=self.dtype)(c5)
        feats = c6.reshape(c6.shape[0], -1)  # NHWC row-major (net.py:298)

        outputs: Dict[str, jnp.ndarray] = {}
        if self.regress_keypoints:
            k1, k2, k3 = KeypointHead(
                self.nr_dense_layers, self.branch_size, self.train_bn,
                self.dtype, name='loc_head')(feats, training)
            outputs['loc'] = k1.astype(jnp.float32)
            outputs['k1'] = k2.astype(jnp.float32)
            outputs['k2'] = k3.astype(jnp.float32)
            return outputs

        if self.regress_loc:
            loc_feats, loc_act = 3, 'linear'
        else:
            loc_feats, loc_act = self.loc_bins ** 3, 'relu'
        outputs['loc'] = PoseHead(
            'loc', self.nr_dense_layers, self.branch_size, loc_feats,
            loc_act, 'loc_final', self.train_bn, self.dtype,
            name='loc_head')(feats, training).astype(jnp.float32)

        if self.regress_ori:
            if self.orientation_param == 'quaternion':
                ori_feats, ori_act, ori_name = 4, 'l2norm', 'ori_q'
            else:
                ori_feats, ori_act, ori_name = 3, 'linear', 'ori_final'
        else:
            ori_feats, ori_act, ori_name = self.ori_bins ** 3, 'relu', 'ori_final'
        outputs['ori'] = PoseHead(
            'ori', self.nr_dense_layers, self.branch_size, ori_feats,
            ori_act, ori_name, self.train_bn, self.dtype,
            name='ori_head')(feats, training).astype(jnp.float32)
        return outputs


def build_model(config) -> UrsoNetModule:
    """Instantiate the module from a Config (reference UrsoNet.build,
    net.py:581). Validates the %64 image-shape contract (net.py:596-600)."""
    h, w = int(config.IMAGE_SHAPE[0]), int(config.IMAGE_SHAPE[1])
    if h % 64 or w % 64:
        raise ValueError(
            "Image size must be dividable by 2 at least 6 times; got "
            f"{h}x{w}. Use 256, 320, 384, 448, 512, ...")
    return UrsoNetModule(
        backbone=config.BACKBONE,
        bottleneck_width=config.BOTTLENECK_WIDTH,
        branch_size=config.BRANCH_SIZE,
        nr_dense_layers=config.NR_DENSE_LAYERS,
        regress_loc=config.REGRESS_LOC,
        regress_ori=config.REGRESS_ORI,
        regress_keypoints=config.REGRESS_KEYPOINTS,
        orientation_param=config.ORIENTATION_PARAM,
        loc_bins=config.LOC_BINS_PER_DIM,
        ori_bins=config.ORI_BINS_PER_DIM,
        train_bn=config.TRAIN_BN,
        dtype=config.compute_dtype,
        stem_s2d=bool(getattr(config, 'STEM_SPACE_TO_DEPTH', False)),
        remat=getattr(config, 'REMAT', False),
        act_q8=getattr(config, 'TRAIN_ACT_Q8', False),
        inner_mult=float(getattr(config, 'INNER_WIDTH_MULT', 1.0)),
    )
