"""Dual-stream ResNet-50 FPN backbone (HFL-style), Flax/NHWC.

Port of lib/model/backbone_FPN_HFL.py: two ResNet-50 streams that SHARE
layer0/layer1/layer4 weights but keep separate layer2/layer3 for the hand vs
object branches; an FPN top-down path per stream down to P2 (stride 4).  For a
256x256 crop the outputs are two (B, 64, 64, 256) maps.

The reference's ResNet variant uses LeakyReLU instead of ReLU
(backbone_FPN_HFL.py:208) — kept.  ImageNet pretrained weights come from a
local torch checkpoint when available (see ``load_torch_resnet50`` in
vpho_tpu/utils/torch_import.py); with zero-egress environments the trunk
trains from scratch.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import TorchBatchNorm, lrelu

kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


class Bottleneck(nn.Module):
    """ResNet-50 bottleneck with LeakyReLU (backbone_FPN_HFL.py:311-350)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, kernel_init=kaiming, dtype=d)(x)
        out = TorchBatchNorm(use_running_average=not train, dtype=d)(out)
        out = lrelu(out)
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, kernel_init=kaiming, dtype=d)(out)
        out = TorchBatchNorm(use_running_average=not train, dtype=d)(out)
        out = lrelu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, kernel_init=kaiming, dtype=d)(out)
        out = TorchBatchNorm(use_running_average=not train, dtype=d)(out)
        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                               use_bias=False, kernel_init=kaiming, dtype=d)(x)
            residual = TorchBatchNorm(use_running_average=not train, dtype=d)(residual)
        return lrelu(out + residual.astype(out.dtype))


class ResLayer(nn.Module):
    """A stack of bottlenecks (torch ``_make_layer``)."""

    planes: int
    blocks: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Bottleneck(self.planes, stride=self.stride, downsample=True,
                       dtype=self.dtype)(x, train=train)
        for _ in range(1, self.blocks):
            x = Bottleneck(self.planes, dtype=self.dtype)(x, train=train)
        return x


class Stem(nn.Module):
    """conv7x7/s2 + BN + LReLU + maxpool3/s2."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    kernel_init=kaiming, dtype=self.dtype)(x)
        x = TorchBatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = lrelu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return x


def _upsample_add(x, y):
    """Bilinear-upsample x to y's spatial size and add (FPN top-down)."""
    B, H, W, C = y.shape
    x_up = jax.image.resize(x, (x.shape[0], H, W, x.shape[-1]), method="bilinear")
    return x_up + y


class FPNBackbone(nn.Module):
    """Hand/object dual-stream FPN (backbone_FPN_HFL.py:20-109).

    Sharing layout per the reference: stem+layer1 computed once, layer4
    applied with the SAME weights to both streams' c4, layer2/layer3 are
    per-stream.  The object P2 top-down reuses the shared c2 lateral input.

    Input: (B, 256, 256, 3) normalized RGB (NHWC).
    Output: (p2_hand, p2_obj), each (B, 64, 64, 256).
    """

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        t, d = train, self.dtype
        if d is not None:
            x = x.astype(d)
        c1 = Stem(name="stem", dtype=d)(x, train=t)               # (B, 64, 64, 64)
        c2 = ResLayer(64, 3, name="layer1", dtype=d)(c1, train=t)  # (B, 64, 64, 256)
        layer4 = ResLayer(512, 3, stride=2, name="layer4", dtype=d)

        c3_h = ResLayer(128, 4, stride=2, name="layer2_h", dtype=d)(c2, train=t)
        c3_o = ResLayer(128, 4, stride=2, name="layer2_o", dtype=d)(c2, train=t)
        c4_h = ResLayer(256, 6, stride=2, name="layer3_h", dtype=d)(c3_h, train=t)
        c4_o = ResLayer(256, 6, stride=2, name="layer3_o", dtype=d)(c3_o, train=t)
        c5_h = layer4(c4_h, train=t)
        c5_o = layer4(c4_o, train=t)  # shared weights (backbone_FPN_HFL.py:85-86)

        # hand top-down.  dtype=d on every FPN conv matters: without it Flax
        # promotes bf16 activations x f32 params -> f32, and the smooth3
        # 3x3 conv at (64, 64, 256->256) alone is ~620 GFLOP/batch at bs=64
        # — running it at the f32 MXU rate costs more than the whole
        # ResNet body at bf16.
        p5_h = nn.Conv(256, (1, 1), name="toplayer_h", dtype=d)(c5_h)
        p4_h = _upsample_add(p5_h, nn.Conv(256, (1, 1), name="latlayer1_h", dtype=d)(c4_h))
        p3_h = _upsample_add(p4_h, nn.Conv(256, (1, 1), name="latlayer2_h", dtype=d)(c3_h))
        p2_h = _upsample_add(p3_h, nn.Conv(256, (1, 1), name="latlayer3_h", dtype=d)(c2))

        # object top-down (lateral at P2 uses shared c2, :98)
        p5_o = nn.Conv(256, (1, 1), name="toplayer_o", dtype=d)(c5_o)
        p4_o = _upsample_add(p5_o, nn.Conv(256, (1, 1), name="latlayer1_o", dtype=d)(c4_o))
        p3_o = _upsample_add(p4_o, nn.Conv(256, (1, 1), name="latlayer2_o", dtype=d)(c3_o))
        p2_o = _upsample_add(p3_o, nn.Conv(256, (1, 1), name="latlayer3_o", dtype=d)(c2))

        p2_h = nn.Conv(256, (3, 3), padding=1, name="smooth3_h", dtype=d)(p2_h)
        p2_o = nn.Conv(256, (3, 3), padding=1, name="smooth3_o", dtype=d)(p2_o)
        # Outputs stay in the policy dtype: the consumers are the three
        # roi_align tent contractions (MXU ops that accumulate f32) and the
        # heatmap/encoder heads, which run under the same policy anyway.
        # Materializing an f32 copy here doubled the (B, 64, 64, 256) x2
        # read traffic of every ROI crop under the bf16 policy.
        return p2_h, p2_o
