"""Feature extractors + feature pyramids.

Re-creations of the reference's extractor menu:
  * AANetFeature    — "ResNet-40" 3-scale pyramid (nets/resnet.py:102-194)
  * StereoNetFeature — H/8 single-scale          (nets/feature.py:79-113)
  * PSMNetFeature   — SPP, H/4 single-scale      (nets/feature.py:234-310)
  * GANetFeature    — hourglass UNet, H/3        (nets/feature.py:379-460)
  * GCNetFeature    — H/2 single-scale           (nets/feature.py:463-493)
  * FeaturePyramid  — 1-scale -> 3-scale strided pyramid (nets/feature.py:150-179)
  * FeaturePyramidNetwork — 3-scale top-down FPN (nets/feature.py:182-231)
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from aanet_tpu.models.layers import (
    BasicBlock,
    BasicConv,
    Bottleneck,
    Conv,
    Conv2x,
    ConvBNAct,
    DeformBottleneck,
    DeformConv2dLayer,
    Norm,
    leaky_relu,
    xavier_uniform,
)
from aanet_tpu.ops.precision import compute_dtype
from aanet_tpu.ops.resize import resize_bilinear, resize_nearest


class AANetFeature(nn.Module):
    """ResNet-40 backbone: 7x7/s3 stem, Bottleneck stacks [3,4,6] at
    H/3, H/6, H/12 (channels 128/256/512); layer3 deformable by default."""

    in_channels: int = 32
    feature_mdconv: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.in_channels
        x = Conv(c, 7, 3, 3)(x)
        x = Norm()(x, train)
        x = nn.relu(x)

        for i in range(3):  # layer1: H/3, 128ch
            x = Bottleneck(c, stride=1, downsample=(i == 0))(x, train)
        layer1 = x
        for i in range(4):  # layer2: H/6, 256ch
            x = Bottleneck(c * 2, stride=2 if i == 0 else 1)(x, train)
        layer2 = x
        block = DeformBottleneck if self.feature_mdconv else Bottleneck
        for i in range(6):  # layer3: H/12, 512ch
            x = block(c * 4, stride=2 if i == 0 else 1)(x, train)
        layer3 = x
        return [layer1, layer2, layer3]


class StereoNetFeature(nn.Module):
    """3x (conv5x5 stride-2) + 6 residual blocks, 32ch at H/2^k."""

    num_downsample: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.num_downsample):
            x = Conv(32, 5, 2, 2, use_bias=False)(x)
            x = Norm()(x, train)
            x = nn.relu(x)
        for _ in range(6):
            x = BasicBlock(32, leaky=True)(x, train)
        x = Conv(32, 3, 1, 1)(x)  # final conv: no bn/relu
        return x


class PSMNetBasicBlock(nn.Module):
    """PSMNet residual block — NOTE: no relu after the residual add
    (reference nets/feature.py:123-147)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.dilation if self.dilation > 1 else 1
        out = Conv(self.planes, 3, self.stride, pad, self.dilation)(x)
        out = Norm()(out, train)
        out = nn.relu(out)
        out = Conv(self.planes, 3, 1, pad, self.dilation)(out)
        out = Norm()(out, train)
        if self.downsample or self.stride != 1 or x.shape[-1] != self.planes:
            x = Conv(self.planes, 1, self.stride)(x)
            x = Norm()(x, train)
        return out + x


class PSMNetFeature(nn.Module):
    """PSMNet extractor with spatial pyramid pooling, 32ch at H/4."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        def convbn_relu(y, ch, k, s, p, d):
            y = Conv(ch, k, s, p if d == 1 else d, d)(y)
            y = Norm()(y, train)
            return nn.relu(y)

        x = convbn_relu(x, 32, 3, 2, 1, 1)
        x = convbn_relu(x, 32, 3, 1, 1, 1)
        x = convbn_relu(x, 32, 3, 1, 1, 1)  # H/2

        for i in range(3):
            x = PSMNetBasicBlock(32)(x, train)
        for i in range(16):
            x = PSMNetBasicBlock(64, stride=2 if i == 0 else 1)(x, train)
        output_raw = x  # H/4, 64ch
        for i in range(3):
            x = PSMNetBasicBlock(128, downsample=(i == 0))(x, train)
        for i in range(3):
            x = PSMNetBasicBlock(128, dilation=2)(x, train)
        output_skip = x  # H/4, 128ch

        h, w = output_skip.shape[1:3]
        if h < 64 or w < 64:
            raise ValueError(
                f"PSMNetFeature: H/4 feature map is {h}x{w} but the SPP "
                "branches pool fixed 64px windows (reference "
                "nets/feature.py:250-265) — the input image must be at "
                f"least 256x256 (got {h * 4}x{w * 4})."
            )
        branches = []
        for pool in (64, 32, 16, 8):
            b = nn.avg_pool(
                output_skip, (pool, pool), strides=(pool, pool), padding="VALID"
            )
            b = Conv(32, 1, 1, 0)(b)
            b = Norm()(b, train)
            b = nn.relu(b)
            branches.append(resize_bilinear(b, (h, w)))

        cat = jnp.concatenate([output_raw, output_skip] + branches[::-1], axis=-1)
        out = convbn_relu(cat, 128, 3, 1, 1, 1)
        out = Conv(32, 1, 1, 0)(out)
        return out


class GANetFeature(nn.Module):
    """Stacked-hourglass UNet feature (H/3, 32ch); optionally deformable."""

    feature_mdconv: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicConv(32, 3, 1, 1)(x, train)
        x = BasicConv(32, 5, 3, 2)(x, train)  # H/3
        if self.feature_mdconv:
            x = DeformConv2dLayer(32)(x)
        else:
            x = BasicConv(32, 3, 1, 1)(x, train)

        rem0 = x
        x = BasicConv(48, 3, 2, 1)(x, train)
        rem1 = x
        x = BasicConv(64, 3, 2, 1)(x, train)
        rem2 = x
        if self.feature_mdconv:
            x = DeformConv2dLayer(96, stride=2)(x)
            rem3 = x
            x = DeformConv2dLayer(128, stride=2)(x)
        else:
            x = BasicConv(96, 3, 2, 1)(x, train)
            rem3 = x
            x = BasicConv(128, 3, 2, 1)(x, train)
        rem4 = x

        x = Conv2x(96, deconv=True)(x, rem3, train)
        rem3 = x
        x = Conv2x(64, deconv=True)(x, rem2, train)
        rem2 = x
        x = Conv2x(48, deconv=True)(x, rem1, train)
        rem1 = x
        x = Conv2x(32, deconv=True)(x, rem0, train)
        rem0 = x

        x = Conv2x(48)(x, rem1, train)
        rem1 = x
        x = Conv2x(64)(x, rem2, train)
        rem2 = x
        x = Conv2x(96, mdconv=self.feature_mdconv)(x, rem3, train)
        rem3 = x
        x = Conv2x(128, mdconv=self.feature_mdconv)(x, rem4, train)

        x = Conv2x(96, deconv=True)(x, rem3, train)
        x = Conv2x(64, deconv=True)(x, rem2, train)
        x = Conv2x(48, deconv=True)(x, rem1, train)
        x = Conv2x(32, deconv=True)(x, rem0, train)  # [B, H/3, W/3, 32]
        return x


class GCNetFeature(nn.Module):
    """conv5x5/s2 + 8 residual blocks + conv3x3, 32ch at H/2."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(32, 5, 2, 2, use_bias=False)(x)
        x = Norm()(x, train)
        x = nn.relu(x)
        for _ in range(8):
            x = PSMNetBasicBlock(32)(x, train)
        x = Conv(32, 3, 1, 1)(x)
        return x


class FeaturePyramid(nn.Module):
    """1-scale -> 3-scale strided-conv pyramid (AANet+; channels x2, x4)."""

    in_channel: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.in_channel

        def down_block(y, ch):
            y = Conv(ch, 3, 2, 1)(y)
            y = Norm()(y, train)
            y = leaky_relu(y)
            y = Conv(ch, 1, 1, 0)(y)
            y = Norm()(y, train)
            y = leaky_relu(y)
            return y

        out1 = down_block(x, c * 2)  # H/2 of input scale
        out2 = down_block(out1, c * 4)  # H/4
        return [x, out1, out2]


class FeaturePyramidNetwork(nn.Module):
    """Top-down FPN with lateral 1x1s, 128 out channels (AANet)."""

    out_channels: int = 128
    num_levels: int = 3

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == self.num_levels
        laterals = [
            nn.Conv(
                self.out_channels,
                (1, 1),
                use_bias=True,
                kernel_init=xavier_uniform,
                dtype=compute_dtype(),
                name=f"lateral_{i}",
            )(inputs[i])
            for i in range(self.num_levels)
        ]
        for i in range(self.num_levels - 1, 0, -1):
            up = resize_nearest(
                laterals[i], (laterals[i - 1].shape[1], laterals[i - 1].shape[2])
            )
            laterals[i - 1] = laterals[i - 1] + up
        outs = []
        for i in range(self.num_levels):
            y = nn.Conv(
                self.out_channels,
                (3, 3),
                padding=[(1, 1), (1, 1)],
                use_bias=True,
                kernel_init=xavier_uniform,
                dtype=compute_dtype(),
                name=f"fpn_{i}",
            )(laterals[i])
            y = Norm()(y, train)
            outs.append(nn.relu(y))
        return outs
