"""Cost aggregation modules.

  * AdaptiveAggregation — the paper's core ISA + CSA stack
    (reference nets/aggregation.py:313-464)
  * StereoNetAggregation / PSMNetBasic / PSMNetHG / GCNet — swap-in
    baselines for the "-AA" ablations (nets/aggregation.py:70-309)

Correlation volumes are NHWC with the disparity dim D as channels
([B, H_s, W_s, D_s]) so the ISA bottlenecks and CSA fusions are plain 2-D
convs on the MXU. 4-D volumes are NDHWC ([B, D, H, W, C]) for 3-D convs.
"""
from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax.numpy as jnp

from aanet_tpu.models.layers import (
    BasicConv,
    Conv,
    ConvTranspose,
    DeformSimpleBottleneck,
    Norm,
    SimpleBottleneck,
    leaky_relu,
)
from aanet_tpu.ops.precision import compute_dtype
from aanet_tpu.ops.resize import resize_bilinear, resize_trilinear


class AdaptiveAggregationModule(nn.Module):
    """One AAModule: per-scale ISA bottlenecks (D as channels) + full
    cross-scale CSA fusion (reference nets/aggregation.py:313-402)."""

    num_scales: int
    num_output_branches: int
    max_disp: int
    num_blocks: int = 1
    simple_bottleneck: bool = False
    deformable_groups: int = 2
    mdconv_dilation: int = 2

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], train: bool = False):
        assert len(x) == self.num_scales
        x = list(x)

        # Adaptive intra-scale aggregation
        for i in range(self.num_scales):
            d_i = self.max_disp // (2**i)
            for j in range(self.num_blocks):
                if self.simple_bottleneck:
                    x[i] = SimpleBottleneck(d_i, name=f"isa_{i}_{j}")(x[i], train)
                else:
                    x[i] = DeformSimpleBottleneck(
                        d_i,
                        mdconv_dilation=self.mdconv_dilation,
                        deformable_groups=self.deformable_groups,
                        name=f"isa_{i}_{j}",
                    )(x[i], train)

        if self.num_scales == 1:
            return x

        # Adaptive cross-scale aggregation
        fused = []
        for i in range(self.num_output_branches):
            d_i = self.max_disp // (2**i)
            acc = None
            for j in range(self.num_scales):
                d_j = self.max_disp // (2**j)
                if i == j:
                    exch = x[j]
                elif i < j:
                    # coarse -> fine: 1x1 conv + BN, then bilinear upsample
                    exch = Conv(d_i, 1, name=f"fuse_{i}_{j}_conv")(x[j])
                    exch = Norm(name=f"fuse_{i}_{j}_bn")(exch, train)
                    exch = resize_bilinear(exch, (x[i].shape[1], x[i].shape[2]))
                else:
                    # fine -> coarse: chain of stride-2 3x3 convs
                    exch = x[j]
                    for k in range(i - j - 1):
                        exch = Conv(d_j, 3, 2, 1, name=f"fuse_{i}_{j}_down{k}")(exch)
                        exch = Norm(name=f"fuse_{i}_{j}_down{k}_bn")(exch, train)
                        exch = leaky_relu(exch)
                    exch = Conv(d_i, 3, 2, 1, name=f"fuse_{i}_{j}_downF")(exch)
                    exch = Norm(name=f"fuse_{i}_{j}_downF_bn")(exch, train)
                acc = exch if acc is None else acc + exch
            fused.append(leaky_relu(acc))
        return fused


class AdaptiveAggregation(nn.Module):
    """Stack of num_fusions AAModules; the last num_deform_blocks modules
    use deformable ISA; per-scale final 1x1 convs
    (reference nets/aggregation.py:406-464)."""

    max_disp: int
    num_scales: int = 3
    num_fusions: int = 6
    num_stage_blocks: int = 1
    num_deform_blocks: int = 3
    intermediate_supervision: bool = True
    deformable_groups: int = 2
    mdconv_dilation: int = 2
    # Per-AAModule rematerialisation inside the (already-rematted)
    # aggregation stage: the deformable ISA backward otherwise keeps the
    # per-tap gathered rows of ALL 6 fusion modules live at once — at
    # batch 16 288x576 that is 19+ f32[16,96,192,2,128] (288 MB) temps
    # and the step OOMs the v5e's 16 GB HBM (round-5 b16 probe).
    remat: bool = False

    @nn.compact
    def __call__(self, cost_volume: List[jnp.ndarray], train: bool = False):
        assert isinstance(cost_volume, (list, tuple))
        x = list(cost_volume)
        for i in range(self.num_fusions):
            if self.intermediate_supervision:
                num_out = self.num_scales
            else:
                num_out = 1 if i == self.num_fusions - 1 else self.num_scales
            simple = i < self.num_fusions - self.num_deform_blocks
            mod = AdaptiveAggregationModule(
                num_scales=self.num_scales,
                num_output_branches=num_out,
                max_disp=self.max_disp,
                num_blocks=self.num_stage_blocks,
                simple_bottleneck=simple,
                deformable_groups=self.deformable_groups,
                mdconv_dilation=self.mdconv_dilation,
                name=f"fusion_{i}",
            )
            if self.remat and train:
                x = nn.remat(lambda m, v: m(v, True))(mod, x)
            else:
                x = mod(x, train)

        out = []
        for i in range(self.num_scales):
            d_i = self.max_disp // (2**i)
            out.append(
                nn.Conv(
                    d_i,
                    (1, 1),
                    use_bias=True,
                    dtype=compute_dtype(),
                    name=f"final_conv_{i}",
                )(x[i])
            )
            if not self.intermediate_supervision:
                break
        return out  # [1/3, 1/6, 1/12] similarity volumes [B,H_s,W_s,D_s]


def _conv3d_bn_lrelu(x, ch, train, name=None):
    x = Conv(ch, (3, 3, 3), 1, 1, name=None if name is None else name + "_conv")(x)
    x = Norm(name=None if name is None else name + "_bn")(x, train)
    return leaky_relu(x)


class StereoNetAggregation(nn.Module):
    """Four 3-D convs + final 1-channel conv (nets/aggregation.py:70-91).
    Input NDHWC [B, D, H, W, C] -> similarity [B, H, W, D]."""

    @nn.compact
    def __call__(self, cost_volume, train: bool = False):
        assert cost_volume.ndim == 5
        x = cost_volume
        c = x.shape[-1]
        for _ in range(4):
            x = _conv3d_bn_lrelu(x, c, train)
        x = Conv(1, (3, 3, 3), 1, 1, use_bias=True)(x)
        x = x[..., 0]  # [B, D, H, W]
        return jnp.transpose(x, (0, 2, 3, 1))  # [B, H, W, D]


class PSMNetBasicAggregation(nn.Module):
    """12 3-D convs; trilinear x4 upsample (nets/aggregation.py:94-143)."""

    max_disp: int

    @nn.compact
    def __call__(self, cost_volume, train: bool = False):
        def convbn(x, ch, name):
            x = Conv(ch, (3, 3, 3), 1, 1, name=name + "_conv")(x)
            return Norm(name=name + "_bn")(x, train)

        x = cost_volume  # [B, D/4, H/4, W/4, 64]
        x = nn.relu(convbn(x, 32, "dres0a"))
        x = nn.relu(convbn(x, 32, "dres0b"))
        cost0 = x
        for i in range(4):
            y = nn.relu(convbn(cost0, 32, f"dres{i+1}a"))
            y = convbn(y, 32, f"dres{i+1}b")
            cost0 = y + cost0
        x = nn.relu(convbn(cost0, 32, "classify_a"))
        x = Conv(1, (3, 3, 3), 1, 1, name="classify_final")(x)
        b, d, h, w, _ = x.shape
        x = resize_trilinear(x, (4 * d, 4 * h, 4 * w))[..., 0]
        return [jnp.transpose(x, (0, 2, 3, 1))]  # [[B, H, W, 4D]]


class PSMNetHourglass(nn.Module):
    """One PSMNet 3-D hourglass (nets/aggregation.py:147-191)."""

    inplanes: int

    @nn.compact
    def __call__(self, x, presqu, postsqu, train: bool = False):
        def convbn(y, ch, stride, name):
            y = Conv(ch, (3, 3, 3), stride, 1, name=name + "_conv")(y)
            return Norm(name=name + "_bn")(y, train)

        p = self.inplanes
        out = nn.relu(convbn(x, p * 2, 2, "conv1"))  # 1/8
        pre = convbn(out, p * 2, 1, "conv2")
        pre = nn.relu(pre + postsqu) if postsqu is not None else nn.relu(pre)

        out = nn.relu(convbn(pre, p * 2, 2, "conv3"))  # 1/16
        out = nn.relu(convbn(out, p * 2, 1, "conv4"))

        up5 = ConvTranspose(p * 2, (3, 3, 3), 2, 1, 1, name="conv5")(out)
        up5 = Norm(name="conv5_bn")(up5, train)
        post = nn.relu(up5 + (presqu if presqu is not None else pre))

        up6 = ConvTranspose(p, (3, 3, 3), 2, 1, 1, name="conv6")(post)
        up6 = Norm(name="conv6_bn")(up6, train)
        return up6, pre, post


class PSMNetHGAggregation(nn.Module):
    """22 3-D convs, 3 stacked hourglasses, 3 supervision heads
    (nets/aggregation.py:194-257)."""

    max_disp: int

    @nn.compact
    def __call__(self, cost_volume, train: bool = False):
        def convbn(y, ch, name):
            y = Conv(ch, (3, 3, 3), 1, 1, name=name + "_conv")(y)
            return Norm(name=name + "_bn")(y, train)

        x = cost_volume  # [B, D/4, H/4, W/4, 64]
        x = nn.relu(convbn(x, 32, "dres0a"))
        x = nn.relu(convbn(x, 32, "dres0b"))
        y = nn.relu(convbn(x, 32, "dres1a"))
        cost0 = convbn(y, 32, "dres1b") + x

        out1, pre1, post1 = PSMNetHourglass(32, name="hg1")(cost0, None, None, train)
        out1 = out1 + cost0
        out2, pre2, post2 = PSMNetHourglass(32, name="hg2")(out1, pre1, post1, train)
        out2 = out2 + cost0
        out3, pre3, post3 = PSMNetHourglass(32, name="hg3")(out2, pre1, post2, train)
        out3 = out3 + cost0

        def classify(y, name):
            y = nn.relu(convbn(y, 32, name + "_a"))
            return Conv(1, (3, 3, 3), 1, 1, name=name + "_final")(y)

        cost1 = classify(out1, "classif1")
        cost2 = classify(out2, "classif2") + cost1
        cost3 = classify(out3, "classif3") + cost2

        b, d, h, w, _ = cost3.shape
        up = lambda c: jnp.transpose(
            resize_trilinear(c, (4 * d, 4 * h, 4 * w))[..., 0], (0, 2, 3, 1)
        )
        if train:
            return [up(cost1), up(cost2), up(cost3)]
        return [up(cost3)]


class GCNetAggregation(nn.Module):
    """3-D encoder-decoder (nets/aggregation.py:260-309). Input NDHWC at
    H/2; output similarity [B, H', W', D'] (sizes 2*in - 1 on each axis,
    the reference's ConvTranspose3d arithmetic)."""

    @nn.compact
    def __call__(self, cost_volume, train: bool = False):
        def c3(x, ch, stride, name):
            x = Conv(ch, (3, 3, 3), stride, 1, name=name + "_conv")(x)
            x = Norm(name=name + "_bn")(x, train)
            return nn.relu(x)

        def t3(x, ch, name, output_padding=1, bn_relu=True):
            x = ConvTranspose(
                ch, (3, 3, 3), 2, 1, output_padding, name=name + "_conv"
            )(x)
            if bn_relu:
                x = Norm(name=name + "_bn")(x, train)
                x = nn.relu(x)
            return x

        v = cost_volume
        conv1 = c3(c3(v, 32, 1, "conv1a"), 32, 1, "conv1b")  # H/2
        conv2a = c3(v, 64, 2, "conv2a")
        conv2b = c3(c3(conv2a, 64, 1, "conv2b1"), 64, 1, "conv2b2")
        conv3a = c3(conv2a, 64, 2, "conv3a")
        conv3b = c3(c3(conv3a, 64, 1, "conv3b1"), 64, 1, "conv3b2")
        conv4a = c3(conv3a, 64, 2, "conv4a")
        conv4b = c3(c3(conv4a, 64, 1, "conv4b1"), 64, 1, "conv4b2")
        conv5a = c3(conv4a, 128, 2, "conv5a")
        conv5b = c3(c3(conv5a, 128, 1, "conv5b1"), 128, 1, "conv5b2")
        t1 = t3(conv5b, 64, "trans1")
        t2 = t3(t1 + conv4b, 64, "trans2")
        t3_ = t3(t2 + conv3b, 64, "trans3")
        t4 = t3(t3_ + conv2b, 32, "trans4")
        t5 = t3(t4 + conv1, 1, "trans5", output_padding=0, bn_relu=False)
        out = t5[..., 0]  # [B, D', H', W']
        return jnp.transpose(out, (0, 2, 3, 1))
