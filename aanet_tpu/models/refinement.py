"""Disparity refinement modules (reference nets/refinement.py).

All three upsample the incoming low-res disparity to the (possibly
downscaled) image resolution with the upsample-x-rescale rule, then
predict a residual and clamp at zero with relu.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from aanet_tpu.models.layers import (
    BasicBlock,
    BasicConv,
    Conv,
    Conv2x,
    DeformConv2dLayer,
    Norm,
    leaky_relu,
)
from aanet_tpu.ops.precision import compute_dtype
from aanet_tpu.ops.resize import resize_bilinear
from aanet_tpu.ops.s2d import depth_to_space, space_to_depth
from aanet_tpu.ops.warp import disp_warp

_DILATIONS = (1, 2, 4, 8, 1, 1)

# The StereoNet/StereoDRNet heads run 3x3 convs with 16-32 channels at up
# to full image resolution — measured 5.5 TF/s on the MXU vs 39 TF/s at
# 128 channels (docs/PERF_r05.md). When H and W are even the whole head
# executes in space-to-depth(2) layout (ops/s2d.py): exactly the same
# math, 4x the channel width. Parameters are identical either way.


def _use_s2d(img) -> bool:
    return img.shape[1] % 2 == 0 and img.shape[2] % 2 == 0


def _block_apply(mod, use_remat: bool, train: bool, *args):
    """Apply a submodule, optionally under per-block rematerialisation.

    Refinement runs at (up to) full image resolution where a 32-channel
    f32 activation pads 4x on the 128-lane axis — without block-level
    remat the stage backward holds one padded buffer per block and OOMs
    16 GB HBM at production batch sizes.
    """
    if use_remat and train:
        n = len(args)
        if n == 1:
            return nn.remat(lambda m, a: m(a, True))(mod, *args)
        if n == 2:
            return nn.remat(lambda m, a, b: m(a, b, True))(mod, *args)
        raise NotImplementedError(n)
    return mod(*args, train)


def _upsample_to_img(low_disp, img):
    """[B, h, w] -> [B, H, W, 1] scaled by W/w (nets/refinement.py:43-47)."""
    h, w = img.shape[1:3]
    scale = w / low_disp.shape[2]
    disp = low_disp
    if scale != 1.0:
        disp = resize_bilinear(low_disp, (h, w)) * scale
    return disp[..., None]


class StereoNetRefinement(nn.Module):
    """Edge-aware residual refine on [disp, left] (nets/refinement.py:18-57)."""

    remat: bool = False

    @nn.compact
    def __call__(self, low_disp, left_img, right_img=None, train: bool = False):
        assert low_disp.ndim == 3
        disp = _upsample_to_img(low_disp, left_img)
        s2d = _use_s2d(left_img)
        x = jnp.concatenate([disp, left_img], axis=-1)
        if s2d:
            x = space_to_depth(x)
        x = Conv(32, 3, 1, 1, s2d=s2d)(x)
        x = Norm(s2d=s2d)(x, train)
        x = leaky_relu(x)
        for d in _DILATIONS:
            x = _block_apply(
                BasicBlock(32, dilation=d, leaky=True, s2d=s2d),
                self.remat, train, x,
            )
        residual = Conv(
            1, 3, 1, 1, use_bias=True,
            kernel_init=nn.initializers.lecun_normal(), s2d=s2d,
        )(x)
        if s2d:
            residual = depth_to_space(residual)
        disp = nn.relu(disp + residual)
        return disp[..., 0]


class StereoDRNetRefinement(nn.Module):
    """Warp-error-driven refinement (nets/refinement.py:60-106)."""

    remat: bool = False

    @nn.compact
    def __call__(self, low_disp, left_img, right_img, train: bool = False):
        assert low_disp.ndim == 3
        disp = _upsample_to_img(low_disp, left_img)
        warped_right = disp_warp(right_img, disp[..., 0])[0]
        error = warped_right - left_img

        s2d = _use_s2d(left_img)
        concat1 = jnp.concatenate([error, left_img], axis=-1)  # 6ch
        disp_in = disp
        if s2d:
            concat1 = space_to_depth(concat1)  # 24ch
            disp_in = space_to_depth(disp)  # 4ch
        conv1 = Conv(16, 3, 1, 1, s2d=s2d)(concat1)
        conv1 = Norm(s2d=s2d)(conv1, train)
        conv1 = leaky_relu(conv1)
        conv2 = Conv(16, 3, 1, 1, s2d=s2d)(disp_in)
        conv2 = Norm(s2d=s2d)(conv2, train)
        conv2 = leaky_relu(conv2)
        if s2d:
            # full-res concat([a, b]) corresponds per PHASE in s2d layout:
            # interleave so the canonical [.., 32, ..] kernels see (phase,
            # [a;b]) channel order, same as space_to_depth of the full-res
            # concat would produce.
            b_, hh, ww, _ = conv1.shape
            x = jnp.concatenate(
                [conv1.reshape(b_, hh, ww, 4, 16),
                 conv2.reshape(b_, hh, ww, 4, 16)],
                axis=-1,
            ).reshape(b_, hh, ww, 128)
        else:
            x = jnp.concatenate([conv1, conv2], axis=-1)  # 32ch
        for d in _DILATIONS:
            x = _block_apply(
                BasicBlock(32, dilation=d, leaky=True, s2d=s2d),
                self.remat, train, x,
            )
        residual = Conv(
            1, 3, 1, 1, use_bias=True,
            kernel_init=nn.initializers.lecun_normal(), s2d=s2d,
        )(x)
        if s2d:
            residual = depth_to_space(residual)
        disp = nn.relu(disp + residual)
        return disp[..., 0]


class HourglassRefinement(nn.Module):
    """Deformable hourglass refinement (AANet+, nets/refinement.py:109-202).
    Spatial size must be divisible by 16."""

    remat: bool = False

    @nn.compact
    def __call__(self, low_disp, left_img, right_img, train: bool = False):
        assert low_disp.ndim == 3
        disp = _upsample_to_img(low_disp, left_img)
        warped_right = disp_warp(right_img, disp[..., 0])[0]
        error = warped_right - left_img

        concat1 = jnp.concatenate([error, left_img], axis=-1)
        conv1 = Conv(16, 3, 1, 1)(concat1)
        conv1 = Norm()(conv1, train)
        conv1 = leaky_relu(conv1)
        conv2 = Conv(16, 3, 1, 1)(disp)
        conv2 = Norm()(conv2, train)
        conv2 = leaky_relu(conv2)
        x = jnp.concatenate([conv1, conv2], axis=-1)  # 32ch

        def blk(mod, *args):
            return _block_apply(mod, self.remat, train, *args)

        x = DeformConv2dLayer(32)(x)
        rem0 = x
        x = blk(BasicConv(48, 3, 2, 1), x)
        rem1 = x
        x = blk(BasicConv(64, 3, 2, 1), x)
        rem2 = x
        x = DeformConv2dLayer(96, stride=2)(x)
        rem3 = x
        x = DeformConv2dLayer(128, stride=2)(x)
        rem4 = x

        x = blk(Conv2x(96, deconv=True), x, rem3)
        rem3 = x
        x = blk(Conv2x(64, deconv=True), x, rem2)
        rem2 = x
        x = blk(Conv2x(48, deconv=True), x, rem1)
        rem1 = x
        x = blk(Conv2x(32, deconv=True), x, rem0)
        rem0 = x

        x = blk(Conv2x(48), x, rem1)
        rem1 = x
        x = blk(Conv2x(64), x, rem2)
        rem2 = x
        x = blk(Conv2x(96, mdconv=True), x, rem3)
        rem3 = x
        x = blk(Conv2x(128, mdconv=True), x, rem4)

        x = blk(Conv2x(96, deconv=True), x, rem3)
        x = blk(Conv2x(64, deconv=True), x, rem2)
        x = blk(Conv2x(48, deconv=True), x, rem1)
        x = blk(Conv2x(32, deconv=True), x, rem0)

        residual = nn.Conv(
            1, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
            dtype=compute_dtype(),
        )(x)
        disp = nn.relu(disp + residual)
        return disp[..., 0]
