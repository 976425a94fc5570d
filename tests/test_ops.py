"""Numerics tests for aanet_tpu.ops against naive references and torch-CPU
oracles (torch ships in the image; it is used ONLY as a test oracle)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aanet_tpu import ops


def rng(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


# ---------------------------------------------------------------------------
# Cost volume
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("w,d,tile", [(37, 8, 16), (64, 16, 128), (130, 12, 32)])
def test_correlation_banded_matches_reference(w, d, tile):
    left = jnp.asarray(rng(2, 5, w, 16, seed=1))
    right = jnp.asarray(rng(2, 5, w, 16, seed=2))
    ref = ops.cost_volume.__globals__["correlation_cost_volume_reference"](
        left, right, d
    )
    fast = ops.correlation_cost_volume(left, right, d, tile_w=tile)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fast), atol=1e-4)


def test_correlation_zero_fill_region():
    left = jnp.ones((1, 2, 10, 4))
    right = jnp.ones((1, 2, 10, 4))
    cost = ops.correlation_cost_volume(left, right, 6)
    cost = np.asarray(cost)
    for dd in range(6):
        assert np.all(cost[:, :, :dd, dd] == 0.0), dd
        assert np.allclose(cost[:, :, dd:, dd], 1.0), dd


def test_correlation_matches_torch_loop():
    """Oracle: the reference's exact torch loop (nets/cost.py:40-48)."""
    import torch

    b, c, h, w, d = 1, 8, 4, 33, 7
    l_nchw = rng(b, c, h, w, seed=3)
    r_nchw = rng(b, c, h, w, seed=4)
    lt, rt = torch.from_numpy(l_nchw), torch.from_numpy(r_nchw)
    cost_t = torch.zeros(b, d, h, w)
    for i in range(d):
        if i > 0:
            cost_t[:, i, :, i:] = (lt[:, :, :, i:] * rt[:, :, :, :-i]).mean(dim=1)
        else:
            cost_t[:, i] = (lt * rt).mean(dim=1)
    ours = ops.correlation_cost_volume(
        jnp.asarray(l_nchw.transpose(0, 2, 3, 1)),
        jnp.asarray(r_nchw.transpose(0, 2, 3, 1)),
        d,
    )
    np.testing.assert_allclose(
        cost_t.numpy(), np.asarray(ours).transpose(0, 3, 1, 2), atol=1e-4
    )


def test_difference_and_concat_volumes():
    left = jnp.asarray(rng(1, 3, 9, 4, seed=5))
    right = jnp.asarray(rng(1, 3, 9, 4, seed=6))
    d = 4
    diff = np.asarray(ops.difference_cost_volume(left, right, d))
    cat = np.asarray(ops.concat_cost_volume(left, right, d))
    assert diff.shape == (1, d, 3, 9, 4)
    assert cat.shape == (1, d, 3, 9, 8)
    # d=2, w=5: L[...,5,:] - R[...,3,:]
    np.testing.assert_allclose(
        diff[0, 2, :, 5], np.asarray(left)[0, :, 5] - np.asarray(right)[0, :, 3]
    )
    np.testing.assert_allclose(cat[0, 2, :, 1], 0.0)  # w < d zero-filled
    np.testing.assert_allclose(cat[0, 2, :, 5, :4], np.asarray(left)[0, :, 5])
    np.testing.assert_allclose(cat[0, 2, :, 5, 4:], np.asarray(right)[0, :, 3])


# ---------------------------------------------------------------------------
# Soft-argmin
# ---------------------------------------------------------------------------


def test_soft_argmin_delta_volume():
    """A sharply peaked similarity at d0 must give disparity ~= d0."""
    d = 24
    cost = np.zeros((1, 2, 3, d), np.float32)
    cost[..., 7] = 100.0
    disp = ops.soft_argmin(jnp.asarray(cost), match_similarity=True)
    np.testing.assert_allclose(np.asarray(disp), 7.0, atol=1e-4)
    # cost (not similarity): the *minimum* wins after negation
    cost2 = np.full((1, 2, 3, d), 50.0, np.float32)
    cost2[..., 11] = -50.0
    disp2 = ops.soft_argmin(jnp.asarray(cost2), match_similarity=False)
    np.testing.assert_allclose(np.asarray(disp2), 11.0, atol=1e-4)


def test_soft_argmin_matches_torch():
    import torch
    import torch.nn.functional as F

    cost = rng(2, 4, 5, 16, seed=7)
    t = torch.from_numpy(cost.transpose(0, 3, 1, 2))  # [B, D, H, W]
    prob = F.softmax(t, dim=1)
    cand = torch.arange(16).float().view(1, 16, 1, 1)
    want = (prob * cand).sum(1)
    got = ops.soft_argmin(jnp.asarray(cost))
    np.testing.assert_allclose(want.numpy(), np.asarray(got), atol=1e-5)


# ---------------------------------------------------------------------------
# Resize
# ---------------------------------------------------------------------------


def test_resize_bilinear_matches_torch_align_corners_false():
    import torch
    import torch.nn.functional as F

    x = rng(2, 3, 13, 17, seed=8)  # NCHW for torch
    want = F.interpolate(
        torch.from_numpy(x), size=(7, 29), mode="bilinear", align_corners=False
    ).numpy()
    got = ops.resize_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), (7, 29))
    np.testing.assert_allclose(want, np.asarray(got).transpose(0, 3, 1, 2), atol=1e-5)


def test_resize_nearest_matches_torch_scale2():
    import torch
    import torch.nn.functional as F

    x = rng(1, 2, 6, 5, seed=9)
    want = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="nearest").numpy()
    got = ops.resize_nearest(jnp.asarray(x.transpose(0, 2, 3, 1)), (12, 10))
    np.testing.assert_allclose(want, np.asarray(got).transpose(0, 3, 1, 2))


def test_upsample_disparity_rescales_values():
    disp = jnp.ones((1, 4, 8))
    up = ops.upsample_disparity(disp, (8, 16))
    np.testing.assert_allclose(np.asarray(up), 2.0, atol=1e-5)


# ---------------------------------------------------------------------------
# Warp
# ---------------------------------------------------------------------------


def test_disp_warp_matches_torch_grid_sample():
    import torch
    import torch.nn.functional as F

    b, c, h, w = 1, 3, 6, 20
    img = rng(b, c, h, w, seed=10)
    disp = (np.random.RandomState(11).rand(b, h, w) * 5).astype(np.float32)

    timg = torch.from_numpy(img)
    tdisp = torch.from_numpy(disp).unsqueeze(1)
    xr = torch.arange(w).float().view(1, 1, w).expand(1, h, w)
    yr = torch.arange(h).float().view(1, h, 1).expand(1, h, w)
    grid = torch.cat(
        (xr.unsqueeze(1) - tdisp, yr.unsqueeze(1).expand(b, 1, h, w)), 1
    )
    grid[:, 0] = 2 * grid[:, 0] / (w - 1) - 1
    grid[:, 1] = 2 * grid[:, 1] / (h - 1) - 1
    grid = grid.permute(0, 2, 3, 1)
    want = F.grid_sample(
        timg, grid, mode="bilinear", padding_mode="border", align_corners=True
    ).numpy()
    want_mask = F.grid_sample(
        torch.ones_like(timg), grid, padding_mode="zeros", align_corners=True
    ).numpy()
    want_mask = (want_mask >= 0.9999).astype(np.float32)

    got, got_mask = ops.disp_warp(
        jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(disp)
    )
    np.testing.assert_allclose(want, np.asarray(got).transpose(0, 3, 1, 2), atol=1e-5)
    np.testing.assert_allclose(
        want_mask[:, :1], np.asarray(got_mask).transpose(0, 3, 1, 2), atol=1e-5
    )


# ---------------------------------------------------------------------------
# Deformable conv
# ---------------------------------------------------------------------------


def _dilated_conv_nhwc(x, weight, stride, padding, dilation):
    return jax.lax.conv_general_dilated(
        x,
        weight,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize("stride,dilation,g", [(1, 1, 1), (1, 2, 2), (2, 2, 2)])
def test_deform_conv_zero_offset_equals_dilated_conv(stride, dilation, g):
    """The zero-init anchor (reference nets/deform.py:74-76): zero offsets
    and unit mask must reproduce a regular dilated conv exactly."""
    b, h, w, cin, cout, k = 2, 9, 11, 8, 6, 3
    x = jnp.asarray(rng(b, h, w, cin, seed=12))
    weight = jnp.asarray(rng(k, k, cin, cout, seed=13) * 0.1)
    pad = dilation
    ho = (h + 2 * pad - (dilation * (k - 1) + 1)) // stride + 1
    wo = (w + 2 * pad - (dilation * (k - 1) + 1)) // stride + 1
    offset = jnp.zeros((b, ho, wo, g * k * k * 2))
    mask = jnp.ones((b, ho, wo, g * k * k))

    got = ops.modulated_deform_conv2d(
        x, offset, mask, weight,
        stride=stride, padding=pad, dilation=dilation, deformable_groups=g,
    )
    want = _dilated_conv_nhwc(x, weight, stride, pad, dilation)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-4)


def test_deform_conv_integer_offset_equals_shifted_conv():
    """A constant integer offset (dy=0, dx=1) equals convolving a shifted
    input (away from the boundary)."""
    b, h, w, cin, cout, k = 1, 8, 12, 4, 5, 3
    x = jnp.asarray(rng(b, h, w, cin, seed=14))
    weight = jnp.asarray(rng(k, k, cin, cout, seed=15) * 0.1)
    offset = np.zeros((b, h, w, k * k, 2), np.float32)
    offset[..., 1] = 1.0  # dx = +1 for every tap
    got = ops.modulated_deform_conv2d(
        x, jnp.asarray(offset.reshape(b, h, w, -1)), None, weight,
        stride=1, padding=1, dilation=1, deformable_groups=1,
    )
    shifted = jnp.pad(x[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
    want = _dilated_conv_nhwc(shifted, weight, 1, 1, 1)
    # interior only (boundary columns differ through zero-padding)
    np.testing.assert_allclose(
        np.asarray(want)[:, 1:-1, 1:-3], np.asarray(got)[:, 1:-1, 1:-3], atol=1e-4
    )


def test_deform_conv_fractional_offset_bilinear():
    """dx=0.5 on a 1x1 kernel == average of neighbours."""
    b, h, w, c = 1, 4, 6, 3
    x = jnp.asarray(rng(b, h, w, c, seed=16))
    weight = jnp.eye(c).reshape(1, 1, c, c)
    offset = np.zeros((b, h, w, 2), np.float32)
    offset[..., 1] = 0.5
    got = ops.modulated_deform_conv2d(
        x, jnp.asarray(offset.reshape(b, h, w, -1)), None, weight,
        stride=1, padding=0, dilation=1, deformable_groups=1,
    )
    want = 0.5 * (np.asarray(x)[:, :, :-1] + np.asarray(x)[:, :, 1:])
    np.testing.assert_allclose(want, np.asarray(got)[:, :, :-1], atol=1e-5)


def test_deform_conv_mask_modulation():
    """mask=0 kills the output; mask scales linearly."""
    b, h, w, cin, cout, k = 1, 6, 6, 4, 4, 3
    x = jnp.asarray(rng(b, h, w, cin, seed=17))
    weight = jnp.asarray(rng(k, k, cin, cout, seed=18) * 0.1)
    offset = jnp.zeros((b, h, w, k * k * 2))
    out0 = ops.modulated_deform_conv2d(
        x, offset, jnp.zeros((b, h, w, k * k)), weight, padding=1
    )
    np.testing.assert_allclose(np.asarray(out0), 0.0, atol=1e-6)
    out_half = ops.modulated_deform_conv2d(
        x, offset, jnp.full((b, h, w, k * k), 0.5), weight, padding=1
    )
    out_full = ops.modulated_deform_conv2d(
        x, offset, jnp.ones((b, h, w, k * k)), weight, padding=1
    )
    np.testing.assert_allclose(
        np.asarray(out_half) * 2, np.asarray(out_full), atol=1e-4
    )


def test_deform_conv_gradients_flow():
    b, h, w, cin, cout, k, g = 1, 5, 7, 4, 3, 3, 2
    x = jnp.asarray(rng(b, h, w, cin, seed=19))
    weight = jnp.asarray(rng(k, k, cin, cout, seed=20) * 0.1)
    offset = jnp.asarray(rng(b, h, w, g * k * k * 2, seed=21) * 0.3)
    mask = jax.nn.sigmoid(jnp.asarray(rng(b, h, w, g * k * k, seed=22)))

    def loss(x, offset, mask, weight):
        out = ops.modulated_deform_conv2d(
            x, offset, mask, weight, padding=2, dilation=2, deformable_groups=g
        )
        return jnp.sum(out**2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, offset, mask, weight)
    for gr, ref_arr in zip(grads, (x, offset, mask, weight)):
        assert gr.shape == ref_arr.shape
        assert np.isfinite(np.asarray(gr)).all()
        assert np.abs(np.asarray(gr)).sum() > 0
