"""Numerical parity against the reference PyTorch network (torch oracle).

The reference's CUDA-free configuration (``no_feature_mdconv=True`` +
``num_deform_blocks=0`` + ``stereodrnet`` refinement; only
``nets/deform_conv/deform_conv.py:44-45`` is CUDA-only) runs on CPU, so we
transplant its weights into the Flax model (tools/torch_oracle.py) and
compare outputs — per stage and full-model. This pins conv padding
arithmetic, BN eval semantics, the FPN nearest-upsample rule, the
upsample-x-rescale convention (model.py:114-119), warp semantics, and the
five-stage wiring all at once: the Flax network *is* the reference network
under weight transplant.

Tolerances: both sides are float32 with different conv backends (oneDNN
vs XLA); per-layer differences are ~1e-6 relative and accumulate over
~350 layers. Stage outputs agree to <2e-3; full-model disparities (range
0..2*max_disp after refinement) agree to <5e-2 max / <5e-3 mean.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from torch_oracle import (  # noqa: E402
    calibrate_torch_bn,
    load_reference_nets,
    record_flax_units,
    torch_execution_order,
    transplant,
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import flax.linen as nn  # noqa: E402


def _rand_images(shape, seed):
    rs = np.random.RandomState(seed)
    return rs.rand(*shape).astype(np.float32)


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _run_parity(torch_module, torch_inputs, flax_model, flax_inputs,
                to_numpy_pairs):
    """Calibrate, transplant, forward both, and return (torch, flax) output
    ndarray pairs via `to_numpy_pairs(torch_out, flax_out)`."""
    calibrate_torch_bn(torch_module, torch_inputs)
    torch_mods = torch_execution_order(torch_module, torch_inputs)
    variables, units = record_flax_units(
        flax_model, jax.random.PRNGKey(0), *flax_inputs, train=False
    )
    new_vars = transplant(torch_mods, units, variables)
    out_flax = flax_model.apply(new_vars, *flax_inputs, train=False)
    with torch.no_grad():
        out_torch = torch_module(*torch_inputs)
    return to_numpy_pairs(out_torch, out_flax)


def _assert_close(pairs, atol, mean_tol):
    for i, (a, b) in enumerate(pairs):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, (i, a.shape, b.shape)
        d = np.abs(a - b)
        assert d.max() < atol, (i, float(d.max()), float(d.mean()))
        assert d.mean() < mean_tol, (i, float(d.max()), float(d.mean()))


# ---------------------------------------------------------------------------


def test_full_model_parity_with_reference():
    """Transplant all ~350 layers of the CUDA-free reference AANet and
    compare the full 5-level disparity pyramid (VERDICT r2 top item)."""
    nets = load_reference_nets()
    from aanet_tpu.models import AANet

    torch.manual_seed(0)
    kw = dict(
        feature_type="aanet",
        no_feature_mdconv=True,
        feature_pyramid_network=True,
        num_deform_blocks=0,
        refinement_type="stereodrnet",
    )
    ref = nets.AANet(96, False, **kw)  # useFeatureAtt positional is unused
    model = AANet(max_disp=96, **kw)

    H, W = 96, 192
    left = _rand_images((1, 3, H, W), 7)
    right = _rand_images((1, 3, H, W), 8)
    tins = (torch.from_numpy(left), torch.from_numpy(right))
    jins = (_nhwc(left), _nhwc(right))

    pairs = _run_parity(
        ref, tins, model, jins,
        lambda t, f: [(ti.numpy(), np.asarray(fi)) for ti, fi in zip(t, f)],
    )
    assert len(pairs) == 5
    _assert_close(pairs, atol=5e-2, mean_tol=5e-3)


def test_feature_fpn_stage_parity():
    """AANetFeature (ResNet-40, no mdconv) + FPN, compared map-by-map
    (reference nets/resnet.py:102-194, nets/feature.py:182-231)."""
    nets = load_reference_nets()
    from nets.resnet import AANetFeature as TorchFeat
    from nets.feature import FeaturePyramidNetwork as TorchFPN
    from aanet_tpu.models import feature as F

    class TorchStage(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.feat = TorchFeat(feature_mdconv=False)
            self.fpn = TorchFPN([128, 256, 512], 128)

        def forward(self, x):
            return self.fpn(self.feat(x))

    class FlaxStage(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            feats = F.AANetFeature(feature_mdconv=False)(x, train)
            return F.FeaturePyramidNetwork(out_channels=128)(feats, train)

    torch.manual_seed(1)
    x = _rand_images((1, 3, 96, 144), 9)
    pairs = _run_parity(
        TorchStage(), (torch.from_numpy(x),), FlaxStage(), (_nhwc(x),),
        lambda t, f: [
            (np.transpose(ti.numpy(), (0, 2, 3, 1)), np.asarray(fi))
            for ti, fi in zip(t, f)
        ],
    )
    assert len(pairs) == 3
    _assert_close(pairs, atol=2e-3, mean_tol=2e-4)


def test_ganet_feature_parity():
    """GANet hourglass feature without mdconv — exercises the
    ConvTranspose (deconv) weight conversion and Conv2x skip-merges
    (reference nets/feature.py:379-460)."""
    nets = load_reference_nets()
    from nets.feature import GANetFeature as TorchGANet
    from aanet_tpu.models.feature import GANetFeature

    torch.manual_seed(2)
    x = _rand_images((1, 3, 96, 144), 10)
    pairs = _run_parity(
        TorchGANet(feature_mdconv=False), (torch.from_numpy(x),),
        GANetFeature(feature_mdconv=False), (_nhwc(x),),
        lambda t, f: [(np.transpose(t.numpy(), (0, 2, 3, 1)), np.asarray(f))],
    )
    _assert_close(pairs, atol=2e-3, mean_tol=2e-4)


def test_adaptive_aggregation_parity():
    """Simple-bottleneck ISA + CSA stack on a random cost pyramid
    (reference nets/aggregation.py:313-464 with num_deform_blocks=0)."""
    nets = load_reference_nets()
    from nets.aggregation import AdaptiveAggregation as TorchAgg
    from aanet_tpu.models.aggregation import AdaptiveAggregation

    torch.manual_seed(3)
    d, h, w = 32, 24, 48
    vols = [
        _rand_images((1, d >> s, h >> s, w >> s), 20 + s) for s in range(3)
    ]
    tin = [torch.from_numpy(v) for v in vols]
    jin = [jnp.asarray(np.transpose(v, (0, 2, 3, 1))) for v in vols]

    # The reference module MUTATES its input list in place
    # (nets/aggregation.py:378-382: x[i] = dconv(x[i])), and _run_parity
    # forwards three times — clone the list per call.
    class CloningAgg(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.agg = TorchAgg(max_disp=d, num_scales=3, num_fusions=6,
                                num_deform_blocks=0)

        def forward(self, vols):
            return self.agg([v.clone() for v in vols])

    fm = AdaptiveAggregation(max_disp=d, num_scales=3, num_fusions=6,
                             num_deform_blocks=0)
    pairs = _run_parity(
        CloningAgg(), (tin,), fm, (jin,),
        lambda t, f: [
            (np.transpose(ti.detach().numpy(), (0, 2, 3, 1)), np.asarray(fi))
            for ti, fi in zip(t, f)
        ],
    )
    assert len(pairs) == 3
    _assert_close(pairs, atol=2e-3, mean_tol=2e-4)


def test_stereodrnet_refinement_parity():
    """Warp-error refinement head (reference nets/refinement.py:60-106):
    pins disp_warp/grid_sample semantics and the upsample-x-rescale rule."""
    nets = load_reference_nets()
    from nets.refinement import StereoDRNetRefinement as TorchRef
    from aanet_tpu.models.refinement import StereoDRNetRefinement

    torch.manual_seed(4)
    B, H, W = 1, 64, 128
    rs = np.random.RandomState(11)
    low_disp = (rs.rand(B, H // 2, W // 2) * 20).astype(np.float32)
    left = _rand_images((B, 3, H, W), 12)
    right = _rand_images((B, 3, H, W), 13)

    tin = (torch.from_numpy(low_disp), torch.from_numpy(left),
           torch.from_numpy(right))
    jin = (jnp.asarray(low_disp), _nhwc(left), _nhwc(right))
    pairs = _run_parity(
        TorchRef(), tin, StereoDRNetRefinement(), jin,
        lambda t, f: [(t.numpy(), np.asarray(f))],
    )
    _assert_close(pairs, atol=1e-2, mean_tol=1e-3)
