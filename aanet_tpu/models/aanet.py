"""AANet composer: assembles the five-stage pipeline from type flags.

Re-creation of the reference composer (`/root/reference/nets/aanet.py`):
feature extraction -> cost volume construction -> cost aggregation ->
soft-argmin disparity computation -> hierarchical refinement. All type
switches, the per-extractor max_disp division rules
(`nets/aanet.py:43-61`), and the output pyramid ordering
([H/12, H/6, H/3, H/2, H] for the default AANet) are preserved.

Inputs are NHWC images; outputs a list of [B, h_s, w_s] disparity maps,
coarse to fine, with intermediate supervision.
"""
from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from aanet_tpu.models import feature as F
from aanet_tpu.models import aggregation as A
from aanet_tpu.models import refinement as R
from aanet_tpu.ops.cost_volume import cost_volume, cost_volume_pyramid
from aanet_tpu.ops.precision import canonical_dtype, precision
from aanet_tpu.ops.resize import resize_bilinear
from aanet_tpu.ops.softargmin import soft_argmin


class AANet(nn.Module):
    """Five-stage adaptive-aggregation stereo network.

    Defaults correspond to the reference's AANet preset; AANet+ uses
    feature_type='ganet', feature_pyramid=True, refinement_type='hourglass'
    (reference scripts/aanet+_train.sh:14-16).
    """

    max_disp: int = 192
    num_downsample: int = 2
    feature_type: str = "aanet"
    no_feature_mdconv: bool = False
    feature_pyramid: bool = False
    feature_pyramid_network: bool = False
    feature_similarity: str = "correlation"
    aggregation_type: str = "adaptive"
    num_scales: int = 3
    num_fusions: int = 6
    num_stage_blocks: int = 1
    num_deform_blocks: int = 3
    no_intermediate_supervision: bool = False
    refinement_type: Optional[str] = "stereodrnet"
    mdconv_dilation: int = 2
    deformable_groups: int = 2
    dtype: Optional[str] = None  # compute dtype; params stay f32
    # Stage-granular rematerialisation for training: without it the
    # backward pass keeps every activation live and a 16-sample 288x576
    # batch needs ~60 GB of HBM (the full-res refinement blocks alone hold
    # seventeen 1.3 GB padded buffers). With remat only stage inputs are
    # saved and each stage is recomputed during its backward sweep.
    # Inference (train=False) is unaffected.
    remat: bool = True

    def _scaled_max_disp(self) -> int:
        """Per-extractor max_disp division (nets/aanet.py:43-61)."""
        ft = self.feature_type
        if ft in ("stereonet", "psmnet"):
            return self.max_disp // (2**self.num_downsample)
        if ft == "gcnet":
            return self.max_disp // 2
        if ft in ("ganet", "aanet"):
            return self.max_disp // 3
        raise NotImplementedError(ft)

    def setup(self):
        ft = self.feature_type
        if ft == "stereonet":
            self.feature_extractor = F.StereoNetFeature(self.num_downsample)
        elif ft == "psmnet":
            self.feature_extractor = F.PSMNetFeature()
        elif ft == "gcnet":
            self.feature_extractor = F.GCNetFeature()
        elif ft == "ganet":
            self.feature_extractor = F.GANetFeature(
                feature_mdconv=not self.no_feature_mdconv
            )
        elif ft == "aanet":
            self.feature_extractor = F.AANetFeature(
                feature_mdconv=not self.no_feature_mdconv
            )
        else:
            raise NotImplementedError(ft)

        if self.feature_pyramid_network:
            self.fpn = F.FeaturePyramidNetwork(out_channels=128)
        elif self.feature_pyramid:
            self.fpn = F.FeaturePyramid()
        else:
            self.fpn = None

        d = self._scaled_max_disp()
        at = self.aggregation_type
        if at == "adaptive":
            self.aggregation = A.AdaptiveAggregation(
                max_disp=d,
                num_scales=self.num_scales,
                num_fusions=self.num_fusions,
                num_stage_blocks=self.num_stage_blocks,
                num_deform_blocks=self.num_deform_blocks,
                mdconv_dilation=self.mdconv_dilation,
                deformable_groups=self.deformable_groups,
                intermediate_supervision=not self.no_intermediate_supervision,
                remat=self.remat,
            )
        elif at == "psmnet_basic":
            self.aggregation = A.PSMNetBasicAggregation(max_disp=d)
        elif at == "psmnet_hourglass":
            self.aggregation = A.PSMNetHGAggregation(max_disp=d)
        elif at == "gcnet":
            self.aggregation = A.GCNetAggregation()
        elif at == "stereonet":
            self.aggregation = A.StereoNetAggregation()
        else:
            raise NotImplementedError(at)

        rt = self.refinement_type
        if rt and rt != "None":
            mods = {
                "stereonet": R.StereoNetRefinement,
                "stereodrnet": R.StereoDRNetRefinement,
                "hourglass": R.HourglassRefinement,
            }
            if rt not in mods:
                raise NotImplementedError(rt)
            self.refinement = [
                mods[rt](remat=self.remat) for _ in range(self.num_downsample)
            ]
        else:
            self.refinement = None

    # -- stages ----------------------------------------------------------

    def feature_extraction(self, img, train):
        feat = self.feature_extractor(img, train)
        if self.fpn is not None:
            feat = self.fpn(feat, train)
        return feat

    def cost_volume_construction(self, left_feature, right_feature):
        d = self._scaled_max_disp()
        multi_scale = (
            self.feature_type == "aanet"
            or self.feature_pyramid
            or self.feature_pyramid_network
        )
        if multi_scale:
            vols = cost_volume_pyramid(
                left_feature, right_feature, d, self.feature_similarity
            )
            if self.num_scales == 1:
                vols = [vols[0]]
            return vols
        vol = cost_volume(left_feature, right_feature, d, self.feature_similarity)
        if self.aggregation_type == "adaptive":
            return [vol]
        return vol

    def disparity_computation(self, aggregation):
        match_similarity = self.feature_similarity not in ("difference", "concat")
        if "psmnet" in self.aggregation_type:
            match_similarity = True  # PSMNet learns similarity for concat
        if isinstance(aggregation, (list, tuple)):
            # coarse-to-fine: reverse ([1/3,1/6,1/12] -> [1/12,1/6,1/3])
            return [
                soft_argmin(vol, match_similarity) for vol in aggregation[::-1]
            ]
        return [soft_argmin(aggregation, match_similarity)]

    def disparity_refinement(self, left_img, right_img, disparity, train):
        pyramid = []
        if self.refinement is not None:
            for i in range(self.num_downsample):
                scale_factor = 1.0 / (2 ** (self.num_downsample - i - 1))
                if scale_factor == 1.0:
                    curr_left, curr_right = left_img, right_img
                else:
                    hw = (
                        int(left_img.shape[1] * scale_factor),
                        int(left_img.shape[2] * scale_factor),
                    )
                    curr_left = resize_bilinear(left_img, hw)
                    curr_right = resize_bilinear(right_img, hw)
                disparity = self.refinement[i](
                    disparity, curr_left, curr_right, train
                )
                pyramid.append(disparity)  # [H/2, H]
        return pyramid

    def __call__(
        self, left_img, right_img, train: bool = False, freeze_bn: bool = False
    ):
        # Install the compute dtype for this trace; the final disparity is
        # always returned in f32 (soft-argmin/refinement upcast internally).
        # freeze_bn puts every BatchNorm in running-stats mode while the
        # rest of the trace stays in training mode (remat active) — the
        # reference's fine-tune protocol (model.py:40-47).
        dt = canonical_dtype(self.dtype)
        use_remat = self.remat and train
        if use_remat:
            feat_fn = nn.remat(
                lambda m, x: AANet.feature_extraction(m, x, True)
            )
            agg_fn = nn.remat(lambda m, v: m.aggregation(v, True))
            refine_fn = nn.remat(
                lambda m, l, r, d: AANet.disparity_refinement(m, l, r, d, True)
            )
        from aanet_tpu.models.layers import freeze_bn_scope

        with precision(dt), freeze_bn_scope(freeze_bn):
            if dt is not None:
                left_img = left_img.astype(dt)
                right_img = right_img.astype(dt)
            if use_remat:
                left_feature = feat_fn(self, left_img)
                right_feature = feat_fn(self, right_img)
            elif not train:
                # Inference: ONE feature pass over both views stacked on
                # the batch axis — mathematically exact (weights shared,
                # BN in running-stats mode) and ~2x fewer small-kernel
                # dispatches in the backbone, which is dominated by
                # per-op overhead at batch 1. Training keeps two calls
                # so BN batch statistics update once per view, exactly
                # like the reference's sequential forwards
                # (nets/aanet.py:213-214).
                n = left_img.shape[0]
                feats = self.feature_extraction(
                    jnp.concatenate([left_img, right_img], axis=0), train
                )
                if isinstance(feats, (list, tuple)):
                    left_feature = [f[:n] for f in feats]
                    right_feature = [f[n:] for f in feats]
                else:
                    left_feature, right_feature = feats[:n], feats[n:]
            else:
                left_feature = self.feature_extraction(left_img, train)
                right_feature = self.feature_extraction(right_img, train)
            vols = self.cost_volume_construction(left_feature, right_feature)
            aggregation = (
                agg_fn(self, vols) if use_remat else self.aggregation(vols, train)
            )
            disparity_pyramid = self.disparity_computation(aggregation)
            if use_remat and self.refinement is not None:
                disparity_pyramid += refine_fn(
                    self, left_img, right_img, disparity_pyramid[-1]
                )
            else:
                disparity_pyramid += self.disparity_refinement(
                    left_img, right_img, disparity_pyramid[-1], train
                )
            disparity_pyramid = [
                d.astype(jnp.float32) for d in disparity_pyramid
            ]
        return disparity_pyramid
