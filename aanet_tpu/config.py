"""Configuration: a single dataclass + named presets.

Replaces the reference's argparse blocks duplicated across train.py /
inference.py / predict.py (`train.py:21-101`, `inference.py:20-69`,
`predict.py:21-65`) and the 17 canned shell scripts in `scripts/`.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Sequence


@dataclass
class ModelConfig:
    """Flags consumed by the AANet composer (reference nets/aanet.py:14-31)."""

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
    # compute dtype for the whole network ('float32' | 'bfloat16'); params
    # and BN statistics always stay float32 (mixed precision)
    dtype: Optional[str] = None
    # stage-granular activation rematerialisation during training (large
    # batches OOM without it); inference is unaffected
    remat: bool = True

    def build(self):
        from aanet_tpu.models import AANet

        return AANet(**dataclasses.asdict(self))


@dataclass
class DataConfig:
    data_dir: str = "data/SceneFlow"
    dataset_name: str = "SceneFlow"  # SceneFlow | KITTI2012 | KITTI2015 | KITTI_mix
    mode: str = "val"  # train | train_all | val | test
    # 0 debug, 1 overfit, 1_1200.. subset sizes, 2 full (reference
    # --debug_overFit_train, dataloader/dataloader.py:31-42)
    split_preset: str = "full"  # debug | overfit | subset_{N} | full
    filename_root: Optional[str] = None  # dir holding the filename lists
    batch_size: int = 64
    val_batch_size: int = 64
    img_height: int = 288
    img_width: int = 576
    val_img_height: int = 576
    val_img_width: int = 960
    num_workers: int = 8
    load_pseudo_gt: bool = False


@dataclass
class TrainConfig:
    checkpoint_dir: str = "checkpoints/run"
    seed: int = 326
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    offset_lr_mult: float = 0.1  # offset_conv params x0.1 (train.py:209)
    lr_decay_gamma: float = 0.5
    milestones: Sequence[int] = (20, 30, 40, 50, 60)  # epochs
    max_epoch: int = 64
    accumulation_steps: int = 1
    freeze_bn: bool = False
    highest_loss_only: bool = False
    val_metric: str = "epe"  # epe | d1
    save_ckpt_freq: int = 5
    print_freq: int = 50
    summary_freq: int = 100
    resume: bool = False
    evaluate_only: bool = False
    no_validate: bool = False
    strict_load: bool = True
    pretrained: Optional[str] = None


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "Config":
        d = json.loads(s)
        return Config(
            model=ModelConfig(**d.get("model", {})),
            data=DataConfig(**d.get("data", {})),
            train=TrainConfig(**d.get("train", {})),
        )


# ---------------------------------------------------------------------------
# Presets (the reference's scripts/*.sh, condensed)
# ---------------------------------------------------------------------------

MODEL_PRESETS = {
    # scripts/aanet_inference.sh:4-13
    "aanet": ModelConfig(feature_type="aanet", feature_pyramid_network=True),
    # scripts/aanet+_train.sh:14-16
    "aanet+": ModelConfig(
        feature_type="ganet", feature_pyramid=True, refinement_type="hourglass"
    ),
    # scripts/stereonet-aa_inference.sh
    "stereonet-aa": ModelConfig(
        feature_type="stereonet",
        num_scales=1,
        num_fusions=4,
        num_deform_blocks=4,
        refinement_type="stereonet",
    ),
    # scripts/psmnet-aa_inference.sh
    "psmnet-aa": ModelConfig(
        feature_type="psmnet", feature_pyramid=True, no_intermediate_supervision=True
    ),
    # scripts/ganet-aa_inference.sh
    "ganet-aa": ModelConfig(
        feature_type="ganet", feature_pyramid=True, no_intermediate_supervision=True
    ),
    # scripts/gcnet-aa_inference.sh
    "gcnet-aa": ModelConfig(
        feature_type="gcnet",
        feature_pyramid=True,
        num_downsample=1,
        no_intermediate_supervision=True,
    ),
}


def preset(name: str) -> ModelConfig:
    if name not in MODEL_PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(MODEL_PRESETS)}")
    return dataclasses.replace(MODEL_PRESETS[name])
