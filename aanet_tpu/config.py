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
    # non-strict pretrained loading by default, like the reference
    # (train.py --strict defaults False; utils.py:116-119) — enables
    # fine-tuning across architecture variants
    strict_load: bool = False
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


# ---------------------------------------------------------------------------
# Run recipes: the reference's staged training pipelines as full Configs
# (scripts/aanet_train.sh, scripts/aanet+_train.sh:5-60). Stage N's
# `pretrained` points at stage N-1's checkpoint; pass --checkpoint_dir /
# --data_dir / --pretrained to relocate.
# ---------------------------------------------------------------------------


def _recipe(model_name: str, stage: str) -> Config:
    model = preset(model_name)
    tag = model_name  # checkpoint dirs match the reference scripts
    if stage == "sceneflow":
        # scripts/aanet+_train.sh:5-19 + README.md:110 (batch 64 on 4xV100
        # == global batch 64 over the data mesh)
        data = DataConfig(
            dataset_name="SceneFlow", mode="val",
            batch_size=64 if model_name == "aanet" else 16,
            val_batch_size=64,
            img_height=288, img_width=576,
            val_img_height=576, val_img_width=960,
        )
        train = TrainConfig(
            checkpoint_dir=f"checkpoints/{tag}_sceneflow",
            learning_rate=1e-3, milestones=(20, 30, 40, 50, 60),
            max_epoch=64,
        )
    elif stage == "kittimix":
        # scripts/aanet+_train.sh:21-40: pseudo-GT supervised KITTI mix
        data = DataConfig(
            data_dir="data/KITTI", dataset_name="KITTI_mix", mode="train",
            batch_size=8 if "+" in model_name else 6, val_batch_size=8,
            img_height=288 if "+" in model_name else 336,
            img_width=1152 if "+" in model_name else 960,
            val_img_height=384, val_img_width=1248,
            load_pseudo_gt=True,
        )
        train = TrainConfig(
            checkpoint_dir=f"checkpoints/{tag}_kittimix",
            pretrained=f"checkpoints/{tag}_sceneflow/aanet_best.msgpack",
            strict_load=False,
            learning_rate=1e-3, milestones=(400, 600, 800, 900),
            max_epoch=1000, save_ckpt_freq=100, no_validate=True,
        )
    elif stage in ("kitti15", "kitti12"):
        # scripts/aanet+_train.sh:42-60: full-res fine-tune with frozen BN
        # and highest-scale-only loss
        k15 = stage == "kitti15"
        data = DataConfig(
            data_dir=(
                "data/KITTI/kitti_2015/data_scene_flow"
                if k15 else "data/KITTI/kitti_2012/data_stereo_flow"
            ),
            dataset_name="KITTI2015" if k15 else "KITTI2012",
            mode="train_all",
            batch_size=8 if "+" in model_name else 6, val_batch_size=8,
            img_height=384, img_width=1248,
            val_img_height=384, val_img_width=1248,
            load_pseudo_gt=True,
        )
        train = TrainConfig(
            checkpoint_dir=f"checkpoints/{tag}_{stage}",
            pretrained=f"checkpoints/{tag}_kittimix/aanet_latest.msgpack",
            strict_load=False,
            learning_rate=1e-4, milestones=(400, 600, 800, 900),
            max_epoch=1000, save_ckpt_freq=100, no_validate=True,
            highest_loss_only=True,
            freeze_bn="+" in model_name,  # aanet+_train.sh:56-60
        )
    else:
        raise KeyError(stage)
    return Config(model=model, data=data, train=train)


RUN_RECIPES = {
    f"{m}_{s}": (m, s)
    for m in ("aanet", "aanet+")
    for s in ("sceneflow", "kittimix", "kitti15", "kitti12")
}


def recipe(name: str) -> Config:
    """Full Config for a named training recipe (e.g. 'aanet+_sceneflow')."""
    if name not in RUN_RECIPES:
        raise KeyError(f"unknown recipe {name!r}; have {sorted(RUN_RECIPES)}")
    return _recipe(*RUN_RECIPES[name])
