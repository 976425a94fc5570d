"""Command-line entry points: train / evaluate / inference / predict.

Replaces the reference's three argparse entry scripts + 17 shell scripts
(`train.py`, `inference.py`, `predict.py`, `scripts/*.sh`) with one CLI:

  python -m aanet_tpu.cli train --preset aanet --data_dir ...
  python -m aanet_tpu.cli evaluate --preset aanet+ --checkpoint_dir ...
  python -m aanet_tpu.cli inference --preset aanet --pretrained ckpt.msgpack
  python -m aanet_tpu.cli predict --preset aanet+ --data_dir pairs/

Flag names follow the reference where they exist (train.py:21-101).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

from aanet_tpu.config import Config, DataConfig, ModelConfig, TrainConfig, preset


def _enable_compilation_cache():
    """Persist XLA executables across CLI invocations — without this every
    train/evaluate/inference run pays minutes of recompilation."""
    import jax

    cache_dir = os.environ.get(
        "AANET_TPU_CACHE", os.path.expanduser("~/.cache/aanet_tpu_xla")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs


def _add_model_args(p: argparse.ArgumentParser):
    p.add_argument("--preset", default=None,
                   help="aanet | aanet+ | stereonet-aa | psmnet-aa | ganet-aa | gcnet-aa")
    p.add_argument("--max_disp", type=int, default=None)
    p.add_argument("--feature_type", default=None)
    p.add_argument("--no_feature_mdconv", action="store_true")
    p.add_argument("--feature_pyramid", action="store_true")
    p.add_argument("--feature_pyramid_network", action="store_true")
    p.add_argument("--feature_similarity", default=None)
    p.add_argument("--num_downsample", type=int, default=None)
    p.add_argument("--aggregation_type", default=None)
    p.add_argument("--num_scales", type=int, default=None)
    p.add_argument("--num_fusions", type=int, default=None)
    p.add_argument("--num_stage_blocks", type=int, default=None)
    p.add_argument("--num_deform_blocks", type=int, default=None)
    p.add_argument("--no_intermediate_supervision", action="store_true")
    p.add_argument("--refinement_type", default=None)
    p.add_argument("--mdconv_dilation", type=int, default=None)
    p.add_argument("--deformable_groups", type=int, default=None)
    p.add_argument("--dtype", default=None, choices=["float32", "bfloat16"],
                   help="compute dtype for the network (params/BN stats stay "
                   "float32); bfloat16 doubles MXU throughput on TPU")
    p.add_argument("--no_remat", action="store_true",
                   help="keep all training activations live (more HBM, "
                   "slightly faster step when memory allows)")


def _add_data_args(p: argparse.ArgumentParser):
    p.add_argument("--data_dir", default="data/SceneFlow")
    p.add_argument("--dataset_name", default="SceneFlow")
    p.add_argument("--mode", default="val")
    p.add_argument("--split_preset", default="full",
                   help="debug | overfit | subset_{1200,2400,4800,9600,19200} | full")
    p.add_argument("--filename_root", default=None)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--val_batch_size", type=int, default=64)
    p.add_argument("--img_height", type=int, default=288)
    p.add_argument("--img_width", type=int, default=576)
    p.add_argument("--val_img_height", type=int, default=576)
    p.add_argument("--val_img_width", type=int, default=960)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--load_pseudo_gt", action="store_true")


def _add_train_args(p: argparse.ArgumentParser):
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--seed", type=int, default=326)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--lr_decay_gamma", type=float, default=0.5)
    p.add_argument("--milestones", default="20,30,40,50,60")
    p.add_argument("--max_epoch", type=int, default=64)
    p.add_argument("--accumulation_steps", type=int, default=1)
    p.add_argument("--freeze_bn", action="store_true")
    p.add_argument("--highest_loss_only", action="store_true")
    p.add_argument("--val_metric", default="epe")
    p.add_argument("--save_ckpt_freq", type=int, default=5)
    p.add_argument("--print_freq", type=int, default=50)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--no_validate", action="store_true")
    p.add_argument("--pretrained", default=None)
    p.add_argument("--strict", action="store_true")


def build_config(args) -> Config:
    model = preset(args.preset) if args.preset else ModelConfig()
    for f in dataclasses.fields(ModelConfig):
        v = getattr(args, f.name, None)
        if v is not None and not (isinstance(v, bool) and not v):
            setattr(model, f.name, v)
    if getattr(args, "no_remat", False):
        model.remat = False

    data = DataConfig()
    for f in dataclasses.fields(DataConfig):
        if hasattr(args, f.name) and getattr(args, f.name) is not None:
            setattr(data, f.name, getattr(args, f.name))

    train = TrainConfig()
    mapping = {"strict": "strict_load"}
    for f in dataclasses.fields(TrainConfig):
        src = next((k for k, v in mapping.items() if v == f.name), f.name)
        if hasattr(args, src) and getattr(args, src) is not None:
            setattr(train, f.name, getattr(args, src))
    if hasattr(args, "milestones") and isinstance(args.milestones, str):
        train.milestones = tuple(int(m) for m in args.milestones.split(","))
    return Config(model=model, data=data, train=train)


def _save_run_provenance(cfg: Config):
    """args.json + command line (reference utils/utils.py:21-45)."""
    os.makedirs(cfg.train.checkpoint_dir, exist_ok=True)
    with open(os.path.join(cfg.train.checkpoint_dir, "args.json"), "w") as f:
        f.write(cfg.to_json())
    with open(os.path.join(cfg.train.checkpoint_dir, "command_train.txt"), "a") as f:
        f.write(" ".join(sys.argv) + "\n")


def cmd_train(args):
    from aanet_tpu.data.datasets import StereoDataset
    from aanet_tpu.data.pipeline import make_train_loader, make_val_loader
    from aanet_tpu.data.transforms import train_transform, val_transform
    from aanet_tpu.train.trainer import Trainer
    from aanet_tpu.utils.logging_util import get_logger

    cfg = build_config(args)
    _save_run_provenance(cfg)
    logger = get_logger(os.path.join(cfg.train.checkpoint_dir, "trainLog.txt"))
    logger.info("config:\n" + cfg.to_json())

    d = cfg.data
    train_ds = StereoDataset(
        d.data_dir, d.dataset_name,
        mode="train" if d.mode != "train_all" else "train_all",
        split_preset=d.split_preset, filename_root=d.filename_root,
        load_pseudo_gt=d.load_pseudo_gt, save_filename=False,
        transform=train_transform(
            d.img_height, d.img_width, center_crop=(d.split_preset == "overfit")
        ),
    )
    val_ds = StereoDataset(
        d.data_dir, d.dataset_name, mode="val",
        split_preset=d.split_preset, filename_root=d.filename_root,
        save_filename=False,
        transform=val_transform(d.val_img_height, d.val_img_width),
    )
    logger.info(f"{len(train_ds)} train / {len(val_ds)} val samples")

    steps_per_epoch = len(train_ds) // (
        d.batch_size * max(1, cfg.train.accumulation_steps)
    )
    trainer = Trainer(cfg, steps_per_epoch, logger=logger)
    for epoch in range(trainer.epoch, cfg.train.max_epoch):
        loader = make_train_loader(
            train_ds,
            d.batch_size * cfg.train.accumulation_steps,
            epoch,
            seed=cfg.train.seed,
            num_workers=d.num_workers,
        )
        trainer.train_epoch(loader)
        if not cfg.train.no_validate:
            trainer.validate(
                make_val_loader(val_ds, d.val_batch_size, d.num_workers)
            )
    logger.info("training done")


def cmd_evaluate(args):
    from aanet_tpu.data.datasets import StereoDataset
    from aanet_tpu.data.pipeline import make_val_loader
    from aanet_tpu.data.transforms import val_transform
    from aanet_tpu.train.trainer import Trainer
    from aanet_tpu.utils.checkpoint import load_checkpoint
    from aanet_tpu.utils.logging_util import get_logger

    cfg = build_config(args)
    cfg.train.evaluate_only = True
    logger = get_logger()
    d = cfg.data
    val_ds = StereoDataset(
        d.data_dir, d.dataset_name, mode=d.mode,
        split_preset=d.split_preset, filename_root=d.filename_root,
        save_filename=False,
        transform=val_transform(d.val_img_height, d.val_img_width),
    )
    trainer = Trainer(cfg, steps_per_epoch=1, logger=logger)
    if not cfg.train.pretrained:
        # aanet_best -> aanet_latest fallback (model.py:267-277)
        loaded = False
        for name in ("aanet_best", "aanet_latest"):
            path = os.path.join(cfg.train.checkpoint_dir, f"{name}.msgpack")
            if os.path.exists(path):
                template = {
                    "params": trainer.state.params,
                    "batch_stats": trainer.state.batch_stats,
                }
                payload, _ = load_checkpoint(path, template)
                trainer.state = trainer.state.replace(
                    params=payload["params"], batch_stats=payload["batch_stats"]
                )
                logger.info(f"loaded {path}")
                loaded = True
                break
        if not loaded:
            raise FileNotFoundError(
                f"no aanet_best/aanet_latest checkpoint under "
                f"{cfg.train.checkpoint_dir!r} and no --pretrained given"
            )
    means = trainer.validate(make_val_loader(val_ds, d.val_batch_size, d.num_workers))
    print(json.dumps(means))


def cmd_inference(args):
    from aanet_tpu.infer import run_inference

    cfg = build_config(args)
    out = args.output_dir or os.path.join(
        os.path.dirname(args.pretrained or "."), "inference_output"
    )
    mean_s = run_inference(
        cfg, out, save_type=args.save_type, visualize=args.visualize,
        count_time=args.count_time, num_images=args.num_images,
    )
    if mean_s is not None:
        print(json.dumps({"mean_inference_seconds": mean_s}))


def cmd_predict(args):
    from aanet_tpu.infer import predict_pairs

    cfg = build_config(args)
    predict_pairs(
        cfg, args.data_dir, output_dir=args.output_dir,
        save_type=args.save_type, visualize=args.visualize,
    )


def main(argv=None):
    _enable_compilation_cache()
    parser = argparse.ArgumentParser(prog="aanet_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train")
    _add_model_args(p_train)
    _add_data_args(p_train)
    _add_train_args(p_train)
    p_train.set_defaults(fn=cmd_train)

    p_eval = sub.add_parser("evaluate")
    _add_model_args(p_eval)
    _add_data_args(p_eval)
    _add_train_args(p_eval)
    p_eval.set_defaults(fn=cmd_evaluate)

    for name, fn in (("inference", cmd_inference), ("predict", cmd_predict)):
        p = sub.add_parser(name)
        _add_model_args(p)
        _add_data_args(p)
        p.add_argument("--pretrained", default=None)
        p.add_argument("--strict", action="store_true")
        p.add_argument("--output_dir", default=None)
        p.add_argument("--save_type", default="png", choices=["png", "pfm", "npy"])
        p.add_argument("--visualize", action="store_true")
        p.add_argument("--count_time", action="store_true")
        p.add_argument("--num_images", type=int, default=100)
        p.set_defaults(fn=fn)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
