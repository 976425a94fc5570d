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


def maybe_init_distributed(logger=None) -> bool:
    """Multi-host process-group initialization (the reference's DDP init,
    train.py:113-123, replaced by `jax.distributed.initialize`).

    Gated on AANET_TPU_DISTRIBUTED=1 (or the standard JAX cluster env
    COORDINATOR_ADDRESS being set by a launcher). On TPU pods
    `jax.distributed.initialize()` auto-discovers the coordinator, process
    count and process id from the TPU metadata; on other clusters the
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars
    apply. Data loading is already process-sharded
    (`data/pipeline.py:make_train_loader` shards by jax.process_index()),
    so this is the only multi-host hook needed.
    """
    flag = os.environ.get("AANET_TPU_DISTRIBUTED", "")
    if flag.lower() in ("", "0", "false") and not os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        return False
    import jax

    # Explicit triple for generic clusters (jax's auto-detection only
    # covers TPU pods / Slurm / OpenMPI / k8s); exercised for real by the
    # 2-process CPU test (tests/test_multihost.py).
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord:
        missing = [
            v
            for v in ("JAX_NUM_PROCESSES", "JAX_PROCESS_ID")
            if v not in os.environ
        ]
        if missing:
            raise ValueError(
                "JAX_COORDINATOR_ADDRESS is set but "
                f"{' and '.join(missing)} "
                "missing — all three must be provided together for an "
                "explicit cluster (or unset all three to use "
                "jax.distributed auto-detection)"
            )
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    else:
        jax.distributed.initialize()
    if logger is not None:
        logger.info(
            f"jax.distributed initialized: process "
            f"{jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} "
            f"global devices"
        )
    return True


def _add_model_args(p: argparse.ArgumentParser):
    p.add_argument("--preset", default=None,
                   help="aanet | aanet+ | stereonet-aa | psmnet-aa | ganet-aa | gcnet-aa")
    # Boolean model flags are tri-state (None = keep the preset's value):
    # BooleanOptionalAction gives each one a --no-<flag> negation so a
    # preset's True can be switched off from the command line.
    bool_flag = dict(action=argparse.BooleanOptionalAction, default=None)
    p.add_argument("--max_disp", type=int, default=None)
    p.add_argument("--feature_type", default=None)
    p.add_argument("--no_feature_mdconv", **bool_flag)
    p.add_argument("--feature_pyramid", **bool_flag)
    p.add_argument("--feature_pyramid_network", **bool_flag)
    p.add_argument("--feature_similarity", default=None)
    p.add_argument("--num_downsample", type=int, default=None)
    p.add_argument("--aggregation_type", default=None)
    p.add_argument("--num_scales", type=int, default=None)
    p.add_argument("--num_fusions", type=int, default=None)
    p.add_argument("--num_stage_blocks", type=int, default=None)
    p.add_argument("--num_deform_blocks", type=int, default=None)
    p.add_argument("--no_intermediate_supervision", **bool_flag)
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
    # All defaults are None (tri-state): unspecified flags keep the
    # recipe's / dataclass's value, explicit flags always win.
    bool_flag = dict(action=argparse.BooleanOptionalAction, default=None)
    p.add_argument("--data_dir", default=None)
    p.add_argument("--dataset_name", default=None)
    p.add_argument("--mode", default=None)
    p.add_argument("--split_preset", default=None,
                   help="debug | overfit | subset_{1200,2400,4800,9600,19200} | full")
    p.add_argument("--filename_root", default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--val_batch_size", type=int, default=None)
    p.add_argument("--img_height", type=int, default=None)
    p.add_argument("--img_width", type=int, default=None)
    p.add_argument("--val_img_height", type=int, default=None)
    p.add_argument("--val_img_width", type=int, default=None)
    p.add_argument("--num_workers", type=int, default=None)
    p.add_argument("--load_pseudo_gt", **bool_flag)


def _add_train_args(p: argparse.ArgumentParser):
    bool_flag = dict(action=argparse.BooleanOptionalAction, default=None)
    p.add_argument("--recipe", default=None,
                   help="named training pipeline stage (config.RUN_RECIPES): "
                   "{aanet,aanet+}_{sceneflow,kittimix,kitti15,kitti12}")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--weight_decay", type=float, default=None)
    p.add_argument("--lr_decay_gamma", type=float, default=None)
    p.add_argument("--milestones", default=None)
    p.add_argument("--max_epoch", type=int, default=None)
    p.add_argument("--accumulation_steps", type=int, default=None)
    p.add_argument("--freeze_bn", **bool_flag)
    p.add_argument("--highest_loss_only", **bool_flag)
    p.add_argument("--val_metric", default=None)
    p.add_argument("--save_ckpt_freq", type=int, default=None)
    p.add_argument("--print_freq", type=int, default=None)
    p.add_argument("--summary_freq", type=int, default=None)
    p.add_argument("--resume", **bool_flag)
    p.add_argument("--no_validate", **bool_flag)
    p.add_argument("--pretrained", default=None)
    p.add_argument("--strict", **bool_flag)


def build_config(args) -> Config:
    from aanet_tpu.config import recipe as run_recipe

    if getattr(args, "recipe", None):
        cfg = run_recipe(args.recipe)
        if getattr(args, "preset", None):
            cfg.model = preset(args.preset)
        model, data, train = cfg.model, cfg.data, cfg.train
    else:
        model = preset(args.preset) if getattr(args, "preset", None) else ModelConfig()
        data = DataConfig()
        train = TrainConfig()

    for f in dataclasses.fields(ModelConfig):
        v = getattr(args, f.name, None)
        if v is not None:  # None means "keep preset/default" — False applies
            setattr(model, f.name, v)
    if getattr(args, "no_remat", False):
        model.remat = False

    for f in dataclasses.fields(DataConfig):
        if getattr(args, f.name, None) is not None:
            setattr(data, f.name, getattr(args, f.name))

    mapping = {"strict": "strict_load"}
    for f in dataclasses.fields(TrainConfig):
        src = next((k for k, v in mapping.items() if v == f.name), f.name)
        if getattr(args, src, None) is not None:
            setattr(train, f.name, getattr(args, src))
    if isinstance(train.milestones, str):
        train.milestones = tuple(int(m) for m in train.milestones.split(","))
    if not train.checkpoint_dir:
        raise SystemExit("--checkpoint_dir (or --recipe) is required")
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
        model_parallel=args.model_parallel,
        data_parallel=args.data_parallel,
    )
    if mean_s is not None:
        print(json.dumps({"mean_inference_seconds": mean_s}))


def cmd_predict(args):
    from aanet_tpu.infer import predict_pairs

    cfg = build_config(args)
    predict_pairs(
        cfg, args.data_dir, output_dir=args.output_dir,
        save_type=args.save_type, visualize=args.visualize,
        model_parallel=args.model_parallel,
        data_parallel=args.data_parallel,
    )


def main(argv=None):
    _enable_compilation_cache()
    maybe_init_distributed()
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
        p.add_argument("--model_parallel", type=int, default=1,
                       help="width-shard each pair over this many devices "
                       "('model' mesh axis) for beyond-HBM resolutions")
        p.add_argument("--data_parallel", type=int, default=1,
                       help="shard the inference/predict batch over this "
                       "many devices (the reference's nn.DataParallel "
                       "eval path, inference.py:131-133)")
        p.set_defaults(fn=fn)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
