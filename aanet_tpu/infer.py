"""Inference / prediction workflows.

Parity with the reference entry points:
  * run_inference — batch inference over a dataset split with the
    pad-to-(H,W)-then-crop protocol, optional timing mode with warmup,
    and png/pfm/npy saving for KITTI submission
    (`/root/reference/inference.py:80-206`).
  * predict_pairs — inference on arbitrary rectified pairs in a
    directory (`left/*.png` + `right/`), auto-padded to a multiple of 48
    (96 when the hourglass refinement is active)
    (`/root/reference/predict.py:72-199`).

TPU note: each distinct padded shape triggers one XLA compilation, so
inference pads every image up to ONE canonical (img_height, img_width) —
exactly the reference's protocol — and predict pads per-directory to the
common auto-derived size.
"""
from __future__ import annotations

import glob
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from aanet_tpu.config import Config
from aanet_tpu.data.datasets import StereoDataset
from aanet_tpu.data.file_io import read_img, write_pfm
from aanet_tpu.data.pipeline import make_val_loader
from aanet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD, test_transform
from aanet_tpu.ops.resize import upsample_disparity
from aanet_tpu.utils.checkpoint import load_pretrained_params
from aanet_tpu.utils.logging_util import get_logger


def _pad_top_right(arr: np.ndarray, h: int, w: int) -> np.ndarray:
    """Zero-pad [B, H, W, C] (or [B,H,W]) to (h, w): TOP and RIGHT pads
    (reference inference.py:155-162)."""
    top = h - arr.shape[1]
    right = w - arr.shape[2]
    assert top >= 0 and right >= 0, (arr.shape, h, w)
    pads = [(0, 0), (top, 0), (0, right)] + [(0, 0)] * (arr.ndim - 3)
    return np.pad(arr, pads)


def build_forward(model, variables, model_parallel: int = 1, data_parallel: int = 1):
    # Parameters are jit ARGUMENTS (closure-captured arrays become baked-in
    # constants: pathological compile time and >100x slower programs).
    if model_parallel > 1 and data_parallel > 1:
        raise ValueError(
            "pick one of --model_parallel (width sharding) or "
            "--data_parallel (batch sharding) for inference"
        )
    if model_parallel > 1:
        # Width-shard each pair over `model_parallel` devices: one
        # very-high-resolution image's activations split across chips
        # (parallel/spatial.py; XLA inserts the halo collectives).
        # The data axis is fixed at 1 (batch replicated): this path's
        # use-case is beyond-HBM pairs at small/ragged batch sizes, so
        # sizing data from the device count would make batch-1 predict
        # crash in device_put whenever n_devices > model_parallel.
        from aanet_tpu.parallel.mesh import make_mesh
        from aanet_tpu.parallel.spatial import (
            make_spatial_forward,
            shard_images,
        )

        n = len(jax.devices())
        if model_parallel > n:
            raise ValueError(
                f"--model_parallel {model_parallel} exceeds the "
                f"{n} available devices"
            )
        mesh = make_mesh(
            data=1,
            model=model_parallel,
            devices=jax.devices()[:model_parallel],
        )
        sfwd = make_spatial_forward(model, mesh)

        def forward(left, right):
            if left.shape[2] % model_parallel:
                raise ValueError(
                    f"padded image width {left.shape[2]} is not divisible "
                    f"by --model_parallel {model_parallel}; pick an "
                    f"img_width that is a multiple of it"
                )
            sharded = shard_images({"left": left, "right": right}, mesh)
            return sfwd(variables, sharded["left"], sharded["right"])[-1]

        return forward

    if data_parallel > 1:
        # Batch-axis sharded inference: the reference's nn.DataParallel
        # eval path (`/root/reference/inference.py:131-133`), TPU-native —
        # one global-view jit over a data mesh, outputs replicated.
        # Callers pad the batch to a multiple of data_parallel
        # (run_inference pads ragged final batches and crops after).
        from jax.sharding import NamedSharding, PartitionSpec as P

        from aanet_tpu.parallel.mesh import make_mesh

        n = len(jax.devices())
        if data_parallel > n:
            raise ValueError(
                f"--data_parallel {data_parallel} exceeds the {n} "
                f"available devices"
            )
        mesh = make_mesh(
            data=data_parallel, model=1, devices=jax.devices()[:data_parallel]
        )
        rep = NamedSharding(mesh, P())
        dp = NamedSharding(mesh, P("data"))
        sfwd = jax.jit(
            lambda v, l, r: model.apply(v, l, r, train=False)[-1],
            in_shardings=(rep, dp, dp),
            out_shardings=rep,
        )

        def forward(left, right):
            if left.shape[0] % data_parallel:
                raise ValueError(
                    f"batch {left.shape[0]} is not divisible by "
                    f"--data_parallel {data_parallel}"
                )
            return sfwd(
                variables,
                jax.device_put(left, dp),
                jax.device_put(right, dp),
            )

        return forward

    fwd = jax.jit(lambda v, l, r: model.apply(v, l, r, train=False)[-1])

    def forward(left, right):
        return fwd(variables, left, right)

    return forward


def init_variables(model, pretrained: Optional[str] = None, strict: bool = False):
    init = jax.jit(lambda r, a, b: model.init(r, a, b, train=False))
    small = jnp.zeros((1, 96, 96, 3), jnp.float32)
    variables = init(jax.random.PRNGKey(0), small, small)
    variables = jax.device_get(variables)
    if pretrained:
        params, bs = load_pretrained_params(
            pretrained,
            variables["params"],
            variables.get("batch_stats", {}),
            strict=strict,
        )
        variables = {"params": params, "batch_stats": bs}
    return variables


def _save_disp(disp: np.ndarray, save_name: str, save_type: str, visualize: bool):
    os.makedirs(os.path.dirname(save_name) or ".", exist_ok=True)
    if save_type == "pfm":
        if visualize:
            Image.fromarray((disp * 256.0).astype(np.uint16)).save(save_name)
        write_pfm(save_name[:-3] + "pfm", disp.astype(np.float32))
    elif save_type == "npy":
        np.save(save_name[:-3] + "npy", disp)
    else:  # KITTI submission png: uint16 x256
        Image.fromarray((disp * 256.0).astype(np.uint16)).save(save_name)


def run_inference(
    cfg: Config,
    output_dir: str,
    save_type: str = "png",
    visualize: bool = False,
    count_time: bool = False,
    num_images: int = 100,
    model_parallel: int = 1,
    data_parallel: int = 1,
    logger=None,
) -> Optional[float]:
    """Returns mean per-image forward seconds when count_time, else None."""
    logger = logger or get_logger()
    d = cfg.data
    model = cfg.model.build()
    variables = init_variables(
        model, cfg.train.pretrained, strict=cfg.train.strict_load
    )
    forward = build_forward(model, variables, model_parallel, data_parallel)

    ds = StereoDataset(
        d.data_dir,
        dataset_name=d.dataset_name,
        mode="test",
        split_preset=d.split_preset,
        filename_root=d.filename_root,
        transform=test_transform(),
    )
    logger.info(f"{len(ds)} samples found in the test set")
    loader = make_val_loader(ds, d.batch_size, num_workers=d.num_workers)

    inference_time = 0.0
    num_imgs = 0
    for i, batch in enumerate(loader):
        if count_time and num_imgs >= num_images:
            break
        left, right = batch["left"], batch["right"]
        ori_h, ori_w = left.shape[1:3]
        top = max(0, d.img_height - ori_h)
        rightp = max(0, d.img_width - ori_w)
        if top or rightp:
            left = _pad_top_right(left, d.img_height, d.img_width)
            right = _pad_top_right(right, d.img_height, d.img_width)

        real_bs = left.shape[0]
        if data_parallel > 1 and real_bs % data_parallel:
            # pad the ragged final batch up to a shardable size; the
            # padded rows are cropped from the predictions below
            padded = ((real_bs + data_parallel - 1) // data_parallel) * data_parallel
            pads = [(0, padded - real_bs)] + [(0, 0)] * (left.ndim - 1)
            left = np.pad(left, pads)
            right = np.pad(right, pads)

        lj, rj = jnp.asarray(left), jnp.asarray(right)
        if count_time:
            # Execution-forcing protocol (aanet_tpu/utils/timing.py): K
            # chained forwards in one jitted scan + one readback, minus
            # the tunnel RTT. `block_until_ready` does NOT force
            # execution on this backend (docs/PERF_r05.md §1 — rounds
            # 1-4 recorded dispatch time here). Deviation from the
            # reference's loop-of-100 (`inference.py:164-175`): one
            # full-batch measurement instead of per-image accumulation —
            # same protocol size, and padded rows never skew the mean.
            from aanet_tpu.utils.timing import scan_latency_s

            iters = int(max(2, min(num_images, 8)))
            sec = scan_latency_s(forward, (lj, rj), n_iters=iters)
            mean_s = sec / lj.shape[0]
            logger.info(
                f"mean inference time per pair at "
                f"{lj.shape[1]}x{lj.shape[2]} batch {lj.shape[0]}: "
                f"{mean_s:.4f}s ({iters} chained forwards)"
            )
            return mean_s
        num_imgs += real_bs
        t0 = time.perf_counter()
        pred = forward(lj, rj)
        jax.block_until_ready(pred)
        inference_time += time.perf_counter() - t0

        pred = np.asarray(pred)[:real_bs]
        if pred.shape[2] < left.shape[2]:
            pred = np.asarray(
                upsample_disparity(jnp.asarray(pred), left.shape[1:3])
            )
        if top or rightp:
            pred = pred[:, top:, : pred.shape[2] - rightp if rightp else None]
        for b in range(pred.shape[0]):
            name = os.path.join(output_dir, batch["left_name"][b])
            _save_disp(pred[b], name, save_type, visualize)

    logger.info(f"saved predictions for {num_imgs} images")
    return None


def predict_pairs(
    cfg: Config,
    data_dir: str,
    output_dir: Optional[str] = None,
    save_type: str = "png",
    visualize: bool = False,
    model_parallel: int = 1,
    data_parallel: int = 1,
    logger=None,
):
    """Run on {data_dir}/left/*.png + {data_dir}/right/*.png pairs.

    data_parallel > 1 batches up to that many pairs per forward over a
    data mesh (same ragged pad-and-crop handling as run_inference);
    pairs in one chunk are padded to the chunk's common 48/96-multiple
    size, and each prediction is cropped back to its own original size.
    """
    logger = logger or get_logger()
    model = cfg.model.build()
    variables = init_variables(
        model, cfg.train.pretrained, strict=cfg.train.strict_load
    )
    forward = build_forward(model, variables, model_parallel, data_parallel)

    lefts = sorted(
        glob.glob(os.path.join(data_dir, "left", "*.png"))
        + glob.glob(os.path.join(data_dir, "left", "*.jpg"))
    )
    assert lefts, f"no images under {data_dir}/left"
    output_dir = output_dir or os.path.join(data_dir, "pred")
    os.makedirs(output_dir, exist_ok=True)

    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    # pad multiple: 48; 96 when hourglass refinement (predict.py:148-151)
    factor = 96 if cfg.model.refinement_type == "hourglass" else 48
    chunk = max(1, data_parallel)

    for c0 in range(0, len(lefts), chunk):
        paths = lefts[c0 : c0 + chunk]
        imgs = []
        for lp in paths:
            rp = os.path.join(data_dir, "right", os.path.basename(lp))
            left = (read_img(lp) / 255.0 - mean) / std
            right = (read_img(rp) / 255.0 - mean) / std
            imgs.append((left, right))
        # common padded size for the chunk
        ph = max(
            ((l.shape[0] + factor - 1) // factor) * factor for l, _ in imgs
        )
        pw = max(
            ((l.shape[1] + factor - 1) // factor) * factor for l, _ in imgs
        )
        lb = np.concatenate([_pad_top_right(l[None], ph, pw) for l, _ in imgs])
        rb = np.concatenate([_pad_top_right(r[None], ph, pw) for _, r in imgs])
        real_bs = lb.shape[0]
        if data_parallel > 1 and real_bs % data_parallel:
            padded = (
                (real_bs + data_parallel - 1) // data_parallel
            ) * data_parallel
            pads = [(0, padded - real_bs)] + [(0, 0)] * (lb.ndim - 1)
            lb = np.pad(lb, pads)
            rb = np.pad(rb, pads)
        preds = np.asarray(forward(jnp.asarray(lb), jnp.asarray(rb)))[:real_bs]
        for (left, _), lp, pred in zip(imgs, paths, preds):
            ori_h, ori_w = left.shape[:2]
            pred = pred[ph - ori_h :, :ori_w]
            name = os.path.join(output_dir, os.path.basename(lp))
            _save_disp(pred, name, save_type, visualize)
            logger.info(f"saved {name}")
