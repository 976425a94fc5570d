"""Training engine: jitted train/eval steps + the epoch orchestrator.

TPU-native re-design of the reference `Model` class (`model.py:14-463`):

  * ONE jitted global-view train step over a `Mesh(('data','model'))` —
    the batch is sharded on 'data', parameters replicated; XLA inserts
    the gradient all-reduce and cross-replica BN reductions (the
    reference's DDP + SyncBatchNorm + NCCL, `train.py:122,188-190`).
  * gradient accumulation as a `lax.scan` over microbatches inside the
    step — grads are averaged on-device and a single update is applied
    (the reference's `no_sync` + accumulate pattern, `model.py:84-86,
    136-153` — the collective naturally happens once per update).
  * masked multi-scale smooth-L1 loss with pseudo-GT support
    (`model.py:89-137`), metric suite (`metric.py`), freeze_bn
    fine-tuning mode (`model.py:40-47`).
  * latest / best / periodic checkpointing + val_results.txt
    (`model.py:388-463`).
"""
from __future__ import annotations

import functools
import json
import os
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aanet_tpu.config import Config
from aanet_tpu.ops.resize import upsample_disparity
from aanet_tpu.parallel.mesh import (
    auto_data_size,
    make_mesh,
    pad_batch,
    replicate,
    shard_batch,
)
from aanet_tpu.train.loss import pyramid_loss
from aanet_tpu.train.metrics import all_metrics, validity_mask
from aanet_tpu.train.optimizer import make_optimizer
from aanet_tpu.train.state import TrainState, create_train_state
from aanet_tpu.utils.checkpoint import (
    load_pretrained_params,
    resume_latest,
    save_checkpoint,
)
from aanet_tpu.utils.logging_util import get_logger


def make_loss_fn(model, max_disp: int, freeze_bn: bool, highest_loss_only: bool):
    def loss_fn(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        left, right = batch["left"], batch["right"]
        gt = batch["disp"]
        if freeze_bn:
            # BN uses running stats but the trace stays in training mode so
            # activation remat is active (the KITTI fine-tune at 384x1248
            # would OOM otherwise — models/aanet.py remat note).
            pyramid = model.apply(
                variables, left, right, train=True, freeze_bn=True
            )
            new_bs = batch_stats
        else:
            pyramid, mutated = model.apply(
                variables, left, right, train=True, mutable=["batch_stats"]
            )
            new_bs = mutated["batch_stats"]
        mask = validity_mask(gt, max_disp)
        pseudo = batch.get("pseudo_disp")
        pseudo_mask = None
        if pseudo is not None:
            pseudo_mask = validity_mask(pseudo, max_disp) & (~mask)
        total, aux = pyramid_loss(
            pyramid,
            gt,
            mask,
            pseudo_gt_disp=pseudo,
            pseudo_mask=pseudo_mask,
            highest_loss_only=highest_loss_only,
        )
        pred = pyramid[-1]
        if pred.shape[1:] != gt.shape[1:]:
            pred = upsample_disparity(pred, gt.shape[1:])
        metrics = all_metrics(pred, gt, mask)
        metrics["total_loss"] = total
        metrics["disp_loss"] = aux["disp_loss"]
        return total, (new_bs, metrics)

    return loss_fn


def make_train_step(
    model,
    max_disp: int,
    accumulation_steps: int = 1,
    freeze_bn: bool = False,
    highest_loss_only: bool = False,
):
    """Build the jitted train step.

    The incoming batch is the *global* batch; with accumulation A it is
    reshaped to [A, B/A, ...] and scanned, accumulating grads.
    """
    loss_fn = make_loss_fn(model, max_disp, freeze_bn, highest_loss_only)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    a = accumulation_steps

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        if a == 1:
            (loss, (new_bs, metrics)), grads = grad_fn(
                state.params, state.batch_stats, batch
            )
        else:
            micro = jax.tree.map(
                lambda x: x.reshape(a, x.shape[0] // a, *x.shape[1:]), batch
            )

            def body(carry, mb):
                bs, grads_acc = carry
                (loss, (bs, metrics)), grads = grad_fn(state.params, bs, mb)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                return (bs, grads_acc), (loss, metrics)

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (new_bs, grads), (losses, metricses) = jax.lax.scan(
                body, (state.batch_stats, zeros), micro
            )
            grads = jax.tree.map(lambda g: g / a, grads)
            loss = jnp.mean(losses)
            metrics = jax.tree.map(jnp.mean, metricses)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_bs)
        return new_state, metrics

    return train_step


def make_eval_step(model, max_disp: int):
    @jax.jit
    def eval_step(state: TrainState, batch: Dict[str, jax.Array]):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        pyramid = model.apply(
            variables, batch["left"], batch["right"], train=False
        )
        gt = batch["disp"]
        pred = pyramid[-1]
        if pred.shape[1] < gt.shape[1] or pred.shape[2] < gt.shape[2]:
            pred = upsample_disparity(pred, gt.shape[1:])
        mask = validity_mask(gt, max_disp)
        if "sample_valid" in batch:  # padded ragged batch
            mask = mask & (batch["sample_valid"][:, None, None] > 0)
        metrics = all_metrics(pred, gt, mask)
        metrics["valid"] = jnp.any(mask).astype(jnp.float32)
        # the pyramid rides along for image panels / .mat analysis dumps
        # (fetched to host only when actually used)
        return pred, metrics, pyramid

    return eval_step


class Trainer:
    """Epoch orchestrator: train/validate/checkpoint/log."""

    def __init__(
        self,
        cfg: Config,
        steps_per_epoch: int,
        model=None,
        mesh=None,
        logger=None,
    ):
        self.cfg = cfg
        self.model = model if model is not None else cfg.model.build()
        if mesh is None:
            # data axis must divide both the train microbatch and the val
            # batch so one mesh serves both jitted programs
            import math

            unit = math.gcd(cfg.data.batch_size, cfg.data.val_batch_size)
            mesh = make_mesh(data=auto_data_size(unit))
        self.mesh = mesh
        self.logger = logger or get_logger(
            os.path.join(cfg.train.checkpoint_dir, "trainLog.txt")
        )
        self.steps_per_epoch = max(1, steps_per_epoch)

        t = cfg.train
        boundaries = {
            int(m) * self.steps_per_epoch: t.lr_decay_gamma for m in t.milestones
        }
        schedule = optax.piecewise_constant_schedule(t.learning_rate, boundaries)
        self.schedule = schedule

        rng = jax.random.PRNGKey(t.seed)
        dummy_tx = optax.identity()
        # init once to get param shapes, then build the masked optimizer
        state = create_train_state(
            self.model,
            rng,
            (cfg.data.img_height, cfg.data.img_width),
            dummy_tx,
        )
        tx = make_optimizer(
            state.params,
            schedule,
            weight_decay=t.weight_decay,
            offset_lr_mult=t.offset_lr_mult,
        )
        self.state = TrainState.create(
            apply_fn=self.model.apply,
            params=state.params,
            batch_stats=state.batch_stats,
            tx=tx,
        )

        if t.pretrained:
            self.logger.info(f"loading pretrained params: {t.pretrained}")
            params, bs = load_pretrained_params(
                t.pretrained,
                self.state.params,
                self.state.batch_stats,
                strict=t.strict_load,
            )
            self.state = self.state.replace(params=params, batch_stats=bs)

        self.epoch = 0
        self.best_metric = 999.0
        self.best_epoch = -1

        if t.resume:
            template = {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state,
            }
            payload, meta = resume_latest(t.checkpoint_dir, template)
            if payload is not None:
                self.state = self.state.replace(
                    params=payload["params"],
                    batch_stats=payload["batch_stats"],
                    opt_state=payload.get("opt_state", self.state.opt_state),
                    step=meta.get("step", 0),
                )
                self.epoch = meta.get("epoch", 0)
                self.best_metric = meta.get("best_epe", 999.0)
                self.best_epoch = meta.get("best_epoch", -1)
                self.logger.info(
                    f"resumed from epoch {self.epoch}, step {int(self.state.step)}"
                )

        # replicate state over the mesh
        self.state = replicate(self.state, self.mesh)

        self.train_step = make_train_step(
            self.model,
            cfg.model.max_disp,
            accumulation_steps=t.accumulation_steps,
            freeze_bn=t.freeze_bn,
            highest_loss_only=t.highest_loss_only,
        )
        self.eval_step = make_eval_step(self.model, cfg.model.max_disp)

        os.makedirs(t.checkpoint_dir, exist_ok=True)
        self._metrics_file = os.path.join(t.checkpoint_dir, "metrics.jsonl")

        # Observability (reference model.py:157-223, 345-365, train.py:269):
        # TB-or-file summary writer for scalars / image panels / histograms,
        # .mat loss records, and a step timer for the seconds-per-window +
        # ETA log line.
        from aanet_tpu.utils.matlab_export import LossRecord
        from aanet_tpu.utils.profiling import StepTimer
        from aanet_tpu.utils.visualization import make_summary_writer

        self.writer = None
        if not t.evaluate_only:
            self.writer = make_summary_writer(
                os.path.join(t.checkpoint_dir, "tb")
            )
        self.train_record = LossRecord()
        self.val_record = LossRecord()
        self.step_timer = StepTimer(
            total_steps=self.steps_per_epoch * max(1, t.max_epoch)
        )

    # -- logging ---------------------------------------------------------

    def _log_jsonl(self, record: dict):
        with open(self._metrics_file, "a") as f:
            f.write(json.dumps(record) + "\n")

    # -- train -----------------------------------------------------------

    def train_epoch(self, batches: Iterable[Dict[str, np.ndarray]]) -> dict:
        cfg = self.cfg.train
        # Every step's metrics are kept as (tiny) device arrays and pulled
        # to the host once at epoch end — no per-step sync, and the epoch
        # mean covers every step regardless of print_freq (the reference
        # averages over all steps too, model.py:140-149).
        history: list = []
        for i, batch in enumerate(batches):
            batch = shard_batch(batch, self.mesh)
            self.state, metrics = self.train_step(self.state, batch)
            history.append(metrics)
            if (i + 1) % cfg.print_freq == 0:
                metrics = jax.tree.map(float, jax.device_get(metrics))
                timing = self.step_timer.lap(cfg.print_freq)
                step = int(jax.device_get(self.state.step))
                lr = float(self.schedule(step))
                # seconds-per-window + projected hours to finish
                # (reference model.py:157-167)
                self.logger.info(
                    "Epoch [%3d/%3d] step %5d  time %.2fs  ETA %.2fh  "
                    "lr %.2e  loss %.3f  epe %.3f"
                    % (
                        self.epoch + 1,
                        cfg.max_epoch,
                        step,
                        timing["window_seconds"],
                        timing["eta_hours"],
                        lr,
                        metrics["total_loss"],
                        metrics["epe"],
                    )
                )
                self._log_jsonl(
                    {"kind": "train", "epoch": self.epoch + 1, **metrics}
                )
                if self.writer is not None:
                    self.writer.add_scalar("base_lr", lr, step)
                    for k, v in metrics.items():
                        self.writer.add_scalar(f"train/{k}", v, step)
            if self.writer is not None and (i + 1) % cfg.summary_freq == 0:
                self._train_summary(batch)
        self.epoch += 1
        means: Dict[str, float] = {}
        if history:
            stacked = jax.device_get(history)
            keys = stacked[0].keys()
            means = {
                k: float(np.mean([float(m[k]) for m in stacked])) for k in keys
            }
            # per-epoch .mat record (reference train.py:269,
            # utilsForMatlab.py:8-44)
            self.train_record.append({"epoch": self.epoch, **means})
            self._export_matlab()

        # latest + periodic checkpoints (model.py:245-260)
        self._save("aanet_latest", with_optimizer=True)
        if self.epoch % cfg.save_ckpt_freq == 0:
            self._save(
                os.path.join("models", f"aanet_epoch_{self.epoch:03d}"),
                with_optimizer=False,
            )
        return means

    def _train_summary(self, sharded_batch):
        """summary_freq image panels + signed-error histogram on the
        current train batch (reference model.py:171-223)."""
        from aanet_tpu.utils.visualization import (
            disp_error_img,
            save_hist,
            save_images,
        )

        pred, _, _ = self.eval_step(self.state, sharded_batch)
        step = int(jax.device_get(self.state.step))
        pred = np.asarray(jax.device_get(pred))
        gt = np.asarray(jax.device_get(sharded_batch["disp"]))
        left = np.asarray(jax.device_get(sharded_batch["left"]))
        right = np.asarray(jax.device_get(sharded_batch["right"]))
        panels = {
            "left": left,
            "right": right,
            "gt_disp": gt,
            "pred_disp": pred,
            "disp_error": disp_error_img(pred[:1], gt[:1]),
        }
        save_images(self.writer, "train", panels, step)
        save_hist(self.writer, "train", pred, gt, step)

    def _export_matlab(self):
        from aanet_tpu.utils.matlab_export import save_loss_for_matlab

        try:
            save_loss_for_matlab(
                self.train_record, self.cfg.train.checkpoint_dir,
                filename="lossRecord.mat",
            )
            if self.val_record.data:
                save_loss_for_matlab(
                    self.val_record, self.cfg.train.checkpoint_dir,
                    filename="valLossRecord.mat",
                )
        except Exception as e:  # scipy missing: observability never blocks
            self.logger.warning(f"matlab export skipped: {e}")

    # -- validate --------------------------------------------------------

    def validate(self, batches: Iterable[Dict[str, np.ndarray]]) -> dict:
        # Averaging is per-BATCH, matching the reference exactly: it sums
        # one masked-mean per batch and divides by the number of batches
        # with any valid pixel (model.py:337-345, 371-377). A ragged final
        # batch is padded here with sample_valid=0 rows, so its masked
        # mean covers only the real samples — identical to the reference
        # running the smaller batch directly.
        from aanet_tpu.utils.matlab_export import (
            DEFAULT_ANALYSIS_INDICES,
            save_img_error_analysis,
        )
        from aanet_tpu.utils.visualization import (
            disp_error_img,
            save_hist,
            save_images,
        )

        cfg = self.cfg.train
        sums: Dict[str, float] = {}
        valid_samples = 0
        # the reference saves 5 evenly-spaced image panels per validation
        # (model.py:350-365); spacing needs the batch count when known
        try:
            n_batches = len(batches)
            panel_gate = {n_batches // 6 * k for k in range(1, 6)}
        except TypeError:
            panel_gate = {0, 1, 2, 3, 4}
        panel_count = 0
        sample_base = 0
        analysis = set(DEFAULT_ANALYSIS_INDICES)
        for i, batch in enumerate(batches):
            real_bs = len(next(iter(batch.values())))
            batch = pad_batch(batch, self.cfg.data.val_batch_size)
            batch.pop("left_name", None)
            batch = shard_batch(batch, self.mesh)
            pred, metrics, pyramid = self.eval_step(self.state, batch)
            metrics = jax.tree.map(float, jax.device_get(metrics))
            do_panel = self.writer is not None and i in panel_gate
            do_analysis = any(
                sample_base <= a < sample_base + real_bs for a in analysis
            )
            if do_panel or do_analysis:
                pred_np = np.asarray(jax.device_get(pred))
                gt_np = np.asarray(jax.device_get(batch["disp"]))
                left_np = np.asarray(jax.device_get(batch["left"]))
            if do_panel:
                panels = {
                    "left": left_np,
                    "gt_disp": gt_np,
                    "pred_disp": pred_np,
                    "disp_error": disp_error_img(pred_np[:1], gt_np[:1]),
                }
                save_images(self.writer, f"val{panel_count}", panels, self.epoch)
                save_hist(
                    self.writer, f"val{panel_count}", pred_np, gt_np, self.epoch
                )
                panel_count += 1
            if do_analysis:
                # .mat dump at the fixed sample indices
                # (reference model.py:345-347, utilsForMatlab.py:51-89)
                pyr_np = [np.asarray(jax.device_get(p)) for p in pyramid]
                for a in analysis:
                    j = a - sample_base
                    if 0 <= j < real_bs:
                        try:
                            save_img_error_analysis(
                                cfg.checkpoint_dir, self.epoch, a,
                                left_np[j], gt_np[j],
                                [p[j] for p in pyr_np],
                            )
                        except Exception as e:
                            self.logger.warning(f".mat analysis skipped: {e}")
            sample_base += real_bs
            if metrics.pop("valid") == 0.0:
                continue
            valid_samples += 1
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + v
        means = {k: v / max(1, valid_samples) for k, v in sums.items()}
        if self.writer is not None:
            for k, v in means.items():
                self.writer.add_scalar(f"val/{k}", v, self.epoch)
        if means:
            self.val_record.append({"epoch": self.epoch, **means})
            if not cfg.evaluate_only:
                self._export_matlab()
        self.logger.info(
            "validation epoch %d: " % self.epoch
            + "  ".join(f"{k} {v:.4f}" for k, v in sorted(means.items()))
        )
        self._log_jsonl({"kind": "val", "epoch": self.epoch, **means})

        # val_results.txt append (model.py:388-398)
        val_file = os.path.join(cfg.checkpoint_dir, "val_results.txt")
        with open(val_file, "a") as f:
            f.write("epoch: %03d\t" % self.epoch)
            for k in ("epe", "d1", "thres1", "thres2", "thres3", "thres10", "thres20"):
                if k in means:
                    f.write(f"{k}: {means[k]:.4f}\t")
            f.write("\n")

        # best-model selection (model.py:411-434)
        if not cfg.evaluate_only and means:
            current = means.get(cfg.val_metric, means.get("epe", 999.0))
            if current < self.best_metric:
                self.best_metric = current
                self.best_epoch = self.epoch
                self._save("aanet_best", with_optimizer=True, epe=current)
        return means

    def _save(self, name: str, with_optimizer: bool, epe: float = -1.0):
        state = jax.device_get(self.state)
        subdir = os.path.dirname(name)
        if subdir:
            os.makedirs(
                os.path.join(self.cfg.train.checkpoint_dir, subdir), exist_ok=True
            )
        save_checkpoint(
            self.cfg.train.checkpoint_dir,
            name,
            params=state.params,
            batch_stats=state.batch_stats,
            opt_state=state.opt_state if with_optimizer else None,
            step=int(state.step),
            epoch=self.epoch,
            epe=epe,
            best_epe=self.best_metric,
            best_epoch=self.best_epoch,
        )
