"""Checkpointing: latest / best / periodic policy.

Reference `utils/utils.py:53-143` + `model.py:411-463`: checkpoint dicts
{epoch, num_iter, epe, best_epe, best_epoch, state_dict}; files
aanet_latest / aanet_best / models/aanet_epoch_NNN; resume-latest by
glob; non-strict pretrained loading for cross-variant fine-tuning.

Ours: a msgpack file (flax.serialization) holding the param/batch_stats/
opt_state pytrees plus a sidecar JSON with the scalar metadata. Pytrees
are host-gathered before writing so checkpoints are mesh-independent.
"""
from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    ckpt_dir: str,
    name: str,
    *,
    params,
    batch_stats=None,
    opt_state=None,
    step: int = 0,
    epoch: int = 0,
    epe: float = -1.0,
    best_epe: float = 999.0,
    best_epoch: int = -1,
) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "params": _to_host(params),
        "batch_stats": _to_host(batch_stats) if batch_stats is not None else {},
    }
    if opt_state is not None:
        payload["opt_state"] = _to_host(opt_state)
    path = os.path.join(ckpt_dir, f"{name}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(payload))
    os.replace(tmp, path)
    meta = {
        "step": int(step),
        "epoch": int(epoch),
        "epe": float(epe),
        "best_epe": float(best_epe),
        "best_epoch": int(best_epoch),
    }
    with open(os.path.join(ckpt_dir, f"{name}.json"), "w") as f:
        json.dump(meta, f)
    return path


def load_checkpoint(path: str, template: dict) -> tuple[dict, dict]:
    """Load a checkpoint into the shape of `template` (same keys)."""
    with open(path, "rb") as f:
        payload = serialization.from_bytes(template, f.read())
    meta_path = os.path.splitext(path)[0] + ".json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return payload, meta


def resume_latest(ckpt_dir: str, template: dict, prefix: str = "aanet_latest"):
    """Load <prefix>.msgpack if present, else the newest epoch checkpoint
    (reference resume_latest_ckpt glob-sort, utils/utils.py:133-143)."""
    candidates = [os.path.join(ckpt_dir, f"{prefix}.msgpack")]
    candidates += sorted(
        glob.glob(os.path.join(ckpt_dir, "models", "aanet_epoch_*.msgpack")),
        key=lambda p: int(re.findall(r"(\d+)", os.path.basename(p))[-1]),
        reverse=True,
    )
    for c in candidates:
        if os.path.exists(c):
            return load_checkpoint(c, template)
    return None, None


def load_pretrained_params(
    path: str, params, batch_stats=None, strict: bool = False
):
    """Non-strict pretrained loading: copy every leaf whose path exists in
    both trees with a matching shape (reference utils/utils.py:88-130)."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())

    def merge(dst: Any, src: Any, where: str):
        if isinstance(dst, dict):
            out = {}
            for k, v in dst.items():
                if isinstance(src, dict) and k in src:
                    out[k] = merge(v, src[k], f"{where}/{k}")
                elif strict:
                    raise KeyError(f"missing {where}/{k} in checkpoint")
                else:
                    out[k] = v
            return out
        src_arr = np.asarray(src)
        if hasattr(dst, "shape") and tuple(dst.shape) != tuple(src_arr.shape):
            if strict:
                raise ValueError(
                    f"shape mismatch at {where}: {dst.shape} vs {src_arr.shape}"
                )
            return dst
        return src_arr.astype(np.asarray(dst).dtype)

    new_params = merge(params, raw.get("params", {}), "params")
    if batch_stats is not None:
        new_bs = merge(batch_stats, raw.get("batch_stats", {}), "batch_stats")
        return new_params, new_bs
    return new_params
