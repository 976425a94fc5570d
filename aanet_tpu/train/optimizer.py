"""Optimizer: Adam with dual learning-rate groups + MultiStep decay.

Reference `train.py:199-238`: Adam(lr=1e-3, weight_decay=1e-4) with
offset_conv parameters at 0.1x LR (`utils/utils.py:156-169`), and a
MultiStepLR schedule (x gamma at each milestone epoch).

optax construction: weight decay is added to the raw gradient (torch Adam
semantics), then Adam moments, then the LR, then a masked 0.1x scale on
every parameter whose path contains 'offset_conv'.
"""
from __future__ import annotations

from typing import Sequence

import jax
import optax


def lr_at_epoch(
    base_lr: float,
    epoch: int,
    milestones: Sequence[int],
    gamma: float = 0.5,
) -> float:
    """MultiStepLR: base_lr * gamma^(#milestones <= epoch)."""
    n = sum(1 for m in milestones if epoch >= m)
    return base_lr * (gamma**n)


def offset_param_mask(params) -> object:
    """Pytree of bools: True for offset_conv weights/biases
    (the reference's filter_specific_params, utils/utils.py:155-160)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def is_offset(path) -> bool:
        return any("offset_conv" in str(getattr(k, "key", k)) for k in path)

    paths = {tuple(p): is_offset(p) for p, _ in flat}

    def mark(path, _leaf):
        return paths[tuple(path)]

    return jax.tree_util.tree_map_with_path(mark, params)


def make_optimizer(
    params,
    learning_rate,
    weight_decay: float = 1e-4,
    offset_lr_mult: float = 0.1,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Adam with torch-style weight decay and the dual-LR rule.

    `learning_rate` may be a float or an optax schedule (callable of the
    update step).
    """
    mask = offset_param_mask(params)
    chain = [
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
    ]
    if callable(learning_rate):
        chain.append(optax.scale_by_schedule(lambda s: -learning_rate(s)))
    else:
        chain.append(optax.scale(-learning_rate))
    # offset_conv params at 0.1x — applied after the LR scale
    chain.append(optax.masked(optax.scale(offset_lr_mult), mask))
    return optax.chain(*chain)
