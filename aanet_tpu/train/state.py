"""Train state: params + BN batch stats + optimizer state."""
from __future__ import annotations

from typing import Any, Callable

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState extended with BatchNorm running statistics."""

    batch_stats: Any = None


def create_train_state(
    model,
    rng: jax.Array,
    input_hw: tuple[int, int],
    tx: optax.GradientTransformation,
    batch_size: int = 1,
) -> TrainState:
    h, w = input_hw
    dummy = jnp.zeros((batch_size, h, w, 3), jnp.float32)
    # jit the init: run op-by-op it pays one dispatch round-trip per op,
    # which is pathological on remote TPU backends (minutes vs seconds)
    init = jax.jit(lambda r, a, b: model.init(r, a, b, train=False))
    variables = init(rng, dummy, dummy)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
