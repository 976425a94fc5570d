"""Static cost analysis: parameter counts and FLOPs from XLA.

Replaces the reference's `thop/` forward-hook FLOPs profiler
(`thop/profile.py:23`, `thop/count_hooks.py:21-62`, including its custom
deformable-conv formulas): on TPU the compiler already knows the exact
cost of the optimized program, so FLOPs come from XLA's
`compiled.cost_analysis()` — they automatically include the offset/mask
convolutions and the gather arithmetic of the deformable ops.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params) -> int:
    """Total parameter count of a pytree."""
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def cost_analysis(fn, *example_args) -> Dict[str, float]:
    """Lower + compile `fn` and return XLA's cost analysis dict
    (keys include 'flops', 'bytes accessed', ...)."""
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, (list, tuple)):  # older jax returns [dict]
        analysis = analysis[0]
    return dict(analysis or {})


def profile_model(
    model,
    variables=None,
    input_hw: Tuple[int, int] = (576, 960),
    batch_size: int = 1,
    rng: Optional[jax.Array] = None,
) -> Dict[str, Any]:
    """Params + forward FLOPs for a stereo model at a given resolution.

    Mirrors the reference's `thop.profile(aanet, inputs=(left, right))`
    usage (`train.py:172-175`) but with compiler-exact numbers.
    """
    h, w = input_hw
    left = jnp.zeros((batch_size, h, w, 3), jnp.float32)
    right = jnp.zeros((batch_size, h, w, 3), jnp.float32)
    if variables is None:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        variables = jax.jit(lambda r, a, b: model.init(r, a, b, train=False))(
            rng, left, right
        )

    def forward(l, r):
        return model.apply(variables, l, r, train=False)[-1]

    analysis = cost_analysis(forward, left, right)
    flops = float(analysis.get("flops", 0.0))
    return {
        "params": count_params(variables.get("params", variables)),
        "flops": flops,
        "gflops": flops / 1e9,
        "bytes_accessed": float(analysis.get("bytes accessed", 0.0)),
        "input_hw": (h, w),
        "analysis": analysis,
    }
