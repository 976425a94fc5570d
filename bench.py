"""Benchmark: AANet inference latency, KITTI protocol.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Protocol parity with the reference's timing mode
(`inference.py:145,164-175` / MODEL_ZOO.md:5-9): batch 1, 384x1248,
warmup, then averaged wall-clock over repeated forwards of the final
disparity. Baseline: 60 ms/pair on V100 (MODEL_ZOO.md:26, README.md:27).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MS = 60.0  # AANet KITTI 384x1248, V100 (MODEL_ZOO.md:26)


def main():
    import os

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/aanet_tpu_xla"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from aanet_tpu.config import preset

    model = preset("aanet").build()
    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((1, 96, 96, 3), jnp.float32)
    init = jax.jit(lambda r, a, b: model.init(r, a, b, train=False))
    variables = init(rng, small, small)

    # Parameters MUST be jit *arguments*, not closure captures: captured
    # arrays are baked into the program as constants, which bloats
    # compilation (~20 min) and slows the compiled program >100x.
    fwd = jax.jit(lambda v, l, r: model.apply(v, l, r, train=False)[-1])

    def forward(left, right):
        return fwd(variables, left, right)

    h, w = 384, 1248
    rs = np.random.RandomState(0)
    left = jnp.asarray(rs.rand(1, h, w, 3), jnp.float32)
    right = jnp.asarray(rs.rand(1, h, w, 3), jnp.float32)

    # warmup (compile + 10 runs, mirroring inference.py:164-168)
    jax.block_until_ready(forward(left, right))
    for _ in range(10):
        jax.block_until_ready(forward(left, right))

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(left, right)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1000.0

    print(
        json.dumps(
            {
                "metric": "aanet_kitti_384x1248_latency",
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
