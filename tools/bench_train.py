"""Training-throughput benchmark: samples/sec of the jitted train step.

The reference's published recipe is batch 64 on 4x V100-32G at 288x576
(SceneFlow, `README.md:110`, `scripts/aanet+_train.sh:17`); the epochs
take ~1 hour each, i.e. ~10 samples/s/GPU. This measures our end-to-end
train-step throughput (forward + backward + deform scatter-adds + BN
cross-replica stats + Adam update) on the current backend.

Usage: python tools/bench_train.py [--batch B] [--accum A] [--hw H W]
       [--dtype bfloat16] [--preset aanet]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/aanet_tpu_xla"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import dataclasses

    from aanet_tpu.config import preset
    from aanet_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from aanet_tpu.train.optimizer import make_optimizer
    from aanet_tpu.train.state import TrainState, create_train_state
    from aanet_tpu.train.trainer import make_train_step

    def arg(flag, default, cast):
        if flag in sys.argv:
            return cast(sys.argv[sys.argv.index(flag) + 1])
        return default

    batch = arg("--batch", 16, int)
    accum = arg("--accum", 1, int)
    h = arg("--hw", 288, lambda v: int(v))
    w = int(sys.argv[sys.argv.index("--hw") + 2]) if "--hw" in sys.argv else 576
    dtype = arg("--dtype", None, str)
    name = arg("--preset", "aanet", str)

    mc = preset(name)
    if dtype:
        mc = dataclasses.replace(mc, dtype=dtype)
    model = mc.build()
    max_disp = mc.max_disp

    print(
        f"backend={jax.default_backend()} preset={name} batch={batch} "
        f"accum={accum} {h}x{w} dtype={dtype or 'float32'}"
    )

    mesh = make_mesh()
    state0 = create_train_state(model, jax.random.PRNGKey(0), (h, w), optax.identity())
    tx = make_optimizer(state0.params, 1e-3)
    state = TrainState.create(
        apply_fn=model.apply,
        params=state0.params,
        batch_stats=state0.batch_stats,
        tx=tx,
    )
    state = replicate(state, mesh)

    rs = np.random.RandomState(0)
    data = {
        "left": rs.rand(batch, h, w, 3).astype(np.float32),
        "right": rs.rand(batch, h, w, 3).astype(np.float32),
        "disp": (rs.rand(batch, h, w) * max_disp * 0.8).astype(np.float32),
    }
    data = shard_batch(data, mesh)

    step = make_train_step(model, max_disp=max_disp, accumulation_steps=accum)

    # Execution-forcing protocol (docs/PERF_r05.md §1): K steps chained
    # through the TrainState (training is inherently sequential) + ONE
    # metric readback; `block_until_ready` does not force execution on
    # this backend and the old loop here measured dispatch time.
    from aanet_tpu.utils.timing import measure_rtt

    t0 = time.time()
    state, metrics = step(state, data)
    float(jax.device_get(metrics["total_loss"]))
    print(f"compile+first step: {time.time() - t0:.1f}s")

    # ONE timed window: the step donates its input state, so a second
    # window would reuse donated buffers.
    iters = 6
    rtt = measure_rtt()
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, data)
    float(jax.device_get(metrics["total_loss"]))  # forces the chain
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / iters
    print(
        f"train step: {dt * 1000:.1f} ms  ->  {batch / dt:.1f} samples/s "
        f"(reference recipe: ~40 samples/s on 4x V100-32G)"
    )


if __name__ == "__main__":
    main()
