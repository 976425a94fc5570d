"""bf16-vs-f32 accuracy at TRAINED weights (VERDICT r4 item 5).

bench.py's random-weights bf16 delta is a pessimistic proxy: an
untrained correlation volume gives a near-uniform softmax and
soft-argmin amplifies last-bit rounding into whole-pixel shifts. The
honest accuracy statement must come from trained weights, so this test
loads the committed flagship checkpoint from the synthetic convergence
run (`artifacts/aanet_synthetic_best.msgpack.gz`, produced by the
docs/CONVERGENCE_r04.md recipe re-run on the round-5 code) and asserts
the bf16 forward stays within a small fraction of a pixel of f32 on
in-distribution pairs.
"""
import gzip
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts",
    "aanet_synthetic_best.msgpack.gz",
)


@pytest.mark.skipif(
    not os.path.exists(ARTIFACT), reason="trained checkpoint not committed"
)
def test_bf16_delta_at_trained_weights(tmp_path):
    import dataclasses

    from flax import serialization

    from aanet_tpu.config import preset

    cfg = dataclasses.replace(preset("aanet"), max_disp=48)
    model = cfg.build()
    h, w = 96, 192
    init = jax.jit(lambda r, a, b: model.init(r, a, b, train=False))
    variables = init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, h, w, 3)),
    )
    with gzip.open(ARTIFACT, "rb") as f:
        payload = serialization.from_bytes(
            {
                "params": jax.device_get(variables["params"]),
                "batch_stats": jax.device_get(variables["batch_stats"]),
            },
            f.read(),
        )
    variables = {
        "params": payload["params"],
        "batch_stats": payload["batch_stats"],
    }

    # in-distribution pair: smoothed noise with a constant integer shift
    # (the synthetic convergence distribution, tools/synthetic_dataset.py)
    rs = np.random.RandomState(7)
    d = 6
    base = rs.rand(h, w + 16, 3)
    base = (base + np.roll(base, 1, 1) + np.roll(base, 2, 1)) / 3
    right = base[:, :w].astype(np.float32)
    left = base[:, d : w + d].astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    lb = jnp.asarray(((left - mean) / std)[None])
    rb = jnp.asarray(((right - mean) / std)[None])

    f32 = dataclasses.replace(cfg, dtype="float32").build()
    b16 = dataclasses.replace(cfg, dtype="bfloat16").build()
    p32 = np.asarray(
        jax.jit(lambda v, l, r: f32.apply(v, l, r, train=False)[-1])(
            variables, lb, rb
        )
    )
    p16 = np.asarray(
        jax.jit(lambda v, l, r: b16.apply(v, l, r, train=False)[-1])(
            variables, lb, rb
        )
    )

    # trained-weights EPE sanity: the checkpoint reached sub-pixel val
    # EPE on this distribution
    epe32 = float(np.abs(p32 - d).mean())
    assert epe32 < 2.0, f"f32 EPE {epe32:.3f} — checkpoint not trained?"

    delta = np.abs(p16.astype(np.float32) - p32)
    assert float(delta.mean()) < 0.15, float(delta.mean())
    assert float(np.quantile(delta, 0.99)) < 0.6, float(
        np.quantile(delta, 0.99)
    )
