"""Forward-shape tests for every model preset (the reference's model menu,
scripts/{aanet,aanet+,stereonet-aa,psmnet-aa,ganet-aa,gcnet-aa}_*.sh).

Each preset must build, run a forward pass at a preset-valid size, and
produce a coarse-to-fine pyramid whose finest map matches the input
resolution. psmnet-aa additionally pins the SPP minimum-size contract
(reference nets/feature.py:250-265 pools fixed 64px windows at H/4).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aanet_tpu.config import MODEL_PRESETS, preset

# (preset, (h, w), max_disp, expected number of pyramid outputs).
# Sizes follow each preset's divisibility contract: hourglass refinement
# needs multiples of 96 (predict.py:148-151), PSMNet's SPP needs >=256
# inputs, and the coarsest cost-volume D must stay divisible by the
# deformable groups (2) — the reference has the identical constraints.
CASES = [
    ("aanet", (96, 144), 48, 5),  # 3 scales + 2 refinements
    ("aanet+", (96, 192), 48, 5),
    ("stereonet-aa", (96, 144), 48, 3),  # num_scales=1 -> 1 + 2 refinements
    ("psmnet-aa", (288, 320), 192, 3),  # no_intermediate_supervision -> 1 + 2
    ("ganet-aa", (96, 144), 48, 3),
    ("gcnet-aa", (96, 144), 48, 2),  # num_downsample=1 -> 1 + 1
]


def _forward(name, h, w, max_disp=48):
    cfg = preset(name)
    cfg.max_disp = max_disp
    model = cfg.build()
    rng = np.random.RandomState(hash(name) % 2**31)
    left = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    right = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)
    return model.apply(variables, left, right, train=False)


@pytest.mark.slow
@pytest.mark.parametrize("name,size,max_disp,n_out", CASES)
def test_preset_forward(name, size, max_disp, n_out):
    h, w = size
    out = _forward(name, h, w, max_disp)
    assert len(out) == n_out, [tuple(o.shape) for o in out]
    # coarse-to-fine, finest at full input resolution
    areas = [o.shape[1] * o.shape[2] for o in out]
    assert areas == sorted(areas)
    assert tuple(out[-1].shape) == (1, h, w)
    for o in out:
        assert np.isfinite(np.asarray(o)).all()


def test_psmnet_min_size_is_a_clear_error():
    with pytest.raises(ValueError, match="SPP"):
        _forward("psmnet-aa", 96, 144, 192)


def test_all_presets_covered():
    assert {c[0] for c in CASES} == set(MODEL_PRESETS)


def test_cli_boolean_flags_are_two_way():
    """A preset's True boolean must be switchable off from the CLI
    (--no-<flag>), and unspecified booleans must keep the preset value."""
    from aanet_tpu.cli import build_config, main
    import argparse

    parser = argparse.ArgumentParser()
    from aanet_tpu.cli import _add_model_args

    _add_model_args(parser)
    # keep: psmnet-aa sets feature_pyramid=True, no_intermediate_supervision=True
    args = parser.parse_args(["--preset", "psmnet-aa"])
    cfg = build_config(args)
    assert cfg.model.feature_pyramid is True
    assert cfg.model.no_intermediate_supervision is True
    # override both off
    args = parser.parse_args(
        [
            "--preset",
            "psmnet-aa",
            "--no-feature_pyramid",
            "--no-no_intermediate_supervision",
        ]
    )
    cfg = build_config(args)
    assert cfg.model.feature_pyramid is False
    assert cfg.model.no_intermediate_supervision is False
