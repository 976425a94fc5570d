"""Intra-sample (width) sharding over the 'model' mesh axis.

Covers SURVEY §5's "long-context analog": the cost-volume pyramid and
full-res refinement of one high-resolution pair sharded across chips.
The claim under test is that the W-sharded global-view jit is
numerically the SAME program as the unsharded forward — XLA inserts the
conv halo exchanges and cost-volume band communication, we assert the
outputs match.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aanet_tpu.models import AANet
from aanet_tpu.parallel.mesh import make_mesh
from aanet_tpu.parallel.spatial import (
    image_sharding,
    make_spatial_forward,
    shard_images,
)


def _tiny_model():
    # Deformable aggregation ON (gathers cross shard boundaries), FPN on,
    # two refinement stages — every stage with cross-W communication.
    return AANet(
        max_disp=24,
        feature_type="aanet",
        feature_pyramid_network=True,
        num_fusions=1,
        num_deform_blocks=1,
        no_feature_mdconv=True,
        refinement_type="stereodrnet",
    )


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_width_sharded_forward_matches_unsharded():
    model = _tiny_model()
    h, w = 48, 96
    rs = np.random.RandomState(0)
    left = jnp.asarray(rs.rand(2, h, w, 3), jnp.float32)
    right = jnp.asarray(rs.rand(2, h, w, 3), jnp.float32)
    variables = jax.jit(lambda r, a, b: model.init(r, a, b, train=False))(
        jax.random.PRNGKey(0), left, right
    )
    ref = jax.jit(lambda v, l, r: model.apply(v, l, r, train=False))(
        variables, left, right
    )

    mesh = make_mesh(data=2, model=2)
    fwd = make_spatial_forward(model, mesh)
    sh = image_sharding(mesh)
    out = fwd(
        variables, jax.device_put(left, sh), jax.device_put(right, sh)
    )
    assert len(out) == len(ref)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
        )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_shard_images_layout():
    mesh = make_mesh(data=2, model=2)
    batch = {
        "left": np.zeros((2, 24, 48, 3), np.float32),
        "disp": np.zeros((2, 24, 48), np.float32),
        "names": ["a", "b"],
    }
    out = shard_images(batch, mesh)
    # 4D arrays get the width sharding, 3D get plain data sharding.
    assert out["left"].sharding.spec == jax.sharding.PartitionSpec(
        "data", None, "model", None
    )
    assert out["disp"].sharding.spec == jax.sharding.PartitionSpec("data")
    assert out["names"] == ["a", "b"]
