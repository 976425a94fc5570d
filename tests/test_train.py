"""Training engine tests: metrics/loss golden values, dual-LR optimizer,
and an end-to-end overfit on a synthetic stereo pair over the 8-device
virtual CPU mesh (data-parallel + gradient accumulation)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from aanet_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from aanet_tpu.models import AANet
from aanet_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from aanet_tpu.train.loss import pyramid_loss, smooth_l1
from aanet_tpu.train.metrics import all_metrics, d1_metric, epe_metric, thres_metric, validity_mask
from aanet_tpu.train.optimizer import make_optimizer, offset_param_mask, lr_at_epoch
from aanet_tpu.train.trainer import make_eval_step, make_train_step
from aanet_tpu.train.state import TrainState, create_train_state


def test_metrics_match_reference_formulas():
    rs = np.random.RandomState(0)
    gt = rs.rand(2, 8, 10).astype(np.float32) * 60
    est = gt + rs.randn(2, 8, 10).astype(np.float32) * 4
    mask = gt > 20

    e = np.abs(est - gt)[mask]
    want_epe = e.mean()
    want_d1 = ((e > 3) & (e / gt[mask] > 0.05)).mean()
    want_t3 = (e > 3).mean()

    np.testing.assert_allclose(
        float(epe_metric(jnp.asarray(est), jnp.asarray(gt), jnp.asarray(mask))),
        want_epe, rtol=1e-5)
    np.testing.assert_allclose(
        float(d1_metric(jnp.asarray(est), jnp.asarray(gt), jnp.asarray(mask))),
        want_d1, rtol=1e-5)
    np.testing.assert_allclose(
        float(thres_metric(jnp.asarray(est), jnp.asarray(gt), jnp.asarray(mask), 3.0)),
        want_t3, rtol=1e-5)


def test_smooth_l1_matches_torch():
    import torch
    import torch.nn.functional as F

    a = np.random.RandomState(1).randn(50).astype(np.float32) * 2
    b = np.random.RandomState(2).randn(50).astype(np.float32) * 2
    want = F.smooth_l1_loss(
        torch.from_numpy(a), torch.from_numpy(b), reduction="none"
    ).numpy()
    got = np.asarray(smooth_l1(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(want, got, atol=1e-6)


def test_pyramid_loss_weights_and_rescale():
    """Hand-check: 2-level pyramid, constant offsets, upsample-rescale."""
    gt = jnp.full((1, 8, 8), 10.0)
    mask = jnp.ones((1, 8, 8), bool)
    # low-res pred at 4x4 with value 5 -> upsampled x2 & rescaled -> 10 => loss 0
    low = jnp.full((1, 4, 4), 5.0)
    full = jnp.full((1, 8, 8), 8.0)  # |8-10|=2 -> smooth_l1 = 1.5
    total, aux = pyramid_loss([low, low, full], gt, mask)
    # weights [1,1,1] for 3 outputs; first two contribute 0
    np.testing.assert_allclose(float(total), 1.5, atol=1e-5)

    # 5-level weighting [1/3, 2/3, 1, 1, 1]
    preds = [jnp.full((1, 8, 8), 8.0)] * 5
    total5, _ = pyramid_loss(preds, gt, mask)
    np.testing.assert_allclose(float(total5), 1.5 * (1 / 3 + 2 / 3 + 3), atol=1e-4)


def test_pyramid_loss_empty_mask_is_finite():
    gt = jnp.zeros((1, 8, 8))
    mask = jnp.zeros((1, 8, 8), bool)
    total, _ = pyramid_loss([jnp.ones((1, 8, 8))], gt, mask)
    assert np.isfinite(float(total))
    assert float(total) == 0.0


def test_pseudo_gt_loss_covers_only_invalid_gt_pixels():
    """Numeric check of the pseudo-GT branch (reference model.py:73-76,
    127-132): the pseudo term supervises exactly (~mask & pseudo_valid)
    pixels and total = disp_loss + pseudo_loss."""
    rs = np.random.RandomState(3)
    pred = jnp.asarray(rs.rand(1, 8, 8).astype(np.float32) * 10)
    gt = np.zeros((1, 8, 8), np.float32)
    gt[:, :, :4] = 5.0  # right half has no GT
    gt = jnp.asarray(gt)
    pseudo = jnp.asarray(rs.rand(1, 8, 8).astype(np.float32) * 10 + 1)
    mask = validity_mask(gt, 24)
    pseudo_mask = validity_mask(pseudo, 24) & (~mask)

    total, aux = pyramid_loss(
        [pred], gt, mask, pseudo_gt_disp=pseudo, pseudo_mask=pseudo_mask
    )
    assert float(aux["pseudo_loss"]) > 0.0
    np.testing.assert_allclose(
        float(total),
        float(aux["disp_loss"]) + float(aux["pseudo_loss"]),
        rtol=1e-6,
    )
    # golden: hand-computed masked means over the two disjoint regions
    want_disp = np.asarray(smooth_l1(pred, gt))[np.asarray(mask)].mean()
    want_pseudo = np.asarray(smooth_l1(pred, pseudo))[np.asarray(pseudo_mask)].mean()
    np.testing.assert_allclose(float(aux["disp_loss"]), want_disp, rtol=1e-5)
    np.testing.assert_allclose(float(aux["pseudo_loss"]), want_pseudo, rtol=1e-5)

    # perturbing pseudo on GT-VALID pixels must not change the loss at all
    pseudo2 = np.asarray(pseudo).copy()
    pseudo2[:, :, :4] += 100.0
    total2, aux2 = pyramid_loss(
        [pred], gt, mask, pseudo_gt_disp=jnp.asarray(pseudo2),
        pseudo_mask=pseudo_mask,
    )
    np.testing.assert_allclose(float(total2), float(total), rtol=1e-6)
    # ... while perturbing it on the uncovered pixels must
    pseudo3 = np.asarray(pseudo).copy()
    pseudo3[:, :, 4:] += 3.0
    total3, _ = pyramid_loss(
        [pred], gt, mask, pseudo_gt_disp=jnp.asarray(pseudo3),
        pseudo_mask=pseudo_mask,
    )
    assert abs(float(total3) - float(total)) > 1e-3


@pytest.mark.slow
def test_train_step_with_pseudo_disp_batch():
    """End-to-end: make_train_step consumes a batch carrying pseudo_disp
    (the KITTI fine-tune recipes' supervision path) — the pseudo term must
    actually contribute (total_loss > disp_loss) and training must step."""
    model = _tiny_model()
    tx_probe = optax.identity()
    state0 = create_train_state(model, jax.random.PRNGKey(2), (32, 64), tx_probe)
    tx = make_optimizer(state0.params, 1e-3, weight_decay=0.0)
    state = TrainState.create(
        apply_fn=model.apply,
        params=state0.params,
        batch_stats=state0.batch_stats,
        tx=tx,
    )
    batch = _synthetic_batch(batch=2, h=32, w=64)
    # knock out GT on the right half; pseudo-GT covers the whole image
    disp = batch["disp"].copy()
    disp[:, :, 32:] = 0.0
    batch["disp"] = disp
    batch["pseudo_disp"] = np.full((2, 32, 64), 4.0, np.float32)

    # snapshot first: the jitted step donates the input state's buffers
    p_before = jax.tree.leaves(jax.device_get(state.params))
    step = make_train_step(model, max_disp=24)
    new_state, metrics = step(state, batch)
    total = float(metrics["total_loss"])
    disp_l = float(metrics["disp_loss"])
    assert np.isfinite(total)
    assert total > disp_l + 1e-6, (total, disp_l)
    p_after = jax.tree.leaves(new_state.params)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(p_before, p_after)
    )


def test_offset_params_get_scaled_lr():
    params = {
        "block": {"kernel": jnp.ones((4,))},
        "deform": {"offset_conv": {"kernel": jnp.ones((4,)), "bias": jnp.ones((2,))}},
    }
    mask = offset_param_mask(params)
    assert mask["block"]["kernel"] is False
    assert mask["deform"]["offset_conv"]["kernel"] is True
    assert mask["deform"]["offset_conv"]["bias"] is True

    tx = make_optimizer(params, 1e-3, weight_decay=0.0, offset_lr_mult=0.1)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    base = float(updates["block"]["kernel"][0])
    off = float(updates["deform"]["offset_conv"]["kernel"][0])
    np.testing.assert_allclose(off / base, 0.1, rtol=1e-5)


def test_lr_at_epoch_multistep():
    assert lr_at_epoch(1e-3, 0, (20, 30)) == 1e-3
    assert lr_at_epoch(1e-3, 20, (20, 30)) == pytest.approx(5e-4)
    assert lr_at_epoch(1e-3, 35, (20, 30)) == pytest.approx(2.5e-4)


def _tiny_model():
    # Smallest config that still exercises the deformable ISA path in
    # training (num_deform_blocks=1); the backbone's deform bottlenecks are
    # disabled to keep the CPU compile of fwd+bwd tractable on small boxes.
    return AANet(
        max_disp=24,
        feature_type="aanet",
        feature_pyramid_network=True,
        num_fusions=1,
        num_deform_blocks=1,
        no_feature_mdconv=True,
        refinement_type="stereodrnet",
    )


def _synthetic_batch(batch=8, h=48, w=96, d=4.0, seed=0):
    rs = np.random.RandomState(seed)
    base = rs.rand(batch, h, w + 8, 3).astype(np.float32)
    # smooth horizontally so bilinear shifts are learnable
    base = (base + np.roll(base, 1, 2) + np.roll(base, 2, 2)) / 3
    right = base[:, :, : w, :]
    left = base[:, :, int(d) : w + int(d), :]  # left[x] == right[x - d]
    disp = np.full((batch, h, w), d, np.float32)
    return {"left": left, "right": right, "disp": disp}


@pytest.mark.slow
def test_train_step_overfits_synthetic_pair_on_mesh():
    """End-to-end: jitted data-parallel train step with accumulation=2 on
    the 8-device CPU mesh; loss must drop substantially and the final
    EPE must beat the at-init EPE."""
    model = _tiny_model()
    mesh = make_mesh()  # 8 virtual devices
    assert mesh.devices.size == 8

    tx_probe = optax.identity()
    state0 = create_train_state(model, jax.random.PRNGKey(0), (32, 64), tx_probe)
    tx = make_optimizer(state0.params, 1e-3, weight_decay=0.0)
    state = TrainState.create(
        apply_fn=model.apply,
        params=state0.params,
        batch_stats=state0.batch_stats,
        tx=tx,
    )
    state = replicate(state, mesh)

    step = make_train_step(model, max_disp=24, accumulation_steps=2)
    batch = shard_batch(_synthetic_batch(batch=8, h=32, w=64), mesh)

    losses = []
    for i in range(20):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses[::6]

    eval_step = make_eval_step(model, max_disp=24)
    _, m, _ = eval_step(state, batch)
    assert float(m["epe"]) < 4.0  # at-init EPE is ~disparity magnitude


@pytest.mark.slow
def test_freeze_bn_keeps_stats_and_remat_active():
    """freeze_bn (reference model.py:40-47): BN must use running stats and
    batch_stats must not change, while the training trace still carries
    rematerialisation (VERDICT r2: freeze_bn used to disable remat, so the
    exact workload it exists for — KITTI fine-tune at full res — lost its
    memory ceiling)."""
    model = _tiny_model()  # remat=True default
    tx_probe = optax.identity()
    state0 = create_train_state(model, jax.random.PRNGKey(1), (48, 96), tx_probe)
    tx = make_optimizer(state0.params, 1e-3, weight_decay=0.0)
    state = TrainState.create(
        apply_fn=model.apply,
        params=state0.params,
        batch_stats=state0.batch_stats,
        tx=tx,
    )
    batch = _synthetic_batch(batch=2, h=48, w=96)

    # 1) the frozen-BN training forward equals the eval forward (up to
    # float associativity: the eval path runs feature extraction once on
    # the two views stacked on the batch axis — same math, different
    # summation order, so tolerance is loose-ulp rather than exact)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out_frozen = model.apply(
        variables, batch["left"], batch["right"], train=True, freeze_bn=True
    )
    out_eval = model.apply(
        variables, batch["left"], batch["right"], train=False
    )
    for a, b in zip(out_frozen, out_eval):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)

    # 2) the jaxpr of the frozen-BN TRAINING trace still contains remat
    jaxpr = jax.make_jaxpr(
        lambda p, l, r: model.apply(
            {"params": p, "batch_stats": state.batch_stats},
            l, r, train=True, freeze_bn=True,
        )
    )(state.params, batch["left"], batch["right"])
    assert "remat" in str(jaxpr)

    # 3) a freeze_bn train step updates params but not batch_stats
    # (snapshot first: the jitted step donates the input state's buffers)
    bs_before = jax.tree.leaves(jax.device_get(state.batch_stats))
    p_before = jax.tree.leaves(jax.device_get(state.params))
    step = make_train_step(model, max_disp=24, freeze_bn=True)
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    bs_after = jax.tree.leaves(new_state.batch_stats)
    for a, b in zip(bs_before, bs_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    p_after = jax.tree.leaves(new_state.params)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(p_before, p_after)
    )
