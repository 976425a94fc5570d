"""Tests for the auxiliary subsystems: visualization, MATLAB export,
FLOPs/params profiling, and runtime profiling helpers."""
import json
import os

import numpy as np
import pytest


def test_error_colormap_bins_and_error_img():
    from aanet_tpu.utils.visualization import disp_error_img, gen_error_colormap

    cmap = gen_error_colormap()
    assert cmap.shape == (10, 5)
    assert np.all(cmap[:-1, 1] == cmap[1:, 0])  # contiguous bins

    gt = np.full((6, 8), 30.0, np.float32)
    gt[0, 0] = 0.0  # invalid
    est = gt.copy()
    est[2, 2] += 100.0  # huge error -> last (red) bin
    img = disp_error_img(est, gt, dilate_radius=0)
    assert img.shape == (6, 8, 3)
    # invalid GT stays black
    np.testing.assert_array_equal(img[0, 0], 0.0)
    # zero error lands in the first (blue) bin
    np.testing.assert_allclose(img[1, 1] * 255, [49, 54, 149], atol=0.5)
    # huge error in the last (red) bin
    np.testing.assert_allclose(img[2, 2] * 255, [165, 0, 38], atol=0.5)


def test_disp_to_color_range():
    from aanet_tpu.utils.visualization import disp_to_color

    disp = np.linspace(0, 192, 64, dtype=np.float32).reshape(8, 8)
    img = disp_to_color(disp, max_disp=192)
    assert img.shape == (8, 8, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0
    assert not np.allclose(img[0, 0], img[-1, -1])  # cmap actually varies


def test_file_summary_writer_and_panels(tmp_path):
    from aanet_tpu.utils.visualization import (
        FileSummaryWriter,
        save_hist,
        save_images,
    )

    w = FileSummaryWriter(str(tmp_path))
    w.add_scalar("val/epe", 1.25, 3)
    rs = np.random.RandomState(0)
    save_images(
        w,
        "val",
        {
            "left": rs.rand(2, 8, 10, 3).astype(np.float32),  # batched image
            "disp": rs.rand(8, 10).astype(np.float32) * 100,  # raw disparity
        },
        epoch=3,
    )
    save_hist(w, "val", rs.rand(8, 10) * 50, rs.rand(8, 10) * 50 + 1, 3)

    lines = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
    assert any(l.get("tag") == "val/epe" and l["value"] == 1.25 for l in lines)
    assert any("hist" in l.get("tag", "") for l in lines)
    pngs = [f for f in os.listdir(tmp_path) if f.endswith(".png")]
    assert len(pngs) == 2  # 1 left panel (max_items=1) + 1 disp panel


def test_matlab_export_roundtrip(tmp_path):
    scipy_io = pytest.importorskip("scipy.io")
    from aanet_tpu.utils.matlab_export import (
        LossRecord,
        save_img_error_analysis,
        save_loss_for_matlab,
    )

    rec = LossRecord()
    rec.append({"epe": 1.0, "d1": 0.1})
    rec.append({"epe": 0.8, "d1": 0.08})
    path = save_loss_for_matlab(rec, str(tmp_path))
    loaded = scipy_io.loadmat(path)
    np.testing.assert_allclose(loaded["epe"].ravel(), [1.0, 0.8])

    rs = np.random.RandomState(0)
    out = save_img_error_analysis(
        str(tmp_path), epoch=2, sample_index=0,
        left=rs.rand(8, 10, 3), gt_disp=rs.rand(8, 10) * 50,
        pred_pyramid=[rs.rand(4, 5) * 50, rs.rand(8, 10) * 50],
    )
    assert out and os.path.exists(out)
    bundle = scipy_io.loadmat(out)
    assert "pred_scale_1" in bundle and "error" in bundle

    # index gate: non-analysis indices are skipped
    assert save_img_error_analysis(
        str(tmp_path), 2, 17, rs.rand(4, 4, 3), rs.rand(4, 4),
        [rs.rand(4, 4)],
    ) is None


def test_flops_and_params_profile():
    import jax.numpy as jnp
    from aanet_tpu.models import AANet
    from aanet_tpu.utils.flops import cost_analysis, count_params, profile_model

    model = AANet(
        max_disp=12,
        feature_type="aanet",
        feature_pyramid_network=True,
        num_fusions=1,
        num_deform_blocks=0,
        no_feature_mdconv=True,
        refinement_type=None,
    )
    info = profile_model(model, input_hw=(48, 96))
    assert info["params"] > 1e5
    assert info["flops"] > 1e6  # forward does real work
    # cost_analysis on a trivial fn: 2x2 matmul = 2*n^3 - n^2 flops-ish
    an = cost_analysis(lambda a: jnp.dot(a, a), jnp.ones((4, 4), jnp.float32))
    assert an.get("flops", 0) > 0


def test_step_timer_and_time_fn():
    import jax.numpy as jnp
    from aanet_tpu.utils.profiling import StepTimer, time_fn

    t = StepTimer(total_steps=100)
    lap = t.lap(10)
    assert lap["seconds_per_step"] >= 0.0 and lap["eta_hours"] >= 0.0

    x = jnp.ones((8, 8))
    s = time_fn(lambda a: a + 1, x, warmup=1, iters=3)
    assert s >= 0.0
