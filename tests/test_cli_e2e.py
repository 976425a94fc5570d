"""End-to-end CLI test: train one epoch on a tiny synthetic dataset,
evaluate, run inference, and predict — the full product surface."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from aanet_tpu.data import file_io

pytestmark = pytest.mark.slow  # full CLI train/eval/infer/predict: >10 min

TINY_MODEL_FLAGS = [
    "--max_disp", "24",
    "--feature_type", "aanet",
    "--feature_pyramid_network",
    "--num_fusions", "1",
    "--num_deform_blocks", "0",
    "--no_feature_mdconv",
    "--refinement_type", "stereodrnet",
]


@pytest.fixture()
def fixture_dataset(tmp_path):
    data_dir = tmp_path / "data"
    lists_dir = tmp_path / "lists" / "filenames"
    os.makedirs(lists_dir, exist_ok=True)
    for side in ("left", "right", "disp"):
        os.makedirs(data_dir / side, exist_ok=True)
    rs = np.random.RandomState(0)
    lines = []
    h, w, d = 48, 96, 4
    for i in range(4):
        base = (rs.rand(h, w + d, 3) * 255).astype(np.uint8)
        right = base[:, :w]
        left = base[:, d : w + d]
        Image.fromarray(left).save(data_dir / "left" / f"{i}.png")
        Image.fromarray(right).save(data_dir / "right" / f"{i}.png")
        file_io.write_pfm(
            str(data_dir / "disp" / f"{i}.pfm"),
            np.full((h, w), float(d), np.float32),
        )
        lines.append(f"left/{i}.png right/{i}.png disp/{i}.pfm")
    text = "\n".join(lines) + "\n"
    for name in ("train", "val", "test"):
        (lists_dir / f"SceneFlow_finalpass_{name}.txt").write_text(text)
    return str(data_dir), str(tmp_path / "lists")


def test_train_evaluate_inference_predict(fixture_dataset, tmp_path, capsys):
    from aanet_tpu.cli import main

    data_dir, fn_root = fixture_dataset
    ckpt_dir = str(tmp_path / "ckpt")

    common = [
        "--data_dir", data_dir,
        "--filename_root", fn_root,
        "--img_height", "48", "--img_width", "96",
        "--val_img_height", "48", "--val_img_width", "96",
        "--batch_size", "2", "--val_batch_size", "2",
        "--num_workers", "1",
    ] + TINY_MODEL_FLAGS

    main(
        ["train", "--checkpoint_dir", ckpt_dir, "--max_epoch", "1",
         "--print_freq", "1", "--summary_freq", "1", "--save_ckpt_freq", "1",
         "--milestones", "10"]
        + common
    )
    assert os.path.exists(os.path.join(ckpt_dir, "aanet_latest.msgpack"))
    assert os.path.exists(os.path.join(ckpt_dir, "aanet_best.msgpack"))
    assert os.path.exists(os.path.join(ckpt_dir, "val_results.txt"))
    assert os.path.exists(os.path.join(ckpt_dir, "args.json"))
    assert os.path.exists(
        os.path.join(ckpt_dir, "models", "aanet_epoch_001.msgpack")
    )
    # observability artifacts (reference model.py:157-223,345-365,
    # train.py:269): TB summaries, per-epoch .mat records, val analysis
    # dumps at the fixed sample indices (index 0 is always in range)
    tb_dir = os.path.join(ckpt_dir, "tb")
    assert os.path.isdir(tb_dir) and len(os.listdir(tb_dir)) > 0
    assert os.path.exists(os.path.join(ckpt_dir, "lossRecord.mat"))
    analysis_dir = os.path.join(ckpt_dir, "matlab_analysis")
    assert os.path.isdir(analysis_dir)
    assert any(f.endswith("sample00000.mat") for f in os.listdir(analysis_dir))
    from scipy.io import loadmat

    rec = loadmat(os.path.join(ckpt_dir, "lossRecord.mat"))
    assert "epe" in rec and "total_loss" in rec

    main(["evaluate", "--checkpoint_dir", ckpt_dir] + common)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    means = json.loads(out)
    assert "epe" in means and np.isfinite(means["epe"])

    infer_out = str(tmp_path / "infer_out")
    main(
        ["inference", "--pretrained",
         os.path.join(ckpt_dir, "aanet_best.msgpack"),
         "--output_dir", infer_out, "--save_type", "pfm"]
        + common
    )
    pfms = [f for f in os.listdir(os.path.join(infer_out, "left")) if f.endswith("pfm")]
    assert len(pfms) == 4
    disp, _ = file_io.read_pfm(os.path.join(infer_out, "left", pfms[0]))
    assert disp.shape == (48, 96)

    pred_out = str(tmp_path / "pred_out")
    main(
        ["predict", "--pretrained",
         os.path.join(ckpt_dir, "aanet_best.msgpack"),
         "--data_dir", data_dir, "--output_dir", pred_out]
        + common
    )
    assert len(os.listdir(pred_out)) == 4


def test_resume_continues_from_latest(fixture_dataset, tmp_path):
    from aanet_tpu.cli import main

    data_dir, fn_root = fixture_dataset
    ckpt_dir = str(tmp_path / "ckpt2")
    common = [
        "--data_dir", data_dir, "--filename_root", fn_root,
        "--img_height", "48", "--img_width", "96",
        "--val_img_height", "48", "--val_img_width", "96",
        "--batch_size", "2", "--val_batch_size", "2",
        "--num_workers", "1", "--no_validate",
    ] + TINY_MODEL_FLAGS

    main(["train", "--checkpoint_dir", ckpt_dir, "--max_epoch", "1",
          "--milestones", "10"] + common)
    meta1 = json.load(open(os.path.join(ckpt_dir, "aanet_latest.json")))
    assert meta1["epoch"] == 1

    main(["train", "--checkpoint_dir", ckpt_dir, "--max_epoch", "2",
          "--milestones", "10", "--resume"] + common)
    meta2 = json.load(open(os.path.join(ckpt_dir, "aanet_latest.json")))
    assert meta2["epoch"] == 2
    assert meta2["step"] > meta1["step"]
