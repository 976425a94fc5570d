"""Native C++ decode library: correctness vs the Python readers."""
import os

import numpy as np
import pytest
from PIL import Image

from aanet_tpu.data import file_io, native_io


@pytest.fixture(scope="module")
def built():
    if not native_io.available():
        pytest.skip("native IO library not built and no toolchain")
    return True


def test_png_rgb8_matches_pil(built, tmp_path):
    rs = np.random.RandomState(0)
    rgb = (rs.rand(37, 53, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "rgb.png")
    Image.fromarray(rgb).save(p)
    got = native_io.decode(p)
    np.testing.assert_array_equal(got, rgb.astype(np.float32))
    # and through the public reader
    np.testing.assert_array_equal(file_io.read_img(p), rgb.astype(np.float32))


def test_png_gray16_matches_pil(built, tmp_path):
    rs = np.random.RandomState(1)
    g16 = (rs.rand(23, 31) * 65535).astype(np.uint16)
    p = str(tmp_path / "g16.png")
    Image.fromarray(g16).save(p)
    np.testing.assert_array_equal(native_io.decode(p), g16.astype(np.float32))
    np.testing.assert_allclose(
        file_io.read_kitti_disp(p), g16.astype(np.float32) / 256.0
    )


def test_pfm_matches_python_reader(built, tmp_path):
    rs = np.random.RandomState(2)
    disp = rs.rand(19, 29).astype(np.float32) * 100
    p = str(tmp_path / "d.pfm")
    file_io.write_pfm(p, disp)
    np.testing.assert_array_equal(native_io.decode(p), disp)
    np.testing.assert_array_equal(file_io.read_disp(p), disp)
    np.testing.assert_array_equal(file_io.read_disp(p, subset=True), -disp)


def test_batch_decode_threads_and_failures(built, tmp_path):
    rs = np.random.RandomState(3)
    paths = []
    for i in range(6):
        img = (rs.rand(8 + i, 9, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    paths.append(str(tmp_path / "missing.png"))
    res = native_io.decode_batch(paths, num_threads=3)
    assert res is not None
    assert all(r is not None for r in res[:-1]) and res[-1] is None
    assert res[2].shape == (10, 9, 3)
