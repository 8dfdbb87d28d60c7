"""Native C++ PNG decoder / prefetch pool tests (vs cv2 ground truth)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dynosam_tpu.data import native_loader


pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native lib not built"
)


@pytest.fixture
def png_files(tmp_path, rng):
    files = {}
    # 8-bit gray
    g8 = rng.integers(0, 255, (40, 60), dtype=np.uint8)
    p = str(tmp_path / "g8.png")
    cv2.imwrite(p, g8)
    files["g8"] = (p, g8)
    # 16-bit gray (disparity-like)
    g16 = rng.integers(0, 65535, (32, 48), dtype=np.uint16)
    p = str(tmp_path / "g16.png")
    cv2.imwrite(p, g16)
    files["g16"] = (p, g16)
    # 8-bit RGB
    c8 = rng.integers(0, 255, (24, 36, 3), dtype=np.uint8)
    p = str(tmp_path / "c8.png")
    cv2.imwrite(p, c8)
    files["c8"] = (p, c8)
    # 16-bit RGB (vkitti flow-like)
    c16 = rng.integers(0, 65535, (20, 30, 3), dtype=np.uint16)
    p = str(tmp_path / "c16.png")
    cv2.imwrite(p, c16)
    files["c16"] = (p, c16)
    return files


def test_decode_matches_cv2(png_files):
    for name, (path, expected) in png_files.items():
        got = native_loader.decode_png(path)
        ref = cv2.imread(path, -1)
        if ref.ndim == 3:
            ref = ref[..., ::-1]  # cv2 BGR -> decoder RGB byte order
        assert got.shape == ref.shape, name
        assert got.dtype == ref.dtype, name
        np.testing.assert_array_equal(got, ref, err_msg=name)


def test_png_info(png_files):
    path, img = png_files["g16"]
    w, h, c, b = native_loader.png_info(path)
    assert (w, h, c, b) == (48, 32, 1, 16)


def test_prefetch_pool(png_files):
    dec = native_loader.PrefetchDecoder(n_threads=2)
    paths = [p for p, _ in png_files.values()]
    for p in paths:
        dec.submit(p)
    for p, (path, img) in zip(paths, png_files.values()):
        got = dec.get(p)
        assert got.size == np.asarray(img).size
    dec.close()


def test_decode_error():
    with pytest.raises(IOError):
        native_loader.decode_png("/nonexistent/file.png")
