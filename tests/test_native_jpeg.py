"""Native region-of-interest JPEG decode (native/jpegdec.cpp).

The loader decodes only the patch window of each camera frame; these tests
pin the contract that the ROI decode is BIT-IDENTICAL to a PIL full decode
plus crop (same libjpeg-turbo fancy upsampling), across chroma subsampling
modes, progressive streams, grayscale sources, and out-of-frame windows.
Ref behavior being replaced: full-frame PIL decode per item,
/root/reference/src/data/datasets/nuscenes.py:90-194.
"""

import io

import numpy as np
import pytest
from PIL import Image

from generative_detection_tpu.data import native
from generative_detection_tpu.data.nuscenes import _FrameSource


def _frame(w=640, h=360, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([(xx // 3) % 256, (yy // 2) % 256, ((xx + yy) // 5) % 256], -1)
    noise = rng.integers(0, 40, base.shape)
    return (base + noise).clip(0, 255).astype(np.uint8)


def _encode(arr, **kw):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", **kw)
    return buf.getvalue()


def _ref_region(full, x, y, w, h):
    out = np.zeros((h, w, 3), np.uint8)
    ix1, iy1 = max(x, 0), max(y, 0)
    ix2, iy2 = min(x + w, full.shape[1]), min(y + h, full.shape[0])
    if ix2 > ix1 and iy2 > iy1:
        out[iy1 - y : iy2 - y, ix1 - x : ix2 - x] = full[iy1:iy2, ix1:ix2]
    return out


REGIONS = [
    (0, 0, 64, 64),        # top-left corner
    (200, 100, 128, 128),  # interior, iMCU-misaligned
    (37, 301, 96, 96),     # bottom edge
    (576, 296, 64, 64),    # bottom-right corner
    (-30, -30, 100, 100),  # extends past top-left (zero pad)
    (600, 320, 128, 128),  # extends past bottom-right (zero pad)
    (-10, 350, 64, 64),    # mostly out of frame
]


@pytest.fixture(scope="module")
def jlib():
    lib = native.load_jpeg_lib()
    if lib is None:
        pytest.skip("native jpegdec unavailable (no libjpeg on this host)")
    return lib


@pytest.mark.parametrize(
    "kw",
    [
        dict(quality=90, subsampling=2),  # 4:2:0 (nuScenes camera JPEGs)
        dict(quality=75, subsampling=1),  # 4:2:2
        dict(quality=95, subsampling=0),  # 4:4:4
        dict(quality=90, subsampling=2, progressive=True),
    ],
)
def test_region_bit_exact_vs_full_decode(jlib, kw):
    arr = _frame()
    data = _encode(arr, **kw)
    full = np.asarray(Image.open(io.BytesIO(data)), np.uint8)
    buf = np.frombuffer(data, np.uint8)
    for x, y, w, h in REGIONS:
        out = native.jpeg_region(buf, x, y, w, h)
        assert out is not None
        np.testing.assert_array_equal(out, _ref_region(full, x, y, w, h))


def test_region_fully_out_of_frame_is_zero(jlib):
    data = _encode(_frame())
    out = native.jpeg_region(np.frombuffer(data, np.uint8), 1000, 1000, 32, 32)
    assert out is not None and not out.any()


def test_grayscale_source_promotes_to_rgb(jlib):
    arr = _frame()[..., 0]
    data = _encode(arr, quality=90)
    full = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.uint8)
    out = native.jpeg_region(np.frombuffer(data, np.uint8), 50, 50, 80, 80)
    np.testing.assert_array_equal(out, full[50:130, 50:130])


def test_truncated_stream_returns_none(jlib):
    data = _encode(_frame())[:200]
    assert native.jpeg_region(np.frombuffer(data, np.uint8), 0, 0, 32, 32) is None


def test_frame_source_matches_pil(tmp_path, jlib):
    """_FrameSource.region == PIL full decode + crop, native and fallback."""
    arr = _frame()
    p = tmp_path / "frame.jpg"
    Image.fromarray(arr).save(p, quality=90)
    full = np.asarray(Image.open(p), np.uint8)
    for x, y, w, h in REGIONS:
        src = _FrameSource(str(p))
        assert src.size == (arr.shape[1], arr.shape[0])
        np.testing.assert_array_equal(src.region(x, y, w, h), _ref_region(full, x, y, w, h))
        # force the PIL-fallback branch on a fresh source and re-check
        src2 = _FrameSource(str(p))
        src2._try_native = False
        np.testing.assert_array_equal(src2.region(x, y, w, h), _ref_region(full, x, y, w, h))


def test_frame_source_png_fallback(tmp_path):
    arr = _frame(w=128, h=96)
    p = tmp_path / "frame.png"
    Image.fromarray(arr).save(p)
    src = _FrameSource(str(p))
    np.testing.assert_array_equal(src.region(10, 10, 64, 64), arr[10:74, 10:74])
