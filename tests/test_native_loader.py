"""Native C++ loader tests: decode parity vs PIL, fused resize/normalize vs
the numpy reference, throughput sanity."""

import io
import time

import numpy as np
import pytest
from PIL import Image

from prismer_tpu import native

pytestmark = pytest.mark.skipif(not native.is_available(),
                                reason="no toolchain/libjpeg")


def _jpeg_bytes(arr: np.ndarray, quality=95) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def test_decode_shape(rng):
    arr = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8).astype(np.uint8)
    data = _jpeg_bytes(arr)
    assert native.decode_jpeg_shape(data) == (37, 53)


def test_decode_matches_pil(rng):
    arr = rng.integers(0, 255, (64, 48, 3), dtype=np.uint8).astype(np.uint8)
    data = _jpeg_bytes(arr, quality=100)
    out = native.decode_jpeg_resize(data, 64, 48, (0, 0, 0), (1, 1, 1))
    pil = np.asarray(Image.open(io.BytesIO(data)), np.float32) / 255.0
    # same size -> resize is identity; decoders may differ by tiny IDCT
    # rounding, so compare loosely
    assert out.shape == (64, 48, 3)
    np.testing.assert_allclose(out, pil, atol=0.02)


def test_resize_normalize_matches_numpy_reference(rng):
    arr = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8).astype(np.uint8)
    data = _jpeg_bytes(arr, quality=100)
    mean = (0.48, 0.45, 0.41)
    std = (0.27, 0.26, 0.28)
    out = native.decode_jpeg_resize(data, 20, 30, mean, std)

    src = np.asarray(Image.open(io.BytesIO(data)), np.float32)
    # numpy half-pixel bilinear reference
    def ref_resize(img, dh, dw):
        sh, sw, _ = img.shape
        ys = (np.arange(dh) + 0.5) * sh / dh - 0.5
        xs = (np.arange(dw) + 0.5) * sw / dw - 0.5
        y0 = np.floor(ys).astype(int)
        x0 = np.floor(xs).astype(int)
        wy = (ys - y0)[:, None, None]
        wx = (xs - x0)[None, :, None]
        y0c = np.clip(y0, 0, sh - 1)
        y1c = np.clip(y0 + 1, 0, sh - 1)
        x0c = np.clip(x0, 0, sw - 1)
        x1c = np.clip(x0 + 1, 0, sw - 1)
        top = img[y0c][:, x0c] * (1 - wx) + img[y0c][:, x1c] * wx
        bot = img[y1c][:, x0c] * (1 - wx) + img[y1c][:, x1c] * wx
        return top * (1 - wy) + bot * wy

    want = (ref_resize(src, 20, 30) / 255.0 - np.asarray(mean)) / np.asarray(std)
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_throughput_smoke(rng):
    arr = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8).astype(np.uint8)
    data = _jpeg_bytes(arr)
    t0 = time.perf_counter()
    for _ in range(20):
        native.decode_jpeg_resize(data, 480, 480, (0, 0, 0), (1, 1, 1))
    dt = (time.perf_counter() - t0) / 20
    assert dt < 0.5  # generous bound; typical ~5-10 ms
