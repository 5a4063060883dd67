"""Native (C++) data-plane parity tests: the ctypes kernels must match the
numpy reference semantics bit-for-bit."""
import numpy as np
import pytest

from ctagan_tpu.data import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native lib unavailable (g++ build failed)")
    return lib


def _numpy_dual(raw, wc=50.0, ww=400.0):
    hu = raw.astype(np.float32) - 1024.0
    win_min = (2 * wc - ww) / 2.0 + 0.5
    d = 255.0 / ((2 * wc + ww) / 2.0 + 0.5 - win_min)
    img1 = np.trunc((hu - win_min) * d)
    np.clip(img1, 0, 255, out=img1)
    img1 = (img1 / 255.0 - 0.5) * 2.0
    img2 = raw.astype(np.float32)
    img2[img2 < 0] = 0
    img2 = (img2 / 4095.0 - 0.5) * 2.0
    return img1.astype(np.float32), img2.astype(np.float32)


def test_dual_window_u16_parity(lib):
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 4096, (64, 64)).astype(np.uint16)
    got_w, got_f = native.dual_window_native(raw)
    want_w, want_f = _numpy_dual(raw)
    np.testing.assert_allclose(got_w, want_w, atol=1e-6)
    np.testing.assert_allclose(got_f, want_f, atol=1e-6)


def test_dual_window_i16_parity(lib):
    rng = np.random.default_rng(1)
    raw = rng.integers(-100, 4000, (32, 32)).astype(np.int16)
    got_w, got_f = native.dual_window_native(raw)
    want_w, want_f = _numpy_dual(raw)
    np.testing.assert_allclose(got_w, want_w, atol=1e-6)
    np.testing.assert_allclose(got_f, want_f, atol=1e-6)


def test_fullrange_parity(lib):
    rng = np.random.default_rng(2)
    raw = rng.integers(0, 4096, (48, 48)).astype(np.uint16)
    got = native.fullrange_native(raw)
    want = ((raw.astype(np.float32) / 4095.0) - 0.5) * 2.0
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_resize_nearest_parity(lib):
    rng = np.random.default_rng(3)
    img = rng.standard_normal((37, 53)).astype(np.float32)
    for size in (16, 64):
        got = native.resize_nearest_native(img, size)
        ys = np.floor(np.arange(size) * (37 / size)).astype(np.int64)
        xs = np.floor(np.arange(size) * (53 / size)).astype(np.int64)
        np.testing.assert_array_equal(got, img[np.ix_(ys, xs)])


def test_denorm_parity(lib):
    rng = np.random.default_rng(4)
    img = rng.uniform(-1, 1, (16, 16)).astype(np.float32)
    got = native.denorm_to_int16_native(img)
    want = ((img + 1.0) * 0.5 * 4095.0).astype(np.int16)
    np.testing.assert_array_equal(got, want)


def test_numpy_fallback_when_wrong_dtype():
    raw = np.random.default_rng(5).integers(0, 4095, (8, 8)).astype(np.float64)
    w, f = native.dual_window_native(raw)
    ww, ff = _numpy_dual(raw)
    np.testing.assert_allclose(w, ww, atol=1e-6)
    np.testing.assert_allclose(f, ff, atol=1e-6)
