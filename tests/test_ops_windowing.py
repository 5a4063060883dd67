"""Golden-value tests for HU windowing transforms (reference semantics:
datasets.py:36-71, HdTrainer.py:41-64)."""
import numpy as np
import jax.numpy as jnp

from ctagan_tpu.ops.windowing import (
    window_normalize,
    fullrange_normalize,
    dual_window,
    to_windowdata,
    body_mask,
    mask_background_to_air,
)


def _np_window(hu, wc, ww):
    win_min = (2 * wc - ww) / 2.0 + 0.5
    win_max = (2 * wc + ww) / 2.0 + 0.5
    d = 255.0 / (win_max - win_min)
    img = np.trunc((hu - win_min) * d)
    img = np.clip(img, 0, 255) / 255.0
    return (img - 0.5) / 0.5


def test_window_normalize_matches_numpy_reference_formula():
    rng = np.random.default_rng(0)
    hu = rng.integers(-1024, 3071, size=(64, 64)).astype(np.float32)
    got = np.asarray(window_normalize(hu, 50.0, 400.0))
    want = _np_window(hu, 50.0, 400.0).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_window_normalize_range_and_extremes():
    hu = np.array([[-2000.0, -149.5, 250.5, 4000.0]], np.float32)
    out = np.asarray(window_normalize(hu))
    assert out.min() >= -1.0 and out.max() <= 1.0
    assert out[0, 0] == -1.0  # far below window -> black
    assert out[0, 3] == 1.0  # far above window -> white


def test_fullrange_normalize():
    raw = np.array([[-5.0, 0.0, 4095.0, 2047.5]], np.float32)
    out = np.asarray(fullrange_normalize(raw))
    np.testing.assert_allclose(out[0, 0], -1.0)
    np.testing.assert_allclose(out[0, 1], -1.0)
    np.testing.assert_allclose(out[0, 2], 1.0)
    np.testing.assert_allclose(out[0, 3], 0.0, atol=1e-6)


def test_dual_window_consistency():
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 4096, size=(32, 32)).astype(np.float32)
    w, f = dual_window(raw)
    np.testing.assert_allclose(
        np.asarray(w), _np_window(raw - 1024.0, 50, 400), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(f), (raw / 4095.0 - 0.5) / 0.5, atol=1e-6)


def test_to_windowdata_roundtrip_of_fullrange():
    # fullrange-normalize raw data then window it back: must equal direct
    # windowing of (raw - 1024) HU for raw > 0 (the reference's eval path).
    rng = np.random.default_rng(2)
    raw = rng.integers(1, 4096, size=(32, 32)).astype(np.float32)
    img = np.asarray(fullrange_normalize(raw))
    back = np.asarray(to_windowdata(img, 50.0, 400.0))
    want = _np_window(raw - 1024.0, 50.0, 400.0)
    # float roundtrip can flip trunc at exact integer boundaries; allow 1 LSB
    assert np.mean(np.abs(back - want) > (1.1 / 255.0) * 2) < 0.01
    np.testing.assert_allclose(back, want, atol=2.1 / 255.0 * 2)


def test_to_windowdata_zero_maps_to_air():
    # a pixel that denormalizes to exactly 0 is sent to -2000 HU -> black
    img = np.full((4, 4), -1.0, np.float32)
    out = np.asarray(to_windowdata(img, 50.0, 400.0))
    np.testing.assert_allclose(out, -1.0)


def test_body_mask_and_background_fill():
    img = np.array([[0.0, 0.29, 0.3, 0.9]], np.float32)
    m = np.asarray(body_mask(img))
    np.testing.assert_allclose(m, [[0, 0, 1, 1]])
    filled = np.asarray(mask_background_to_air(img, m))
    np.testing.assert_allclose(filled, [[-1.0, -1.0, 0.3, 0.9]])


def test_mask_background_exact_zero_inside_mask_becomes_air():
    # faithful quirk: value exactly 0 inside the mask also becomes -1
    img = np.array([[0.0, 0.5]], np.float32)
    m = np.ones((1, 2), np.float32)
    out = np.asarray(mask_background_to_air(img, m))
    np.testing.assert_allclose(out, [[-1.0, 0.5]])
