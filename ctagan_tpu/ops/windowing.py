"""HU windowing / normalization transforms as pure jnp functions.

These are the device-side equivalents of the reference's host-side numpy
transforms — the "dual-window data representation" that is the core of the
CTA-GAN recipe (reference: trainer/datasets.py:36-71 ``read_ori_w``,
trainer/HdTrainer.py:41-64 ``to_windowdata``). All functions are pure,
shape-polymorphic, differentiable where meaningful, and jit/vmap-friendly, so
they can be fused directly into the forward pass instead of running per-slice
on the host.

Conventions:
- "raw" pixel data: int-like array as stored in the DICOM PixelData
  (0..4095 for 12-bit CT with RescaleIntercept -1024).
- "HU-shifted" data (``hu1024 = raw``): the reference reads via SimpleITK,
  whose values equal ``raw - 1024`` (true HU); it then works with both.
- normalized images live in [-1, 1].
"""
from __future__ import annotations

import jax.numpy as jnp

# Default clinical window used for the windowed input channel
# (reference: datasets.py:47-48 — WC=50, WW=400).
DEFAULT_WC = 50.0
DEFAULT_WW = 400.0


def _window_limits(wc, ww):
    """win_min/win_max exactly as the reference computes them
    (datasets.py:49-50): win_min = (2*WC - WW)/2 + 0.5, win_max = (2*WC + WW)/2 + 0.5.
    """
    wc = jnp.asarray(wc, jnp.float32)
    ww = jnp.asarray(ww, jnp.float32)
    win_min = (2.0 * wc - ww) / 2.0 + 0.5
    win_max = (2.0 * wc + ww) / 2.0 + 0.5
    return win_min, win_max


def window_normalize(hu, wc=DEFAULT_WC, ww=DEFAULT_WW):
    """HU values -> clinically windowed image in [-1, 1].

    Matches datasets.py:52-58 bit-for-bit on float32: scale into the window,
    truncate toward zero, clip to [0, 255], divide by 255, then map to [-1,1].
    """
    hu = jnp.asarray(hu, jnp.float32)
    win_min, win_max = _window_limits(wc, ww)
    d_factor = 255.0 / (win_max - win_min)
    img = jnp.trunc((hu - win_min) * d_factor)
    img = jnp.clip(img, 0.0, 255.0) / 255.0
    return (img - 0.5) / 0.5


def fullrange_normalize(raw):
    """Raw (0..4095) pixel data -> full-range image in [-1, 1].

    Matches datasets.py:60-63: clamp negatives to 0, /4095, then to [-1,1].
    """
    raw = jnp.asarray(raw, jnp.float32)
    img = jnp.clip(raw, 0.0, None) / 4095.0
    return (img - 0.5) / 0.5


def dual_window(raw, wc=DEFAULT_WC, ww=DEFAULT_WW):
    """The CTA-GAN dual-window representation of one slice.

    Given raw pixel data (0..4095), returns ``(windowed, fullrange)`` — the
    two simultaneous normalizations of datasets.py:36-71 ``read_ori_w``:
    the clinically-windowed view (computed on ``raw - 1024`` HU) and the
    full-dynamic-range view (computed on raw).
    """
    raw = jnp.asarray(raw, jnp.float32)
    return window_normalize(raw - 1024.0, wc, ww), fullrange_normalize(raw)


def to_windowdata(image, wc, ww):
    """Map a full-range [-1,1] image into window space [-1,1].

    The evaluation-time "best window" display transform
    (HdTrainer.py:41-64 / CycTrainer.py:34-57): de-normalize to 0..4095,
    send exact zeros to -2000 (air outside the reconstruction circle),
    shift by -1024 to HU, then window with the per-file (WC, WW).
    """
    image = jnp.asarray(image, jnp.float32)
    data = (image + 1.0) * 0.5 * 4095.0
    data = jnp.where(data == 0.0, -2000.0, data)
    hu = data - 1024.0
    return window_normalize(hu, wc, ww)


def body_mask(img, threshold=0.3):
    """Binary body mask: 1 where ``img >= threshold`` else 0.

    The reference thresholds windowed images at 0.3 to isolate the body /
    contrast-relevant region (HdTrainer.py:483-485, 726-729).
    """
    img = jnp.asarray(img, jnp.float32)
    return jnp.where(img >= threshold, 1.0, 0.0)


def mask_background_to_air(img, mask):
    """Apply a binary mask and set masked-out (and exactly-zero) pixels to -1.

    Matches the reference's idiom ``x = x*mask; x[x==0] = -1``
    (HdTrainer.py:487-489, 731-735): note a pixel that is exactly 0 *inside*
    the mask also becomes -1 — kept faithfully.
    """
    img = jnp.asarray(img, jnp.float32)
    masked = img * mask
    return jnp.where(masked == 0.0, -1.0, masked)


# -- stored-pixel lookup tables (bit-exact device windowing) -----------------
#
# XLA strength-reduces division by a compile-time constant into a
# reciprocal multiply (measured: 3325/4096 1-ulp drifts vs numpy on the
# CPU backend alone), so the arithmetic forms above cannot promise
# bit-identity with the host codec under jit. Stored DICOM pixels are
# integers, though — so the exact map is a finite table. We build it by
# calling the HOST codec itself (ctagan_tpu.data.native, the same code the
# datasets run), and the device does one gather: exact on every backend.

_LUT_CACHE: dict = {}


def _stored_index_range(dtype):
    import numpy as np

    dt = np.dtype(dtype)
    if dt == np.uint16:
        return np.arange(65536, dtype=np.int64), 0
    if dt == np.int16:
        return np.arange(-32768, 32768, dtype=np.int64), 32768
    if dt == np.uint8:
        return np.arange(256, dtype=np.int64), 0
    if dt == np.int8:
        return np.arange(-128, 128, dtype=np.int64), 128
    raise ValueError(f"unsupported stored-pixel dtype {dt}")


def stored_pixel_luts(dtype, wc=DEFAULT_WC, ww=DEFAULT_WW):
    """(windowed_lut, fullrange_lut, index_offset) for a stored dtype.

    Tables are produced by the host codec (`data.native.dual_window_native`)
    over the dtype's full value range, so `lut[raw + offset]` equals the
    host-normalized pixel bit-for-bit.
    """
    import numpy as np

    key = (np.dtype(dtype).str, float(wc), float(ww))
    if key not in _LUT_CACHE:
        from ctagan_tpu.data.native import dual_window_native

        values, offset = _stored_index_range(dtype)
        win, full = dual_window_native(
            values.astype(np.dtype(dtype), casting="unsafe"), wc, ww
        )
        _LUT_CACHE[key] = (win, full, offset)
    return _LUT_CACHE[key]


def fullrange_from_stored(raw):
    """Stored integer pixels -> full-range [-1, 1], bit-exact vs the host
    codec (`read_fullrange_slice`) via table lookup."""
    _, full, offset = stored_pixel_luts(raw.dtype)
    idx = jnp.asarray(raw, jnp.int32) + offset
    return jnp.take(jnp.asarray(full), idx, axis=0)


def dual_window_from_stored(raw, wc=DEFAULT_WC, ww=DEFAULT_WW):
    """Stored integer pixels -> (windowed, fullrange), bit-exact vs the host
    codec (`read_dual_window_slice`) via table lookup."""
    win, full, offset = stored_pixel_luts(raw.dtype, wc, ww)
    idx = jnp.asarray(raw, jnp.int32) + offset
    return (
        jnp.take(jnp.asarray(win), idx, axis=0),
        jnp.take(jnp.asarray(full), idx, axis=0),
    )
