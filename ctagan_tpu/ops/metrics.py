"""Evaluation metrics: masked MAE/PSNR, SSIM, UQI (and LPIPS in ops.lpips).

The reference computes these per-slice with numpy/skimage on the host
(CycTrainer.py:362-398 PSNR/MAE/UQI duplicated in every trainer;
``skimage.measure.compare_ssim`` for SSIM). Here they are pure jnp functions
that run on device and can be vmapped over a batch of slices; numerics match
the reference's formulas (including its eps regularizers and the 100 dB PSNR
cap).

Images are single-channel 2-D arrays in [-1, 1]; "masked" metrics exclude
background, defined exactly as pixels where ``real == -1``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_psnr(fake, real):
    """Background-excluded PSNR (CycTrainer.py:362-375).

    mask = real != -1; MSE over masked pixels of the images mapped to [0,1];
    if no foreground pixels, fall back to global MSE + 1e-10. PSNR =
    20*log10(1 / (sqrt(mse) + 1e-10)), capped at 100 when mse < 1e-10.
    """
    fake = jnp.asarray(fake, jnp.float32)
    real = jnp.asarray(real, jnp.float32)
    mask = (real != -1.0).astype(jnp.float32)
    n_fg = jnp.sum(mask)
    diff2 = ((fake + 1.0) / 2.0 - (real + 1.0) / 2.0) ** 2
    mse_fg = jnp.sum(diff2 * mask) / jnp.maximum(n_fg, 1.0)
    mse_all = jnp.mean(diff2) + 1e-10
    mse = jnp.where(n_fg > 0, mse_fg, mse_all)
    psnr = 20.0 * jnp.log10(1.0 / (jnp.sqrt(mse) + 1e-10))
    return jnp.where(mse < 1e-10, 100.0, psnr)


def masked_mae(fake, real):
    """Background-excluded MAE / 2 (maps (-1,1) to (0,1); CycTrainer.py:377-388)."""
    fake = jnp.asarray(fake, jnp.float32)
    real = jnp.asarray(real, jnp.float32)
    mask = (real != -1.0).astype(jnp.float32)
    n_fg = jnp.sum(mask)
    ad = jnp.abs(fake - real)
    mae_fg = jnp.sum(ad * mask) / jnp.maximum(n_fg, 1.0)
    mae_all = jnp.mean(ad) + 1e-10
    return jnp.where(n_fg > 0, mae_fg, mae_all) / 2.0


def uqi(fake, real):
    """Universal Quality Index, global, with the reference's exact
    sample-variance normalization and eps (CycTrainer.py:390-398)."""
    fake = jnp.asarray(fake, jnp.float32)
    real = jnp.asarray(real, jnp.float32)
    m = fake.size
    mean_f = jnp.mean(fake)
    mean_r = jnp.mean(real)
    var_f = jnp.sqrt(jnp.sum((fake - mean_f) ** 2) / (m - 1))
    var_r = jnp.sqrt(jnp.sum((real - mean_r) ** 2) / (m - 1))
    cov = jnp.sum((fake - mean_f) * (real - mean_r)) / (m - 1)
    return (
        4.0 * mean_f * mean_r * cov
        / ((mean_f**2 + mean_r**2) * (var_f**2 + var_r**2) + 1e-10)
    )


def _uniform_filter(x, win):
    """Mean filter with a win x win box, 'valid' region only, as an exact
    windowed SUM (pure f32 adds on the VPU) divided once.

    Deliberately NOT a convolution: on TPU, XLA lowers f32 convs through
    the MXU with bfloat16 multiplies by default, and the ssim variance
    terms (uxx - ux²) cancel catastrophically at that precision — measured
    val SSIM up to 1.054 (> 1 is mathematically impossible) on a real
    training run before this fix."""
    s = jax.lax.reduce_window(
        jnp.asarray(x, jnp.float32), 0.0, jax.lax.add,
        (win, win), (1, 1), "VALID",
    )
    return s / float(win * win)


def ssim(im1, im2, data_range=2.0, win_size=7, k1=0.01, k2=0.03):
    """Structural similarity matching classic skimage ``compare_ssim``
    defaults for float images in [-1, 1]: 7x7 uniform window,
    sample-covariance normalization (N/(N-1)), data_range = 2, mean over the
    valid (crop win//2) region.
    """
    im1 = jnp.asarray(im1, jnp.float32)
    im2 = jnp.asarray(im2, jnp.float32)
    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)

    ux = _uniform_filter(im1, win_size)
    uy = _uniform_filter(im2, win_size)
    uxx = _uniform_filter(im1 * im1, win_size)
    uyy = _uniform_filter(im2 * im2, win_size)
    uxy = _uniform_filter(im1 * im2, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux**2 + uy**2 + c1
    b2 = vx + vy + c2
    return jnp.mean((a1 * a2) / (b1 * b2))
