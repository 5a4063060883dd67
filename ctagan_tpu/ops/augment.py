"""On-device batched random-affine augmentation.

TPU-native replacement for the reference's per-sample host pipeline
``ToPILImage -> RandomAffine(degrees=level, translate=[.02*level]*2,
scale=[1-.02*level, 1+.02*level], fill=-1) -> ToTensor -> Resize``
(CycTrainer.py:91-99, HdTrainer.py:131-141). Instead of PIL on the host, the
whole batch is warped in one fused gather on device, with the same parameter
distributions as ``torchvision.transforms.RandomAffine``:

- rotation angle   ~ U(-degrees, +degrees)
- translation (px) ~ U(-W*t, W*t) x U(-H*t, H*t), rounded to integer pixels
- scale            ~ U(1 - s, 1 + s)
- fill value -1 (air) outside the source image.

The warp uses the inverse affine map around the image center and nearest
resampling (torchvision's default interpolation for RandomAffine). The
sampled parameter tuple can be shared between paired A/B slices by passing
the same PRNG key.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ctagan_tpu.ops.warp import grid_sample_border


def sample_affine_params(key, batch, noise_level, height, width):
    """Sample per-sample (angle_deg, ty, tx, scale) as torchvision does."""
    deg = float(noise_level)
    t = 0.02 * float(noise_level)
    s = 0.02 * float(noise_level)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    angle = jax.random.uniform(k1, (batch,), minval=-deg, maxval=deg)
    tx = jnp.round(
        jax.random.uniform(k2, (batch,), minval=-width * t, maxval=width * t)
    )
    ty = jnp.round(
        jax.random.uniform(k3, (batch,), minval=-height * t, maxval=height * t)
    )
    scale = jax.random.uniform(k4, (batch,), minval=1.0 - s, maxval=1.0 + s)
    return angle, ty, tx, scale


def affine_warp(img, angle_deg, ty, tx, scale, fill=-1.0, nearest=True):
    """Apply per-sample affine (rotate+translate+scale about center) to an
    NHWC batch. Out-of-source pixels get ``fill``.
    """
    n, h, w, c = img.shape
    theta = jnp.deg2rad(angle_deg)
    cos = jnp.cos(theta) / scale
    sin = jnp.sin(theta) / scale
    cyc = (h - 1) / 2.0
    cxc = (w - 1) / 2.0

    yy = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 1) - cyc
    xx = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 2) - cxc
    # inverse map: rotate by -theta, unscale, untranslate
    yyt = yy - ty[:, None, None]
    xxt = xx - tx[:, None, None]
    src_y = cos[:, None, None] * yyt - sin[:, None, None] * xxt + cyc
    src_x = sin[:, None, None] * yyt + cos[:, None, None] * xxt + cxc

    if nearest:
        src_y_s = jnp.round(src_y)
        src_x_s = jnp.round(src_x)
    else:
        src_y_s = src_y
        src_x_s = src_x
    out = grid_sample_border(img, src_y_s, src_x_s)
    inside = (
        (src_y >= -0.5) & (src_y <= h - 0.5) & (src_x >= -0.5) & (src_x <= w - 0.5)
    )
    return jnp.where(inside[..., None], out, jnp.float32(fill))


def random_affine(key, img, noise_level, fill=-1.0):
    """Sample parameters and warp; one call per paired stream with a shared
    key reproduces the reference's paired-augmentation behavior."""
    n, h, w, _ = img.shape
    angle, ty, tx, scale = sample_affine_params(key, n, noise_level, h, w)
    return affine_warp(img, angle, ty, tx, scale, fill=fill)
