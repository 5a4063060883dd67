"""Resize ops matching torch.nn.functional.interpolate semantics, NHWC.

The reference resizes with ``F.interpolate`` in two places:
- trainer/utils.py:13-32 ``Resize`` (dataset transform) — default mode, i.e.
  **nearest**;
- trainer/reg.py:92 up-sampling in ResUnet — ``mode='bilinear'`` with
  ``align_corners=False`` (layers.py:16).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def interpolate_nearest(x, size):
    """torch F.interpolate(mode='nearest') for NHWC input.

    Torch nearest picks source index ``floor(dst * scale)`` with
    ``scale = in/out`` (asymmetric, not half-pixel).
    """
    n, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    ys = jnp.floor(jnp.arange(oh, dtype=jnp.float32) * (h / oh)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(ow, dtype=jnp.float32) * (w / ow)).astype(jnp.int32)
    return x[:, ys, :, :][:, :, xs, :]


def interpolate_bilinear(x, size):
    """torch F.interpolate(mode='bilinear', align_corners=False) for NHWC.

    Half-pixel-centered bilinear — identical convention to
    ``jax.image.resize(method='linear')``.
    """
    n, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    return jax.image.resize(x, (n, oh, ow, c), method="linear", antialias=False)
