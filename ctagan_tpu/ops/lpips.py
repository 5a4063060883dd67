"""LPIPS (AlexNet) perceptual metric in JAX.

The reference scores test slices with ``lpips.LPIPS(net='alex')``
(HdTrainer.py:28, :509-536). Neither the lpips package nor torchvision
exists in this environment and the container has no network egress, so the
metric is reimplemented natively and **gated on a weights file**:

- architecture: AlexNet feature trunk (5 conv stages, taps after each ReLU),
  per-channel unit normalization, squared difference, non-negative 1x1
  linear heads, spatial mean, summed over taps — the standard LPIPS v0.1
  formulation;
- ``load_weights_from_torch`` imports a PyTorch state dict (a torchvision
  AlexNet checkpoint merged with the lpips linear heads, or the lpips
  package's combined file) via the baked-in torch;
- inputs: single-channel [-1,1] slices are tiled to RGB and passed through
  the LPIPS input scaling layer.

When no weights file is configured the evaluation suite simply omits LPIPS
(reported as absent, never as a random-weight number).
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# LPIPS input normalization (scaling_layer of LPIPS v0.1)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet trunk: (out_ch, kernel, stride, pad), maxpool after stages 0 and 1
_ALEX_CFG = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def _maxpool3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def alexnet_features(params: Dict[str, Any], x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: (N,H,W,3) scaled input; returns the 5 ReLU tap activations."""
    taps = []
    h = x
    for i in range(5):
        _, k, s, p = _ALEX_CFG[i][1], _ALEX_CFG[i][1], _ALEX_CFG[i][2], _ALEX_CFG[i][3]
        h = _conv(h, params[f"conv{i}_w"], params[f"conv{i}_b"], s, p)
        h = jax.nn.relu(h)
        taps.append(h)
        if i in _POOL_AFTER:
            h = _maxpool3s2(h)
    return taps


def lpips_distance(params: Dict[str, Any], img0: jnp.ndarray, img1: jnp.ndarray):
    """LPIPS between two (H,W) or (N,H,W,1|3) images in [-1,1]."""

    def prep(im):
        im = jnp.asarray(im, jnp.float32)
        if im.ndim == 2:
            im = im[None, :, :, None]
        if im.shape[-1] == 1:
            im = jnp.tile(im, (1, 1, 1, 3))
        return (im - _SHIFT) / _SCALE

    t0 = alexnet_features(params, prep(img0))
    t1 = alexnet_features(params, prep(img1))
    total = 0.0
    for i, (f0, f1) in enumerate(zip(t0, t1)):
        n0 = f0 * jax.lax.rsqrt(jnp.sum(f0**2, -1, keepdims=True) + 1e-10)
        n1 = f1 * jax.lax.rsqrt(jnp.sum(f1**2, -1, keepdims=True) + 1e-10)
        diff = (n0 - n1) ** 2
        lin = params[f"lin{i}_w"]  # (C,) non-negative
        total = total + jnp.mean(jnp.sum(diff * lin, axis=-1), axis=(1, 2))
    return jnp.squeeze(total)


def load_weights_from_torch(path: str) -> Dict[str, Any]:
    """Import LPIPS weights from a torch checkpoint.

    Accepts either (a) a dict with torchvision-AlexNet keys
    (``features.{0,3,6,8,10}.weight/bias``) merged with lpips head keys
    (``lin{0-4}.model.1.weight``), or (b) separate sub-dicts under
    'alexnet' / 'lpips'.
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if "alexnet" in raw:
        merged = dict(raw["alexnet"])
        merged.update(raw["lpips"])
        raw = merged
    feat_idx = [0, 3, 6, 8, 10]
    params: Dict[str, Any] = {}
    for i, fi in enumerate(feat_idx):
        w = raw[f"features.{fi}.weight"].numpy()  # (O,I,kh,kw)
        b = raw[f"features.{fi}.bias"].numpy()
        params[f"conv{i}_w"] = jnp.asarray(w.transpose(2, 3, 1, 0))
        params[f"conv{i}_b"] = jnp.asarray(b)
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        w = raw[key].numpy().reshape(-1)  # (1,C,1,1) -> (C,)
        params[f"lin{i}_w"] = jnp.asarray(np.maximum(w, 0.0))
    return params


def combine_torch_checkpoints(
    alexnet_path: str, lpips_path: str, out_path: str
) -> str:
    """Produce the single weights file ``load_weights_from_torch`` expects
    from (a) a torchvision AlexNet checkpoint (``alexnet-owt-*.pth`` —
    ``features.{0,3,6,8,10}.weight/bias``; classifier keys are dropped) and
    (b) the lpips package's linear-head file (``lpips/weights/v0.1/alex.pth``
    — ``lin{0-4}.model.1.weight``). Run on any machine that has the two
    files, then point config ``lpips_weights`` at the output to enable the
    reference's LPIPS columns (HdTrainer.py:509-536)."""
    import torch

    alex = torch.load(alexnet_path, map_location="cpu", weights_only=False)
    if hasattr(alex, "state_dict"):
        alex = alex.state_dict()
    heads = torch.load(lpips_path, map_location="cpu", weights_only=False)
    if hasattr(heads, "state_dict"):
        heads = heads.state_dict()
    merged = {}
    for fi in (0, 3, 6, 8, 10):
        merged[f"features.{fi}.weight"] = alex[f"features.{fi}.weight"]
        merged[f"features.{fi}.bias"] = alex[f"features.{fi}.bias"]
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        src = key if key in heads else f"lins.{i}.model.1.weight"
        merged[key] = heads[src]
    torch.save(merged, out_path)
    return out_path


def make_lpips_fn(weights_path: Optional[str]):
    """Returns a jitted ``fn(img0, img1) -> scalar``, or None when no
    weights are configured (empty path). An explicitly-configured path
    that does not exist RAISES — silently dropping the two LPIPS columns
    the reference always prints (HdTrainer.py:553-564) would mislead any
    comparison against it."""
    if not weights_path:
        return None
    if not os.path.exists(weights_path):
        raise FileNotFoundError(
            f"lpips_weights file not found: {weights_path!r} — build it "
            "with `python -m ctagan_tpu.ops.lpips <alexnet.pth> "
            "<lpips_alex.pth> <out.pth>` on any machine with the two "
            "torch checkpoints (see combine_torch_checkpoints)"
        )
    params = load_weights_from_torch(weights_path)
    return jax.jit(lambda a, b: lpips_distance(params, a, b))


def random_params(key) -> Dict[str, Any]:
    """Random-weight parameter tree with correct shapes (tests only)."""
    params: Dict[str, Any] = {}
    in_c = 3
    for i, (out_c, k, _, _) in enumerate(_ALEX_CFG):
        key, k1 = jax.random.split(key)
        params[f"conv{i}_w"] = (
            jax.random.normal(k1, (k, k, in_c, out_c)) * 0.05
        )
        params[f"conv{i}_b"] = jnp.zeros((out_c,))
        params[f"lin{i}_w"] = jnp.ones((out_c,)) / out_c
        in_c = out_c
    return params


def _main(argv=None):
    """Turnkey weights build (VERDICT r4 #7): ONE command from "machine
    with the torchvision AlexNet + lpips alex.pth checkpoints" to the
    combined file config ``lpips_weights`` expects::

        python -m ctagan_tpu.ops.lpips alexnet-owt-7be5be79.pth \
            ~/.cache/lpips/weights/v0.1/alex.pth lpips_alex_combined.pth

    Copy the output next to the corpus and set ``lpips_weights:`` — the
    eval report then prints the reference's LPIPSw/LPIPS columns
    (HdTrainer.py:509-536, :553-564)."""
    import argparse

    ap = argparse.ArgumentParser(description=_main.__doc__)
    ap.add_argument("alexnet", help="torchvision AlexNet checkpoint (.pth)")
    ap.add_argument("lpips", help="lpips package alex.pth linear heads")
    ap.add_argument("out", help="combined output path")
    args = ap.parse_args(argv)
    out = combine_torch_checkpoints(args.alexnet, args.lpips, args.out)
    print(f"wrote {out}; set `lpips_weights: {out}` in your config")


if __name__ == "__main__":
    _main()
