"""Discriminator zoo.

- ``Discriminator``: the scalar-logit PatchGAN of Model/CycleGan.py:73-103 —
  4 conv stages then a 1-channel head globally average-pooled to one logit
  per image (LSGAN on a scalar).
- ``NLayerDiscriminator``: pix2pixHD-style configurable PatchGAN
  (Model/HdGan.py:148-205) with optional intermediate-feature output for
  feature matching.
- ``MultiScaleDiscriminator``: num_D NLayerDiscriminators over an image
  pyramid whose scale transition is a center crop to S/2 (HdGan.py:207-256;
  the avg-pool transition exists but is unused in the reference — both are
  supported here via ``pyramid``).
"""
from __future__ import annotations

from typing import Any, List

import numpy as np
from flax import linen as nn

from ctagan_tpu.models.layers import (
    ConvTorch,
    avg_pool_same,
    center_crop,
    global_avg_pool_logit,
    instance_norm,
    leaky_relu,
)


class Discriminator(nn.Module):
    """PatchGAN -> global-average-pooled scalar logit (N, 1)."""

    input_nc: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = ConvTorch(64, 4, stride=2, padding=1, dtype=self.dtype)(x)
        h = leaky_relu(h)
        for feats in (128, 256):
            h = ConvTorch(feats, 4, stride=2, padding=1, dtype=self.dtype)(h)
            h = instance_norm(h)
            h = leaky_relu(h)
        h = ConvTorch(512, 4, stride=1, padding=1, dtype=self.dtype)(h)
        h = instance_norm(h)
        h = leaky_relu(h)
        h = ConvTorch(1, 4, stride=1, padding=1, dtype=self.dtype)(h)
        return global_avg_pool_logit(h)


class NLayerDiscriminator(nn.Module):
    """Configurable PatchGAN; returns list of per-stage features when
    ``get_interm_feat`` (HdGan.py:185-203), else the final map."""

    input_nc: int = 1
    ndf: int = 64
    n_layers: int = 3
    get_interm_feat: bool = False
    use_sigmoid: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kw = 4
        padw = int(np.ceil((kw - 1.0) / 4))  # == 1
        feats: List = []
        h = ConvTorch(self.ndf, kw, stride=2, padding=padw, dtype=self.dtype)(x)
        h = leaky_relu(h)
        feats.append(h)
        nf = self.ndf
        for _ in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = ConvTorch(nf, kw, stride=2, padding=padw, dtype=self.dtype)(h)
            h = instance_norm(h)
            h = leaky_relu(h)
            feats.append(h)
        nf = min(nf * 2, 512)
        h = ConvTorch(nf, kw, stride=1, padding=padw, dtype=self.dtype)(h)
        h = instance_norm(h)
        h = leaky_relu(h)
        feats.append(h)
        h = ConvTorch(1, kw, stride=1, padding=padw, dtype=self.dtype)(h)
        if self.use_sigmoid:
            h = nn.sigmoid(h)
        feats.append(h)
        if self.get_interm_feat:
            return feats
        return h


class MultiScaleDiscriminator(nn.Module):
    """num_D NLayerDiscriminators over a pyramid; returns a list (coarsest
    discriminator first receives the *smallest* input — matching the
    reference's scale indexing num_D-1-i) of per-scale feature lists.

    ``pyramid='center_crop'`` (the live HD stage-2 path) crops the center
    S/2; ``pyramid='avg_pool'`` uses the classic pix2pixHD downsampler.
    """

    input_nc: int = 1
    ndf: int = 64
    n_layers: int = 3
    num_d: int = 1
    get_interm_feat: bool = True
    pyramid: str = "center_crop"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        discs = [
            NLayerDiscriminator(
                self.input_nc,
                self.ndf,
                self.n_layers,
                get_interm_feat=True,
                dtype=self.dtype,
                name=f"scale{i}",
            )
            for i in range(self.num_d)
        ]
        results = []
        inp = x
        for i in range(self.num_d):
            feats = discs[self.num_d - 1 - i](inp)
            results.append(feats if self.get_interm_feat else [feats[-1]])
            if i != self.num_d - 1:
                if self.pyramid == "center_crop":
                    inp = center_crop(inp, int(inp.shape[1] / 2))
                else:
                    inp = avg_pool_same(inp)
        return results
