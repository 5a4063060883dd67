"""ResNet generator — the single G used by every trainer family.

Architecture parity with Model/CycleGan.py:23-71 (duplicated at
Model/HdGan.py:65-113): c7s1-64 head, two stride-2 downsampling convs
(64->128->256), ``n_residual_blocks`` residual blocks at 256 channels, two
transposed-conv upsampling stages, reflect-padded 7x7 output conv + tanh.
NHWC layout; residual body runs at H/4 x W/4 x 256 where the MXU does the
bulk of the FLOPs.
"""
from __future__ import annotations

from typing import Any

from flax import linen as nn

from ctagan_tpu.models.layers import (
    ConvTorch,
    ConvTransposeTorch,
    ResidualBlock,
    instance_norm,
    reflect_pad,
)


class Generator(nn.Module):
    input_nc: int = 1
    output_nc: int = 1
    n_residual_blocks: int = 9
    base_features: int = 64
    dtype: Any = None
    remat: bool = False  # rematerialize residual blocks (activation memory
    # ~/n_blocks in backward — enables much larger per-chip batch at 512²)

    @nn.compact
    def __call__(self, x):
        f = self.base_features
        block_cls = nn.remat(ResidualBlock) if self.remat else ResidualBlock
        # head: c7s1-64
        h = reflect_pad(x, 3)
        h = ConvTorch(f, 7, dtype=self.dtype)(h)
        h = instance_norm(h)
        h = nn.relu(h)
        # downsampling 64 -> 128 -> 256
        for mult in (2, 4):
            h = ConvTorch(f * mult, 3, stride=2, padding=1, dtype=self.dtype)(h)
            h = instance_norm(h)
            h = nn.relu(h)
        # residual body at 256 channels
        for _ in range(self.n_residual_blocks):
            h = block_cls(f * 4, dtype=self.dtype)(h)
        # upsampling 256 -> 128 -> 64
        for mult in (2, 1):
            h = ConvTransposeTorch(f * mult, dtype=self.dtype)(h)
            h = instance_norm(h)
            h = nn.relu(h)
        # output head
        h = reflect_pad(h, 3)
        h = ConvTorch(self.output_nc, 7, dtype=self.dtype)(h)
        return nn.tanh(h)
