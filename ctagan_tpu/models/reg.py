"""RegNet — the deformable-registration ResUNet producing a dense 2-D flow.

Parity with trainer/reg.py:31-132 (config 'A'):
- inputs: concat(img_a, img_b) on channels;
- 7 down blocks ndf=[32,64,64,64,64,64,64], each = 3x3 conv (leaky 0.2,
  no norm) + one resnet block, with max-pool-2 and pre-pool skip;
- bottleneck: 1x1 conv 64->128, 3 resnet blocks, 1x1 conv 128->64;
- 7 up stages nuf=[64,64,64,64,64,64,32]: bilinear-resize to the skip's
  size (align_corners=False), concat [up, skip], 3x3 conv;
- refine: 1 resnet block + 1x1 conv;
- output: 3x3 conv -> 2 channels, near-zero init (init_to_identity) so the
  initial deformation is ~0. Output is NHWC flow (N, H, W, 2) with channel 0
  the row (y) displacement — see ops.warp.warp2d.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ctagan_tpu.models.layers import (
    FusedUpRegConv,
    RegConv,
    RegResnetBlock,
    max_pool,
)
from ctagan_tpu.ops.resize import interpolate_bilinear

NDF = (32, 64, 64, 64, 64, 64, 64)
NUF = (64, 64, 64, 64, 64, 64, 32)


class RegNet(nn.Module):
    in_channels_a: int = 1
    in_channels_b: int = 1
    resnet_nblocks: int = 3
    dtype: Any = None
    # Fold each up stage's bilinear-resize + concat into its conv via phase
    # decomposition (ops/fused_up.py) — opt-in TPU perf mode (config
    # ``reg_fuse_up``): interior-exact, 1-px border uses edge-replicate
    # semantics. Param tree is unchanged, checkpoints interchange.
    fuse_up: bool = False
    # Tap-decompose the MXU-degenerate 512²-level convs: the input conv
    # (2->32, contraction dim 2/128 filled) and the flow head (32->2,
    # output lanes 2/128 filled) — the RegNet analogue of the generator's
    # tap_heads. None = auto (on TPU at batch <= 8 — training runs b=1-2);
    # bool forces. Param tree unchanged; exact up to float ordering.
    tap_convs: Any = None
    # Run the 3x3 convs (RegConv + resblock + up convs) of the top
    # ``im2col_levels`` levels as im2col matmuls instead of direct XLA
    # convs (config ``reg_im2col_levels``): the 32/64-channel full-res
    # levels underfill the 128-lane MXU through the direct lowering. Param
    # tree unchanged; exact up to float ordering; plain differentiable XLA.
    # None = auto: 1 level on TPU at batch <= 4 (v5e 512² b=1 bf16 ladder:
    # R fwd+bwd 33.0 -> 30.8 ms at k=1, k=2/3 give it back; fwd-only
    # LOSES ~2.4 ms — the win is the backward's degenerate weight-grad
    # contractions, so training-shape batches only), else 0.
    im2col_levels: Any = None

    @nn.compact
    def __call__(self, img_a, img_b):
        import jax

        taps = self.tap_convs
        if taps is None:
            taps = (
                jax.default_backend() == "tpu" and img_a.shape[0] <= 8
            )
        im2col_levels = self.im2col_levels
        if im2col_levels is None:
            im2col_levels = (
                1
                if (jax.default_backend() == "tpu" and img_a.shape[0] <= 4)
                else 0
            )
        x = jnp.concatenate([img_a, img_b], axis=-1)
        skips = []
        # down path (level i+1; level 1 = full res)
        for i, nf in enumerate(NDF):
            x = RegConv(
                nf, 3, 1, 1, activation="leaky_relu", use_resnet=True,
                dtype=self.dtype, taps=taps,
                im2col=i < im2col_levels, name=f"down_{i + 1}",
            )(x)
            skips.append(x)
            x = max_pool(x, 2)
        # bottleneck
        x = RegConv(2 * NDF[-1], 1, 1, 0, dtype=self.dtype, name="c1")(x)
        for j in range(self.resnet_nblocks):
            x = RegResnetBlock(2 * NDF[-1], dtype=self.dtype, name=f"t_{j}")(x)
        x = RegConv(NDF[-1], 1, 1, 0, dtype=self.dtype, name="c2")(x)
        # up path
        for i, nf in enumerate(NUF):
            skip = skips[len(NDF) - 1 - i]
            if (
                self.fuse_up
                and skip.shape[1] == 2 * x.shape[1]
                and skip.shape[2] == 2 * x.shape[2]
            ):
                x = FusedUpRegConv(
                    nf, dtype=self.dtype, name=f"up_{len(NDF) - i}",
                )(x, skip)
                continue
            x = interpolate_bilinear(x, (skip.shape[1], skip.shape[2]))
            x = jnp.concatenate([x, skip], axis=-1)
            # up stage at level (len(NDF) - i); up_1 is the full-res stage
            x = RegConv(
                nf, 3, 1, 1, dtype=self.dtype,
                im2col=(len(NDF) - i) <= im2col_levels,
                name=f"up_{len(NDF) - i}",
            )(x)
        # refine (full res = level 1)
        x = RegResnetBlock(
            NUF[-1], dtype=self.dtype, im2col=im2col_levels >= 1,
            name="refine_res",
        )(x)
        x = RegConv(NUF[-1], 1, 1, 0, dtype=self.dtype, name="refine_conv")(x)
        # near-identity flow head
        flow = RegConv(
            2, 3, 1, 1, activation=None, zero_init=True, dtype=self.dtype,
            taps=taps, name="output",
        )(x)
        return flow
