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

import jax.numpy as jnp
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
    # spatial sharding (parallel/halo.py): the H axis is a strip of a larger
    # image carrying ``halo`` ghost rows on each side; InstanceNorm stats
    # then combine across the mesh axis so the sharded forward matches the
    # unsharded one. halo must be divisible by 4 (the generator's stride).
    spatial_axis: Any = None
    halo: int = 0
    # 'reflect' (reference semantics) or 'zero': zero padding fuses into the
    # convs instead of materializing padded copies — measured −12% forward
    # at 512² b=32 bf16. Changes boundary behavior; use for from-scratch
    # training (config pad_mode), not for imported reference checkpoints.
    pad_mode: str = "reflect"
    # Inference-only: run the residual body through the fused conv+IN Pallas
    # kernel (ops/fused_resblock.py) — no standalone InstanceNorm memory
    # passes. Same param tree as the XLA path (checkpoints interchange);
    # falls back per-block when shapes can't fuse. Not differentiable.
    fused_body: bool = False
    # TRAINING-path fused body: the same conv+IN Pallas chain with a custom
    # VJP (ops/fused_resblock_grad.py) — input-grad as a zero-halo
    # correlation kernel + reflect folds, weight-grad as transpose-matmuls
    # with in-kernel norm/ReLU recompute (relu(IN(h1)) never hits HBM).
    # Gradient parity vs the XLA body locked by tests/test_fused_grad.py.
    fused_body_grad: bool = False
    # 7×7 head/tail via the tap decomposition (ops/tap_conv.py): these conv
    # shapes are MXU-degenerate (K=49·input_nc head, N=output_nc tail).
    # Exact to float ordering and differentiable (training uses it too).
    # Measured on v5e 512² bf16 (uncontended): the TAIL tap (N=1 direct
    # conv is degenerate at any batch) wins everywhere — in-graph b=32
    # 123.6 -> 115.1 ms; isolated 43.9 -> 28.6 ms. The HEAD tap wins only
    # at small batch (b=1 fwd 10.6 -> 7.0 ms; b=8 +13%; b>=16 it plateaus
    # ~192 sl/s and loses badly at b=32, 157.6 vs 115.1 in-graph). None =
    # auto: on TPU, tail always + head at batch <= 8; off elsewhere.
    tap_heads: Any = None
    # Reflect pads without materialized padded copies (ops/border_conv.py):
    # zero-padded conv + recomputed border strips, exact reflect semantics.
    # Applies to the 7×7 convs when taps are off and to the XLA resblock
    # path. Measured a consistent LOSS on v5e 512² bf16
    # (docs/evidence/bench_borderfix_r4.log: fwd b=32 118.1 vs 116.1 ms
    # auto-on vs off; pure-XLA body 89.9 vs 86.0 reflect) — XLA's fused
    # pad+conv beats the strip recomputation. None = off (opt-in).
    border_fix: Any = None

    @nn.compact
    def __call__(self, x):
        import jax

        f = self.base_features
        ax = self.spatial_axis
        zero = self.pad_mode == "zero"
        on_tpu = jax.default_backend() == "tpu" and ax is None
        pad = "zero" if zero else "reflect"

        def conv7(h, feats, name):
            taps = self.tap_heads
            if taps is None:  # per-position auto (see tap_heads comment)
                is_tail = h.shape[-1] > feats
                taps = on_tpu and (is_tail or x.shape[0] <= 8)
            if taps:
                from ctagan_tpu.models.layers import (
                    _ConvTorchParams,
                    torch_conv_bias_init,
                    torch_conv_kernel_init,
                )
                from ctagan_tpu.ops.tap_conv import (
                    conv7_head_taps,
                    conv7_tail_taps,
                )

                cin = h.shape[-1]
                k, b = _ConvTorchParams(
                    (7, 7, cin, feats), torch_conv_kernel_init(),
                    torch_conv_bias_init((7, 7), cin), name=name,
                )()
                if self.dtype is not None:
                    h = h.astype(self.dtype)
                fn = conv7_head_taps if cin <= feats else conv7_tail_taps
                return fn(h, k, b, pad_mode=pad)
            if zero:
                return ConvTorch(feats, 7, padding=3, dtype=self.dtype,
                                 name=name)(h)
            if self.border_fix:
                # exact reflect semantics without the materialized 518²
                # padded copy (ops/border_conv.py)
                from ctagan_tpu.models.layers import (
                    _ConvTorchParams,
                    torch_conv_bias_init,
                    torch_conv_kernel_init,
                )
                from ctagan_tpu.ops.border_conv import conv_same_borderfix

                cin = h.shape[-1]
                k, b = _ConvTorchParams(
                    (7, 7, cin, feats), torch_conv_kernel_init(),
                    torch_conv_bias_init((7, 7), cin), name=name,
                )()
                return conv_same_borderfix(h, k, b, dtype=self.dtype)
            return ConvTorch(feats, 7, dtype=self.dtype, name=name)(
                reflect_pad(h, 3)
            )

        def block_cls(feats, halo):
            cls = nn.remat(ResidualBlock) if self.remat else ResidualBlock
            bfix = bool(self.border_fix)
            return cls(feats, dtype=self.dtype, spatial_axis=ax, halo=halo,
                       pad_mode=self.pad_mode, fused=self.fused_body,
                       border_fix=bfix)

        # head: c7s1-64
        h = conv7(x, f, "ConvTorch_0")
        from ctagan_tpu.models.layers import (
            _ConvTorchParams,
            _ResBlockParams,
            torch_conv_bias_init,
            torch_conv_kernel_init,
        )
        from ctagan_tpu.ops.fused_resblock import _stats_to_norm, can_fuse

        body_shape = (h.shape[0], h.shape[1] // 4, h.shape[2] // 4, f * 4)
        chain_ok = (
            self.fused_body
            and not zero
            and ax is None
            and can_fuse(body_shape)
            and (f * 4) % 128 == 0
        )
        # fused down path: the head's IN folds into down1 (head stats via
        # one XLA reduction over the RAW head output — no normalize pass
        # materializes), both stride-2 convs run in the packed Pallas
        # kernel, and down2's IN folds into the body chain's first kernel.
        # Measured (v5e 512² bf16): b=1 5.32 -> 4.97 ms, b=8 194.5 ->
        # 200.6 sl/s, b=32 115.0 -> 126.6 ms (loses saturated, as with the
        # other latency-regime kernels) -> batch <= 8 gate
        fuse_down = (
            chain_ok
            and x.shape[0] <= 8
            and (h.shape[2] // 2) % 128 == 0
            and (2 * f) % 128 == 0
        )
        in_norm = None
        if fuse_down:
            from ctagan_tpu.ops.fused_down import conv3x3_s2_zero_stats

            if self.dtype is not None:
                h = h.astype(self.dtype)
            hf = h.astype(jnp.float32)
            s0 = jnp.stack(
                [jnp.sum(hf, axis=(1, 2)), jnp.sum(hf * hf, axis=(1, 2))],
                axis=1,
            )
            norm = _stats_to_norm(s0, float(h.shape[1] * h.shape[2]), 1e-5)
            for i, mult in enumerate((2, 4)):
                kd, bd = _ConvTorchParams(
                    (3, 3, h.shape[-1], f * mult), torch_conv_kernel_init(),
                    torch_conv_bias_init((3, 3), h.shape[-1]),
                    name=f"ConvTorch_{i + 1}",
                )()
                h, sd = conv3x3_s2_zero_stats(h, kd, bd, norm=norm,
                                              relu=True)
                norm = _stats_to_norm(
                    sd, float(h.shape[1] * h.shape[2]), 1e-5
                )
            in_norm = norm
        else:
            h = instance_norm(h, spatial_axis=ax, halo=self.halo)
            h = nn.relu(h)
            # downsampling 64 -> 128 -> 256
            for i, (mult, div) in enumerate(((2, 2), (4, 4))):
                h = ConvTorch(f * mult, 3, stride=2, padding=1,
                              dtype=self.dtype,
                              name=f"ConvTorch_{i + 1}")(h)
                h = instance_norm(h, spatial_axis=ax, halo=self.halo // div)
                h = nn.relu(h)
        # residual body at 256 channels
        if chain_ok:
            # whole-body fused chain: each block's skip-add epilogue is
            # folded into the next block's first conv kernel; with the
            # fused down path, down2's norm+relu folds into block 0
            from ctagan_tpu.ops.fused_resblock import fused_residual_chain

            params = [
                _ResBlockParams(f * 4, h.shape[-1] if i == 0 else f * 4,
                                name=f"ResidualBlock_{i}")()
                for i in range(self.n_residual_blocks)
            ]
            if self.dtype is not None:
                h = h.astype(self.dtype)
            h = fused_residual_chain(h, params, in_norm=in_norm,
                                     in_relu=in_norm is not None)
        elif (
            self.fused_body_grad
            and not zero
            and ax is None
            and can_fuse(body_shape)
            and (f * 4) % 128 == 0
            and self.n_residual_blocks > 0
        ):
            # differentiable fused chain (plain form — down/up stay XLA on
            # the training path)
            from ctagan_tpu.ops.fused_resblock_grad import (
                fused_chain_vjp_make,
            )

            params = [
                _ResBlockParams(f * 4, f * 4, name=f"ResidualBlock_{i}")()
                for i in range(self.n_residual_blocks)
            ]
            if self.dtype is not None:
                h = h.astype(self.dtype)
            h = fused_chain_vjp_make()(h, params)
        else:
            for _ in range(self.n_residual_blocks):
                h = block_cls(f * 4, self.halo // 4)(h)
        # upsampling 256 -> 128 -> 64
        # measured (v5e 512² bf16): wins the latency regime (b=1 full-fused
        # fwd 7.0 -> 5.32 ms) but loses from b=8 up (180.6 vs 194.5 sl/s;
        # b=32 115.1 -> 127.4 ms — the phase-deblock materializations +
        # Co=64 lanes in U2 outweigh the saved IN passes once the pipeline
        # fills) -> batch <= 2 gate
        fuse_up = (
            self.fused_body
            and not zero
            and ax is None
            and x.shape[0] <= 2
            and h.shape[2] % 128 == 0
            and h.shape[-1] % 128 == 0
            and (f * 2) % 128 == 0
        )
        if fuse_up:
            # both transposed convs + the InstanceNorms between them run in
            # the fused phase kernels (ops/fused_convt.py); the final
            # norm+relu stays in XLA where it fuses into the tail
            from ctagan_tpu.models.layers import _ConvTransposeParams
            from ctagan_tpu.ops.fused_convt import (
                convt2x_stats,
                phase_deblock,
            )
            from ctagan_tpu.ops.fused_resblock import _stats_to_norm

            hw = float(h.shape[1] * h.shape[2])
            k0, b0 = _ConvTransposeParams(
                f * 2, h.shape[-1], name="ConvTransposeTorch_0"
            )()
            k1, b1 = _ConvTransposeParams(
                f, f * 2, name="ConvTransposeTorch_1"
            )()
            if self.dtype is not None:
                h = h.astype(self.dtype)
            h, s1 = convt2x_stats(h, k0, b0)
            n1 = _stats_to_norm(s1, hw * 4.0, 1e-5)
            h, s2 = convt2x_stats(
                phase_deblock(h, f * 2), k1, b1, norm=n1, relu=True
            )
            n2 = _stats_to_norm(s2, hw * 16.0, 1e-5)
            hf = phase_deblock(h, f).astype(jnp.float32)
            h = nn.relu(
                (hf - n2[:, 0][:, None, None, :])
                * n2[:, 1][:, None, None, :]
            ).astype(h.dtype)
        else:
            for mult, div in ((2, 2), (1, 1)):
                h = ConvTransposeTorch(f * mult, dtype=self.dtype)(h)
                h = instance_norm(h, spatial_axis=ax, halo=self.halo // div)
                h = nn.relu(h)
        # output head
        h = conv7(h, self.output_nc, "ConvTorch_3")
        return nn.tanh(h)
