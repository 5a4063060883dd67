"""3-D volumetric model family: patch-based volume-to-volume synthesis.

The reference is strictly 2-D (one slice at a time, stitched only through
the filesystem — SURVEY.md §5); BASELINE.json's full-volume config calls for
"patch-based 2.5D/3D conv synthesis with sliding-window stitched inference".
The 2.5-D path is ``context_slices``; this module is the true 3-D family:

- ``Generator3D``: NDHWC 3-D ResNet generator — c3s1 head, two stride-2
  (H,W)-downsampling stages (depth kept full: CT series are anisotropic,
  ~5 mm slices vs ~0.7 mm pixels), residual body, transposed-conv up path,
  tanh head. Mirrors the 2-D generator's shape so the recipe transfers.
- ``Discriminator3D``: 3-D PatchGAN with global-average-pooled scalar logit
  (the 2-D family's LSGAN-on-a-scalar design).

All convs are jnp/flax native (XLA lowers 3-D convs onto the MXU by
flattening kernel dims); bfloat16-ready with fp32 norm statistics.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ctagan_tpu.models.layers import torch_conv_kernel_init


def instance_norm3d(x, eps: float = 1e-5, spatial_axis=None, halo: int = 0):
    """InstanceNorm3d(affine=False): per-(sample, channel) stats over
    (D, H, W); fp32 statistics for bf16 activations.

    ``spatial_axis``: inside a ``shard_map`` that shards D over a mesh axis
    (parallel/volume.infer_volume_depth_sharded), statistics must cover the
    full volume exactly once — same ghost-masking + psum scheme as the 2-D
    ``layers.instance_norm``: each device zeroes its ghost depth slabs
    (duplicated from neighbours) except the outer halos of the first/last
    device (the symmetric border extension the reference computation also
    sees), and the sums combine across the axis."""
    xf = x.astype(jnp.float32)
    if spatial_axis is not None:
        d = xf.shape[1]
        idx = jax.lax.axis_index(spatial_axis)
        nproc = jax.lax.psum(1, spatial_axis)
        sl = jnp.arange(d)
        ghost_top = (sl < halo) & (idx != 0)
        ghost_bot = (sl >= d - halo) & (idx != nproc - 1)
        w = jnp.where(ghost_top | ghost_bot, 0.0, 1.0)[None, :, None, None, None]
        s1 = jax.lax.psum(
            jnp.sum(xf * w, axis=(1, 2, 3), keepdims=True), spatial_axis
        )
        n = jax.lax.psum(
            jnp.sum(w) * xf.shape[2] * xf.shape[3], spatial_axis
        )
        mean = s1 / n
        s2 = jax.lax.psum(
            jnp.sum(((xf - mean) ** 2) * w, axis=(1, 2, 3), keepdims=True),
            spatial_axis,
        )
        var = s2 / n
        return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 3), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class Conv3d(nn.Module):
    features: int
    kernel: tuple = (3, 3, 3)
    strides: tuple = (1, 1, 1)
    padding: Any = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)] * 3
        return nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=pad,
            kernel_init=torch_conv_kernel_init(),
            dtype=self.dtype,
        )(x)


class ResidualBlock3D(nn.Module):
    features: int
    dtype: Any = None
    spatial_axis: Any = None
    halo: int = 0

    @nn.compact
    def __call__(self, x):
        _in = lambda h: instance_norm3d(
            h, spatial_axis=self.spatial_axis, halo=self.halo
        )
        h = Conv3d(self.features, dtype=self.dtype)(x)
        h = _in(h)
        h = nn.relu(h)
        h = Conv3d(self.features, dtype=self.dtype)(h)
        h = _in(h)
        return x + h


class Generator3D(nn.Module):
    """NDHWC volume-to-volume generator. Input (N, D, H, W, C).

    ``depth_strides`` sets the depth stride of the two downsampling stages
    (mirrored in the up path). The default (1, 1) keeps depth full-res —
    right for routine anisotropic CT series (~5 mm slices vs ~0.7 mm
    pixels). For thin-slice near-isotropic acquisitions set (1, 2) or
    (2, 2) (config ``depth_downsample`` 2 / 4): the residual body then runs
    on a depth-reduced volume, cutting its FLOPs/memory by the same factor
    and growing the through-plane receptive field to match in-plane.
    """

    input_nc: int = 1
    output_nc: int = 1
    n_residual_blocks: int = 6
    base_features: int = 32
    depth_strides: tuple = (1, 1)
    dtype: Any = None
    # tail (3,7,7) conv with C_out=1 is MXU-degenerate through the direct
    # lowering (N=1 fills 1/128 lanes) — the tap decomposition
    # (ops.tap_conv.conv3d_tail_taps) computes it as a pointwise matmul +
    # 147 shifted adds, exact and differentiable. None = auto (TPU).
    tap_tail: Any = None
    # head (3,7,7) conv with C_in=1: same degeneracy on the contraction dim
    # — im2col to a 147-tap image + one matmul (conv3d_head_taps). The tap
    # image is 147x the input, so auto gates on its size staying under
    # ~1.5 GB alongside the TPU check. None = auto; bool forces.
    tap_head: Any = None
    # depth-halo sharded inference (parallel/volume.py): mesh axis name the
    # D dim is sharded over inside a shard_map + the ghost-slab count;
    # InstanceNorm stats psum across the axis. Requires depth_strides (1,1).
    spatial_axis: Any = None
    halo: int = 0

    @nn.compact
    def __call__(self, x):
        if self.spatial_axis is not None and self.depth_strides != (1, 1):
            raise ValueError(
                "depth-halo sharding requires depth_strides=(1, 1)"
            )
        _in = lambda h: instance_norm3d(
            h, spatial_axis=self.spatial_axis, halo=self.halo
        )
        f = self.base_features
        taps_head = self.tap_head
        if taps_head is None:
            tap_bytes = 2 * 3 * 49 * int(np.prod(x.shape[:4]))
            taps_head = (
                jax.default_backend() == "tpu"
                and x.shape[-1] <= 2
                and tap_bytes <= 1_500_000_000
            )
        if taps_head:
            from ctagan_tpu.models.layers import _ConvTorchParams
            from ctagan_tpu.ops.tap_conv import conv3d_head_taps

            k, b = _ConvTorchParams(
                (3, 7, 7, x.shape[-1], f),
                torch_conv_kernel_init(), name="Conv3d_0",
            )()
            if self.dtype is not None:
                x = x.astype(self.dtype)
            h = conv3d_head_taps(x, k, b)
        else:
            h = Conv3d(f, kernel=(3, 7, 7), padding=[(1, 1), (3, 3), (3, 3)],
                       dtype=self.dtype, name="Conv3d_0")(x)
        h = _in(h)
        h = nn.relu(h)
        # explicit names: the tap-head branch reserves Conv3d_0 through a
        # param-only module, which would shift flax's auto counter — pin
        # every Conv3d slot so tap/direct checkpoints interchange
        for idx, (mult, ds) in enumerate(zip((2, 4), self.depth_strides)):
            h = Conv3d(
                f * mult, strides=(ds, 2, 2), dtype=self.dtype,
                name=f"Conv3d_{idx + 1}",
            )(h)
            h = _in(h)
            h = nn.relu(h)
        for _ in range(self.n_residual_blocks):
            h = ResidualBlock3D(
                f * 4, dtype=self.dtype,
                spatial_axis=self.spatial_axis, halo=self.halo,
            )(h)
        for mult, ds in zip((2, 1), self.depth_strides[::-1]):
            dpad = (1, 2) if ds == 2 else (1, 1)
            h = nn.ConvTranspose(
                f * mult,
                (3, 3, 3),
                strides=(ds, 2, 2),
                padding=[dpad, (1, 2), (1, 2)],
                transpose_kernel=True,
                dtype=self.dtype,
            )(h)
            h = _in(h)
            h = nn.relu(h)
        taps = self.tap_tail
        if taps is None:
            taps = jax.default_backend() == "tpu"
        if taps:
            from ctagan_tpu.models.layers import _ConvTorchParams
            from ctagan_tpu.ops.tap_conv import conv3d_tail_taps

            k, b = _ConvTorchParams(
                (3, 7, 7, h.shape[-1], self.output_nc),
                torch_conv_kernel_init(), name="Conv3d_3",
            )()
            if self.dtype is not None:
                h = h.astype(self.dtype)
            h = conv3d_tail_taps(h, k, b)
        else:
            h = Conv3d(self.output_nc, kernel=(3, 7, 7),
                       padding=[(1, 1), (3, 3), (3, 3)], dtype=self.dtype,
                       name="Conv3d_3")(h)
        return nn.tanh(h)


class Discriminator3D(nn.Module):
    """3-D PatchGAN -> scalar logit (N, 1)."""

    input_nc: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = Conv3d(32, kernel=(3, 4, 4), strides=(1, 2, 2),
                   padding=[(1, 1), (1, 1), (1, 1)], dtype=self.dtype)(x)
        h = nn.leaky_relu(h, 0.2)
        for feats, ds in ((64, 2), (128, 2), (256, 1)):
            h = Conv3d(feats, kernel=(3, 4, 4), strides=(1, ds, ds),
                       padding=[(1, 1), (1, 1), (1, 1)], dtype=self.dtype)(h)
            h = instance_norm3d(h)
            h = nn.leaky_relu(h, 0.2)
        h = Conv3d(1, kernel=(3, 4, 4), padding=[(1, 1), (1, 1), (1, 1)],
                   dtype=self.dtype)(h)
        return jnp.mean(h, axis=(1, 2, 3))
