"""Layer library: NHWC Flax primitives shared by the model zoo.

TPU-first counterpart of the reference's layer vocabulary
(Model/CycleGan.py, Model/HdGan.py, trainer/layers.py): reflection-padded
convs, affine-free instance norm, PyTorch-compatible strided / transposed
convs and initializers. Everything is channels-last (NHWC) — the layout XLA
tiles best onto the MXU — and dtype-polymorphic so the whole stack can run
in bfloat16 with float32 params.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# ---------------------------------------------------------------------------
# Initializers matching PyTorch defaults / the reference's choices
# ---------------------------------------------------------------------------

def torch_conv_kernel_init():
    """PyTorch Conv2d default: kaiming_uniform(a=sqrt(5)) == variance 1/(3 fan_in)."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_conv_bias_init(kernel_size: Sequence[int], in_features: int):
    """PyTorch Conv2d default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in = in_features
    for k in kernel_size:
        fan_in *= k

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal_init(negative_slope: float = 0.0):
    """kaiming_normal(fan_in, leaky_relu a) — trainer/layers.py:31-33."""
    gain_sq = 2.0 / (1.0 + negative_slope**2)
    return nn.initializers.variance_scaling(gain_sq, "fan_in", "normal")


def near_zero_init(std: float = 1e-5):
    """The reference's 'zeros' init = normal(0, 1e-5) (layers.py:44) — used to
    initialize the deformation head to (near-)identity."""
    return nn.initializers.normal(stddev=std)


# ---------------------------------------------------------------------------
# Functional primitives
# ---------------------------------------------------------------------------

def reflect_pad(x, pad: int):
    """ReflectionPad2d for NHWC input."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


# When True, instance_norm lowers through the fused two-phase Pallas kernel
# (ops.pallas_kernels) instead of the XLA reduction chain. Set before trace
# (e.g. ctagan_tpu.models.layers.USE_PALLAS_INSTANCE_NORM = True); baked at
# jit time. Requires H divisible by 16 and a TPU backend.
USE_PALLAS_INSTANCE_NORM = False


def instance_norm(x, eps: float = 1e-5, spatial_axis: Optional[str] = None,
                  halo: int = 0):
    """InstanceNorm2d(affine=False, track_running_stats=False): normalize each
    (sample, channel) plane over H, W. Stats in fp32 for bf16 inputs.

    ``spatial_axis``: when running inside a ``shard_map`` that shards H over
    a mesh axis (parallel/halo.py), statistics must cover the full sharded
    image exactly once: each device masks out its ghost rows (halo rows
    duplicated from neighbours) EXCEPT the outer halos of the first/last
    device — those are the symmetric border extension, which the reference
    computation (unsharded forward over the symmetric-extended image) also
    sees — and the sums combine with a ``psum`` over the axis. This makes
    the sharded forward bit-match the extended-image forward everywhere.

    Stats dtype is ``promote_types(x.dtype, float32)``: bit-identical to
    the old hard f32 cast on every production dtype (bf16/f32), but f64
    inputs keep f64 stats — so the x64 schedule-equality tests
    (tests/test_parallel_pipeline.py) measure the schedule, not f32
    truncation noise injected mid-f64-graph."""
    stats_t = jnp.promote_types(x.dtype, jnp.float32)
    if spatial_axis is not None:
        xf = x.astype(stats_t)
        h = xf.shape[1]
        idx = jax.lax.axis_index(spatial_axis)
        nproc = jax.lax.psum(1, spatial_axis)
        rows = jnp.arange(h)
        ghost_top = (rows < halo) & (idx != 0)
        ghost_bot = (rows >= h - halo) & (idx != nproc - 1)
        w = jnp.where(ghost_top | ghost_bot, 0.0, 1.0)[None, :, None, None]
        s1 = jax.lax.psum(
            jnp.sum(xf * w, axis=(1, 2), keepdims=True), spatial_axis
        )
        n = jax.lax.psum(jnp.sum(w) * xf.shape[2], spatial_axis)
        mean = s1 / n
        s2 = jax.lax.psum(
            jnp.sum(((xf - mean) ** 2) * w, axis=(1, 2), keepdims=True),
            spatial_axis,
        )
        var = s2 / n
        return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    if USE_PALLAS_INSTANCE_NORM and x.shape[1] % 16 == 0 and x.shape[2] >= 128:
        from ctagan_tpu.ops.pallas_kernels import instance_norm_pallas

        return instance_norm_pallas(x, eps=eps)
    # one-pass statistics: E[x²]−E[x]² lets XLA fuse both reductions into a
    # single read of the activation (vs mean-then-var reading it twice).
    # Measured on v5e: generator fwd 512² b=32 bf16 157.5 → 143.6 ms (+10%).
    # Stats are f32 (f64 under x64 inputs) and variance is clamped at 0, so
    # the cancellation risk of the one-pass form is bounded; torch-parity
    # locked by test.
    xf = x.astype(stats_t)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(xf * xf, axis=(1, 2), keepdims=True)
    var = jnp.maximum(m2 - mean * mean, 0.0)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return out.astype(x.dtype)


def leaky_relu(x, negative_slope: float = 0.2):
    return nn.leaky_relu(x, negative_slope)


def max_pool(x, window: int = 2):
    """Non-overlapping max pool (torch MaxPool2d(window) semantics).

    Implemented as a reshape + axis-max rather than ``lax.reduce_window``:
    the forward values are identical, but the VJP of reduce_window(max) is
    XLA SelectAndScatter — a serialized scatter that is pathologically slow
    on TPU — while the reshape form differentiates to a cheap compare+mask.
    (Tie handling differs: reduce_window routes the cotangent to the first
    max, the reshape form splits it across ties — a measure-zero
    subgradient choice for float activations.) The RegNet's 7 pools sit on
    the training hot path (reference trainer/reg.py:82 MaxPool2d(2)).
    """
    n, h, w, c = x.shape
    if h % window or w % window:
        return nn.max_pool(x, (window, window), strides=(window, window))
    xr = x.reshape(n, h // window, window, w // window, window, c)
    return xr.max(axis=(2, 4))


def avg_pool_same(x, window: int = 3, stride: int = 2):
    """AvgPool2d(3, stride=2, padding=1, count_include_pad=False) — the HD
    multi-scale pyramid downsampler (HdGan.py:224)."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    counts = jax.lax.reduce_window(
        jnp.ones_like(x), 0.0, jax.lax.add, (1, window, window, 1),
        (1, stride, stride, 1), [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return summed / counts


def center_crop(x, size: int):
    """torchvision tf.center_crop for NHWC — the HD stage-2 multi-scale
    transition (HdGan.py:251)."""
    h, w = x.shape[1], x.shape[2]
    top = (h - size) // 2
    left = (w - size) // 2
    return x[:, top : top + size, left : left + size, :]


def global_avg_pool_logit(x):
    """avg_pool2d over full spatial extent -> (N, C) (CycleGan.py:103)."""
    return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# Flax modules
# ---------------------------------------------------------------------------

class ConvTorch(nn.Module):
    """Conv2d with PyTorch-default init and integer zero padding."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kinit = self.kernel_init or torch_conv_kernel_init()
        binit = self.bias_init or torch_conv_bias_init((k, k), x.shape[-1])
        return nn.Conv(
            self.features,
            (k, k),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=binit,
            dtype=self.dtype,
        )(x)


class ConvTransposeTorch(nn.Module):
    """ConvTranspose2d(k=3, s=2, p=1, output_padding=1) equivalent: doubles
    H and W exactly like the reference generator's up path (CycleGan.py:50).

    Implemented as input dilation + asymmetric padding (lo = k-1-p,
    hi = k-1-p+output_padding) with a transposed kernel — the form XLA maps
    straight onto the MXU.
    """

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        lo = k - 1 - self.padding
        hi = k - 1 - self.padding + self.output_padding
        # torch fan_in for ConvTranspose default init counts out_channels*k*k
        fan_in = self.features * k * k

        def bias_init(key, shape, dtype=jnp.float32):
            bound = 1.0 / jnp.sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return nn.ConvTranspose(
            self.features,
            (k, k),
            strides=(self.stride, self.stride),
            padding=[(lo, hi), (lo, hi)],
            # PyTorch ConvTranspose2d default init divides by O*k*k; on the
            # transpose_kernel layout (kh,kw,O,I) that is flax's "fan_in"
            # (shape[-2] * receptive_field)
            kernel_init=nn.initializers.variance_scaling(
                1.0 / 3.0, "fan_in", "uniform"
            ),
            bias_init=bias_init,
            transpose_kernel=True,
            dtype=self.dtype,
        )(x)


class ResidualBlock(nn.Module):
    """reflect-pad 3x3 conv + IN + ReLU + reflect-pad 3x3 conv + IN, additive
    skip (CycleGan.py:6-21). ``spatial_axis``/``halo``: distributed IN stats
    when H is sharded over a mesh axis (parallel/halo.py). ``pad_mode``:
    'reflect' (reference) or 'zero' — zero padding folds into the conv op
    instead of materializing a padded copy (TPU perf option, −12% fwd)."""

    features: int
    dtype: Any = None
    spatial_axis: Optional[str] = None
    halo: int = 0
    pad_mode: str = "reflect"
    # Reflect pads via ops/border_conv.py (zero-padded conv + recomputed
    # border strips — exact reflect semantics, no materialized padded
    # copy). Only meaningful on the unsharded XLA path.
    border_fix: bool = False
    # Route through the fused conv+IN Pallas kernel (ops/fused_resblock.py):
    # both convs, both norms and the inter-conv ReLU execute in two kernel
    # launches with no standalone InstanceNorm memory passes. Forward-only
    # (no autodiff rule) — inference/eval/serving. Param tree is identical
    # to the unfused path, so checkpoints interchange bit-for-bit. Falls
    # back silently when the shape/pad-mode/sharding can't fuse.
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        zero = self.pad_mode == "zero"
        if (
            self.fused
            and not zero
            and self.spatial_axis is None
        ):
            from ctagan_tpu.ops.fused_resblock import (
                can_fuse,
                fused_residual_block,
            )

            if can_fuse(x.shape) and self.features % 128 == 0:
                cin = x.shape[-1]
                k1, b1 = _ConvTorchParams(
                    (3, 3, cin, self.features), torch_conv_kernel_init(),
                    torch_conv_bias_init((3, 3), cin), name="ConvTorch_0",
                )()
                k2, b2 = _ConvTorchParams(
                    (3, 3, self.features, self.features),
                    torch_conv_kernel_init(),
                    torch_conv_bias_init((3, 3), self.features),
                    name="ConvTorch_1",
                )()
                if self.dtype is not None:
                    x = x.astype(self.dtype)
                return fused_residual_block(x, k1, b1, k2, b2)

        def conv(h, name):
            if zero:
                return ConvTorch(self.features, 3, padding=1,
                                 dtype=self.dtype, name=name)(h)
            if self.border_fix and self.spatial_axis is None:
                from ctagan_tpu.ops.border_conv import conv_same_borderfix

                cin = h.shape[-1]
                k, b = _ConvTorchParams(
                    (3, 3, cin, self.features), torch_conv_kernel_init(),
                    torch_conv_bias_init((3, 3), cin), name=name,
                )()
                return conv_same_borderfix(h, k, b, dtype=self.dtype)
            return ConvTorch(self.features, 3, dtype=self.dtype,
                             name=name)(reflect_pad(h, 1))

        h = conv(x, "ConvTorch_0")
        h = instance_norm(h, spatial_axis=self.spatial_axis, halo=self.halo)
        h = nn.relu(h)
        h = conv(h, "ConvTorch_1")
        h = instance_norm(h, spatial_axis=self.spatial_axis, halo=self.halo)
        return x + h


class _ResBlockParams(nn.Module):
    """Declares a ResidualBlock's two conv param sets under the exact names
    a real ``ResidualBlock`` would create — the fused body chain
    (ops/fused_resblock.py) consumes the tuple while checkpoints stay
    interchangeable with the unfused module tree."""

    features: int
    cin: int

    @nn.compact
    def __call__(self):
        k1, b1 = _ConvTorchParams(
            (3, 3, self.cin, self.features), torch_conv_kernel_init(),
            torch_conv_bias_init((3, 3), self.cin), name="ConvTorch_0",
        )()
        k2, b2 = _ConvTorchParams(
            (3, 3, self.features, self.features), torch_conv_kernel_init(),
            torch_conv_bias_init((3, 3), self.features), name="ConvTorch_1",
        )()
        return k1, b1, k2, b2


class _CTInnerParams(nn.Module):
    features: int
    cin: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        fan_in = self.features * k * k

        def bias_init(key, shape, dtype=jnp.float32):
            bound = 1.0 / jnp.sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kp = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (k, k, self.features, self.cin),
        )
        b = self.param("bias", bias_init, (self.features,))
        return kp, b


class _ConvTransposeParams(nn.Module):
    """Declares a ``ConvTransposeTorch``'s params under its exact names for
    the fused up-path (ops/fused_convt.py); checkpoints interchange."""

    features: int
    cin: int

    @nn.compact
    def __call__(self):
        return _CTInnerParams(
            self.features, self.cin, name="ConvTranspose_0"
        )()


class RegConv(nn.Module):
    """trainer/layers.py:71-104 ``Conv``: conv -> (no norm) -> activation ->
    optional single ResnetBlock; kaiming init, zero bias."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    activation: Optional[str] = "leaky_relu"
    use_resnet: bool = False
    zero_init: bool = False
    dtype: Any = None
    # taps=True routes MXU-degenerate channel shapes (min(C_in, C_out) <= 8)
    # through the tap decomposition (ops/tap_conv.py): the RegNet's input
    # conv (2->32) wastes the contraction dim, its flow head (32->2) the
    # output lanes, exactly like the generator's 7x7 head/tail. Param tree
    # is unchanged (checkpoints interchange); numerics exact up to float
    # ordering / one bf16 tap-image rounding on the tail form.
    taps: bool = False
    # im2col=True routes the 3x3 'same' conv through the im2col matmul form
    # for ANY channel count (ops/tap_conv.py::conv_head_taps) — dodges
    # XLA's lane-padded direct lowering at small C (the RegNet's 32/64-ch
    # top levels). Differentiable plain XLA; exact up to float ordering.
    im2col: bool = False

    @nn.compact
    def __call__(self, x):
        slope = 0.2 if self.activation == "leaky_relu" else 0.0
        kinit = near_zero_init() if self.zero_init else kaiming_normal_init(slope)
        cin = x.shape[-1]
        degenerate = min(cin, self.features) <= 8
        if (
            (self.im2col or (self.taps and degenerate))
            and self.stride == 1
            and self.padding == self.kernel_size // 2
        ):
            from ctagan_tpu.ops.tap_conv import conv_head_taps, conv_tail_taps

            k, b = _ConvTorchParams(
                (self.kernel_size, self.kernel_size, cin, self.features),
                kinit, nn.initializers.zeros, name="ConvTorch_0",
            )()
            if self.dtype is not None:
                x = x.astype(self.dtype)
            # tail form only for a degenerate C_out (its tap image is
            # kh*kw*C_out wide — tiny there, 9x blowup otherwise)
            fn = (
                conv_tail_taps
                if (degenerate and self.features < cin)
                else conv_head_taps
            )
            x = fn(x, k, b, pad_mode="zero")
        else:
            x = ConvTorch(
                self.features,
                self.kernel_size,
                self.stride,
                self.padding,
                kernel_init=kinit,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
            )(x)
        if self.activation == "leaky_relu":
            x = leaky_relu(x, 0.2)
        elif self.activation == "relu":
            x = nn.relu(x)
        if self.use_resnet:
            x = RegResnetBlock(
                self.features, dtype=self.dtype, im2col=self.im2col
            )(x)
        return x


class _ConvParams(nn.Module):
    """Declares kernel/bias under nn.Conv's param names without applying the
    conv — lets a fused forward reuse the exact param-tree slot that a
    ``ConvTorch`` would create (checkpoints interchange bit-for-bit)."""

    shape: tuple  # (kh, kw, cin, cout)
    kernel_init: Callable
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, self.shape)
        b = self.param("bias", self.bias_init, (self.shape[-1],))
        return k, b


class _ConvTorchParams(nn.Module):
    shape: tuple
    kernel_init: Callable
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self):
        return _ConvParams(
            self.shape, self.kernel_init, self.bias_init, name="Conv_0"
        )()


class FusedUpRegConv(nn.Module):
    """Fused ResUNet up stage: ``leaky_relu(conv3x3(concat(up2x(x), skip)))``
    with the upsample/concat folded into the conv (ops/fused_up.py). The
    param tree is identical to ``RegConv(features, 3, 1, 1)`` named the same
    way, so fused and unfused checkpoints interchange."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x_low, skip):
        from ctagan_tpu.ops.fused_up import fused_up_concat_conv

        cin = x_low.shape[-1] + skip.shape[-1]
        k, b = _ConvTorchParams(
            (3, 3, cin, self.features), kaiming_normal_init(0.2),
            name="ConvTorch_0",
        )()
        if self.dtype is not None:
            x_low = x_low.astype(self.dtype)
            skip = skip.astype(self.dtype)
        y = fused_up_concat_conv(x_low, skip, k, b, dtype=self.dtype)
        return leaky_relu(y, 0.2)


class RegResnetBlock(nn.Module):
    """layers.py:244-300 ``ResnetBlock``: reflect 3x3 conv + IN + ReLU +
    reflect 3x3 conv + IN, additive skip; kaiming init, zero bias.

    ``im2col``: run both convs as im2col matmuls (ops/tap_conv.py) instead
    of the direct XLA conv — same params (checkpoints interchange), exact
    up to float ordering; the RegNet's small-channel top levels use this
    on TPU where the direct lowering lane-pads C=32/64 (config
    ``reg_im2col_levels``)."""

    features: int
    dtype: Any = None
    im2col: bool = False

    @nn.compact
    def __call__(self, x):
        init = kaiming_normal_init(0.0)
        if self.im2col:
            from ctagan_tpu.ops.tap_conv import conv_head_taps

            k1, b1 = _ConvTorchParams(
                (3, 3, x.shape[-1], self.features), init,
                nn.initializers.zeros, name="ConvTorch_0",
            )()
            k2, b2 = _ConvTorchParams(
                (3, 3, self.features, self.features), init,
                nn.initializers.zeros, name="ConvTorch_1",
            )()
            if self.dtype is not None:
                x = x.astype(self.dtype)
            h = conv_head_taps(x, k1, b1, pad_mode="reflect")
            h = instance_norm(h)
            h = nn.relu(h)
            h = conv_head_taps(
                h.astype(x.dtype) if self.dtype is not None else h,
                k2, b2, pad_mode="reflect",
            )
            h = instance_norm(h)
            return x + h
        h = reflect_pad(x, 1)
        h = ConvTorch(
            self.features, 3, kernel_init=init, bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(h)
        h = instance_norm(h)
        h = nn.relu(h)
        h = reflect_pad(h, 1)
        h = ConvTorch(
            self.features, 3, kernel_init=init, bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(h)
        h = instance_norm(h)
        return x + h
