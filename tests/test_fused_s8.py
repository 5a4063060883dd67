"""Parity tests for the int8 fused residual body (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from ctagan_tpu.ops.fused_s8 import (
    conv3x3_reflect_s8,
    fused_residual_chain_s8,
)
from ctagan_tpu.ops.quantize import quantize_weight_per_channel


def _rand(shape, seed=0, scale=1.0):
    return (
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
        * scale
    )


def _ref_conv(x, w, b):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b


def _inorm(h, eps=1e-5):
    m = jnp.mean(h, (1, 2), keepdims=True)
    v = jnp.maximum(jnp.mean(h * h, (1, 2), keepdims=True) - m * m, 0.0)
    return (h - m) * jax.lax.rsqrt(v + eps)


def test_s8_conv_mode_i_matches_dequant_conv():
    # pre-quantized input path: integer matmul + combined dequant must
    # match the f32 conv of the dequantized operands
    x = _rand((1, 8, 128, 128), 0)
    w = _rand((3, 3, 128, 128), 1, 0.05)
    b = _rand((128,), 2, 0.01)
    q, ws = quantize_weight_per_channel(jnp.asarray(w))
    amax = np.abs(x).max()
    xs = amax / 127.0
    x_s8 = np.clip(np.round(x / xs), -127, 127).astype(np.int8)
    y, stats = conv3x3_reflect_s8(
        jnp.asarray(x_s8), q, ws, jnp.asarray(b),
        x_scale=jnp.float32(xs), out_dtype=jnp.float32, interpret=True,
    )
    want = _ref_conv(
        jnp.asarray(x_s8, jnp.float32) * xs,
        q.astype(jnp.float32) * ws[None, None, None, :],
        jnp.asarray(b),
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=2e-4)
    # stats are sums over the output
    np.testing.assert_allclose(
        np.asarray(stats[:, 0]), np.asarray(jnp.sum(want, (1, 2))),
        rtol=1e-4, atol=1e-3,
    )


def test_s8_conv_mode_ii_streaming_norm_quant():
    # raw-input path: in-kernel IN + ReLU + static-clip quantization
    h = _rand((1, 8, 128, 128), 3)
    w = _rand((3, 3, 128, 128), 4, 0.05)
    b = np.zeros(128, np.float32)
    q, ws = quantize_weight_per_channel(jnp.asarray(w))
    m = jnp.mean(jnp.asarray(h), (1, 2))
    v = jnp.maximum(jnp.mean(jnp.asarray(h) ** 2, (1, 2)) - m * m, 0.0)
    norm = jnp.stack([m, jax.lax.rsqrt(v + 1e-5)], axis=1)
    y, _ = conv3x3_reflect_s8(
        jnp.asarray(h), q, ws, jnp.asarray(b), norm=norm,
        out_dtype=jnp.float32, interpret=True,
    )
    a = jax.nn.relu(_inorm(jnp.asarray(h)))
    clip = 8.0
    a_q = jnp.clip(jnp.round(a * (127.0 / clip)), 0, 127)
    want = _ref_conv(
        a_q * (clip / 127.0),
        q.astype(jnp.float32) * ws[None, None, None, :],
        jnp.asarray(b),
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=2e-4)


def test_s8_chain_tracks_float_body():
    # end-to-end: the int8 chain must track the float body at int8-grade
    # fidelity on unit-scale data (the quantize.py quality contract)
    rng_x = _rand((1, 8, 128, 128), 7, 0.5)
    x = jnp.asarray(rng_x)
    qblocks, fblocks = [], []
    for i in range(3):
        w1 = jnp.asarray(_rand((3, 3, 128, 128), 10 + i, 0.05))
        b1 = jnp.asarray(_rand((128,), 20 + i, 0.01))
        w2 = jnp.asarray(_rand((3, 3, 128, 128), 30 + i, 0.05))
        b2 = jnp.asarray(_rand((128,), 40 + i, 0.01))
        q1, s1 = quantize_weight_per_channel(w1)
        q2, s2 = quantize_weight_per_channel(w2)
        qblocks.append((q1, s1, b1, q2, s2, b2))
        fblocks.append((w1, b1, w2, b2))

    got = fused_residual_chain_s8(x, qblocks, interpret=True)

    ref = x
    for w1, b1, w2, b2 in fblocks:
        h1 = _ref_conv(ref, w1, b1)
        a1 = jax.nn.relu(_inorm(h1))
        h2 = _ref_conv(a1, w2, b2)
        ref = ref + _inorm(h2)

    err = np.asarray(got) - np.asarray(ref)
    rng = float(np.max(np.abs(np.asarray(ref)))) or 1.0
    psnr = 20 * np.log10(rng / (np.sqrt(np.mean(err**2)) + 1e-12))
    assert psnr > 28.0, psnr
