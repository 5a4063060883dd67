"""Parity: fused stride-2 conv+stats (ops/fused_down.py) vs lax conv."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctagan_tpu.ops.fused_down import conv3x3_s2_zero_stats


def _rand(shape, seed=0, scale=1.0):
    return jnp.asarray(
        (np.random.default_rng(seed).standard_normal(shape) * scale
         ).astype(np.float32)
    )


def _ref(x, w, b, stride=2):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b


@pytest.mark.parametrize("c,co,w_", [(64, 128, 256), (128, 256, 256)])
def test_s2_matches_lax(c, co, w_):
    x = _rand((2, 16, w_, c))
    w = _rand((3, 3, c, co), 1, 0.05)
    b = _rand((co,), 2)
    out, stats = conv3x3_s2_zero_stats(x, w, b)
    ref = _ref(x, w, b)
    np.testing.assert_allclose(out, ref, atol=2e-5)
    np.testing.assert_allclose(stats[:, 0], jnp.sum(ref, axis=(1, 2)),
                               rtol=1e-3)


def test_s2_prenorm_relu():
    x = _rand((1, 8, 256, 64), 3)
    w = _rand((3, 3, 64, 128), 4, 0.05)
    b = _rand((128,), 5)
    mean = jnp.mean(x, axis=(1, 2))
    rstd = 1.0 / jnp.std(x, axis=(1, 2))
    norm = jnp.stack([mean, rstd], axis=1)
    xn = jnp.maximum(
        (x - mean[:, None, None, :]) * rstd[:, None, None, :], 0.0
    )
    out, _ = conv3x3_s2_zero_stats(x, w, b, norm=norm, relu=True)
    np.testing.assert_allclose(out, _ref(xn, w, b), atol=2e-5)
