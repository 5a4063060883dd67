"""conv_same_borderfix == conv(reflect_pad(x)) up to reduction order.

Locks the exactness claim that lets the generator drop the materialized
reflect-padded copies (ops/border_conv.py; reference pad semantics:
Model/CycleGan.py:26-28,33-38,48-50). Exact in real arithmetic; XLA may
associate the fused-padding conv's window sum differently than the
padded-copy conv (≤ ~2 ulp of the k²·C-term accumulation), so tolerances
are tight-but-nonzero.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctagan_tpu.models.layers import reflect_pad
from ctagan_tpu.ops.border_conv import _conv, conv_same_borderfix


def _ref(x, kernel, bias=None, dtype=None):
    if dtype is None:
        dtype = jnp.result_type(
            x, kernel, *(() if bias is None else (bias,))
        )
    xp = reflect_pad(x.astype(dtype), kernel.shape[0] // 2)
    y = _conv(xp, kernel.astype(dtype), 0, 0)
    return y if bias is None else y + bias.astype(dtype)


@pytest.mark.parametrize("k", [3, 7])
@pytest.mark.parametrize("hw", [(16, 16), (17, 23), (8, 32)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_bit_exact(k, hw, dtype):
    rng = np.random.default_rng(k * 100 + hw[0])
    h, w = hw
    x = jnp.asarray(rng.normal(size=(2, h, w, 5)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(k, k, 5, 4)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    got = conv_same_borderfix(x, kern, b, dtype=dtype)
    want = _ref(x, kern, b, dtype=dtype)
    assert got.dtype == want.dtype
    g = np.asarray(got, np.float32)
    v = np.asarray(want, np.float32)
    if dtype == jnp.float32:
        np.testing.assert_allclose(g, v, rtol=1e-3, atol=1e-4)
    else:
        np.testing.assert_allclose(g, v, rtol=2e-2, atol=1e-1)


def test_bit_exact_no_bias_promoted_dtype():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 12, 12, 3)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(3, 3, 3, 2)).astype(np.float32))
    got = conv_same_borderfix(x.astype(jnp.bfloat16), kern)
    want = _ref(x.astype(jnp.bfloat16), kern)
    assert got.dtype == jnp.float32  # promote: bf16 input, f32 kernel
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-4)


def test_degenerate_small_image_falls_back():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(7, 7, 2, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(conv_same_borderfix(x, kern, b)),
        np.asarray(_ref(x, kern, b)), rtol=1e-5, atol=1e-6,
    )


def test_gradients_match():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 10, 10, 3)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(3, 3, 3, 2)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2,)).astype(np.float32))

    def loss(fn, k_, b_):
        return jnp.sum(jnp.sin(fn(x, k_, b_)))

    gk1, gb1 = jax.grad(lambda k_, b_: loss(conv_same_borderfix, k_, b_),
                        argnums=(0, 1))(kern, b)
    gk2, gb2 = jax.grad(lambda k_, b_: loss(_ref, k_, b_),
                        argnums=(0, 1))(kern, b)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb2),
                               rtol=1e-4, atol=1e-5)


def test_generator_border_fix_matches_default():
    """Generator(border_fix=True) == Generator(border_fix=False): same param
    tree, same output up to conv reduction order — locks the TPU-default
    routing (models/generator.py conv7 + ResidualBlock border_fix)."""
    from ctagan_tpu.models import Generator

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    g0 = Generator(1, 1, n_residual_blocks=2, border_fix=False,
                   tap_heads=False)
    g1 = Generator(1, 1, n_residual_blocks=2, border_fix=True,
                   tap_heads=False)
    p = g0.init(jax.random.PRNGKey(0), x)
    p1 = g1.init(jax.random.PRNGKey(0), x)
    t0 = jax.tree_util.tree_structure(p)
    t1 = jax.tree_util.tree_structure(p1)
    assert t0 == t1  # checkpoints interchange
    y0 = g0.apply(p, x)
    y1 = g1.apply(p, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-4, atol=1e-5)
