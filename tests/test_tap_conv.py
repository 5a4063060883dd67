"""Parity: tap-decomposed 7×7 convs (ops/tap_conv.py) vs lax direct conv,
and the Generator tap_heads routing (param tree unchanged)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctagan_tpu.models.generator import Generator
from ctagan_tpu.ops.tap_conv import conv7_head_taps, conv7_tail_taps


def _rand(shape, seed=0, scale=1.0):
    return jnp.asarray(
        (np.random.default_rng(seed).standard_normal(shape) * scale).astype(
            np.float32
        )
    )


def _ref_conv7(x, k, b, pad_mode):
    mode = "constant" if pad_mode == "zero" else "reflect"
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode=mode)
    y = jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + b


@pytest.mark.parametrize("pad_mode", ["reflect", "zero"])
def test_head_taps_matches_direct(pad_mode):
    x = _rand((2, 20, 24, 1))
    k = _rand((7, 7, 1, 32), 1, 0.1)
    b = _rand((32,), 2)
    got = conv7_head_taps(x, k, b, pad_mode=pad_mode)
    np.testing.assert_allclose(
        got, _ref_conv7(x, k, b, pad_mode), atol=2e-5
    )


@pytest.mark.parametrize("pad_mode", ["reflect", "zero"])
def test_tail_taps_matches_direct(pad_mode):
    x = _rand((2, 20, 24, 32))
    k = _rand((7, 7, 32, 1), 3, 0.1)
    b = _rand((1,), 4)
    got = conv7_tail_taps(x, k, b, pad_mode=pad_mode)
    np.testing.assert_allclose(
        got, _ref_conv7(x, k, b, pad_mode), atol=1e-4
    )


def test_taps_differentiable():
    x = _rand((1, 12, 12, 8))
    k = _rand((7, 7, 8, 1), 5, 0.1)
    b = jnp.zeros((1,))
    g_tap = jax.grad(lambda xx: jnp.sum(conv7_tail_taps(xx, k, b)))(x)
    g_ref = jax.grad(lambda xx: jnp.sum(_ref_conv7(xx, k, b, "reflect")))(x)
    np.testing.assert_allclose(g_tap, g_ref, atol=1e-4)


@pytest.mark.parametrize("pad_mode", ["reflect", "zero"])
def test_generator_tap_heads_parity(pad_mode):
    g_ref = Generator(1, 1, n_residual_blocks=1, base_features=16,
                      pad_mode=pad_mode, tap_heads=False)
    g_tap = Generator(1, 1, n_residual_blocks=1, base_features=16,
                      pad_mode=pad_mode, tap_heads=True)
    x = _rand((1, 32, 32, 1))
    params = g_ref.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(
        g_tap.init(jax.random.PRNGKey(0), x)
    ) == jax.tree_util.tree_structure(params)
    # same init values too (same param names -> same RNG folding)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_tap.init(jax.random.PRNGKey(0), x)),
        jax.tree_util.tree_leaves(params),
    ):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(
        g_tap.apply(params, x), g_ref.apply(params, x), atol=2e-5
    )


def test_conv3d_tail_taps_matches_direct():
    from ctagan_tpu.ops.tap_conv import conv3d_tail_taps

    x = _rand((1, 4, 12, 12, 8))
    k = _rand((3, 7, 7, 8, 1), 7, 0.05)
    b = _rand((1,), 8)
    got = conv3d_tail_taps(x, k, b)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1), (3, 3), (3, 3)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + b
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_generator3d_tap_tail_parity():
    from ctagan_tpu.models.volumetric import Generator3D

    g_ref = Generator3D(n_residual_blocks=1, base_features=8,
                        tap_tail=False)
    g_tap = Generator3D(n_residual_blocks=1, base_features=8,
                        tap_tail=True)
    x = _rand((1, 4, 16, 16, 1))
    params = g_ref.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(
        g_tap.init(jax.random.PRNGKey(0), x)
    ) == jax.tree_util.tree_structure(params)
    np.testing.assert_allclose(
        g_tap.apply(params, x), g_ref.apply(params, x), atol=2e-5
    )
