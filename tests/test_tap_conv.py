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


def _ref_conv(x, k, b, pad_mode):
    mode = "constant" if pad_mode == "zero" else "reflect"
    kh, kw = k.shape[:2]
    xp = jnp.pad(
        x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)), mode=mode
    )
    y = jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + b


@pytest.mark.parametrize("pad_mode", ["reflect", "zero"])
def test_head_taps_3x3_matches_direct(pad_mode):
    from ctagan_tpu.ops.tap_conv import conv_head_taps

    x = _rand((2, 18, 22, 2))
    k = _rand((3, 3, 2, 32), 11, 0.1)
    b = _rand((32,), 12)
    got = conv_head_taps(x, k, b, pad_mode=pad_mode)
    np.testing.assert_allclose(got, _ref_conv(x, k, b, pad_mode), atol=2e-5)


@pytest.mark.parametrize("pad_mode", ["reflect", "zero"])
def test_tail_taps_3x3_matches_direct(pad_mode):
    from ctagan_tpu.ops.tap_conv import conv_tail_taps

    x = _rand((2, 18, 22, 32))
    k = _rand((3, 3, 32, 2), 13, 0.1)
    b = _rand((2,), 14)
    got = conv_tail_taps(x, k, b, pad_mode=pad_mode)
    np.testing.assert_allclose(got, _ref_conv(x, k, b, pad_mode), atol=1e-4)


def test_regnet_tap_convs_parity():
    """RegNet tap_convs: identical param tree + init values, matching
    forward and gradients vs the direct-conv path."""
    from ctagan_tpu.models.reg import RegNet

    r_ref = RegNet(1, 1, tap_convs=False)
    r_tap = RegNet(1, 1, tap_convs=True)
    a = _rand((1, 128, 128, 1), 21)
    b = _rand((1, 128, 128, 1), 22)
    params = r_ref.init(jax.random.PRNGKey(0), a, b)
    tap_params = r_tap.init(jax.random.PRNGKey(0), a, b)
    assert jax.tree_util.tree_structure(tap_params) == (
        jax.tree_util.tree_structure(params)
    )
    for pa, pb in zip(
        jax.tree_util.tree_leaves(tap_params),
        jax.tree_util.tree_leaves(params),
    ):
        np.testing.assert_array_equal(pa, pb)
    np.testing.assert_allclose(
        r_tap.apply(params, a, b), r_ref.apply(params, a, b), atol=2e-5
    )
    # flow head is near-zero-init: nudge just it so grads see a real flow
    # (perturbing the whole tree explodes activations through the 7 levels
    # and drowns the comparison in f32 ordering noise)
    out_k = params["params"]["output"]["ConvTorch_0"]["Conv_0"]["kernel"]
    params["params"]["output"]["ConvTorch_0"]["Conv_0"]["kernel"] = (
        out_k + 0.01 * _rand(out_k.shape, 31)
    )
    g_tap = jax.grad(
        lambda p: jnp.sum(jnp.square(r_tap.apply(p, a, b)))
    )(params)
    g_ref = jax.grad(
        lambda p: jnp.sum(jnp.square(r_ref.apply(p, a, b)))
    )(params)
    leaves_t = jax.tree_util.tree_leaves(g_tap)
    leaves_r = jax.tree_util.tree_leaves(g_ref)
    global_scale = max(float(np.abs(np.asarray(g)).max()) for g in leaves_r)
    for ga, gb in zip(leaves_t, leaves_r):
        ga, gb = np.asarray(ga), np.asarray(gb)
        # Per-leaf scale-normalized comparison: resblock conv biases have a
        # TRUE gradient of zero (InstanceNorm cancels any bias shift), so
        # their leaves hold only f32 cancellation noise (~eps * upstream
        # magnitude) — floor the scale at 1e-6 of the global grad scale;
        # ReLU-mask flips from ordering noise cost ~1% on interior kernels.
        # 2% of the leaf's max grad is still a real check — the tap-routed
        # leaves themselves (down_1, output) agree to <=1e-3.
        scale = max(np.abs(gb).max(), 1e-6 * global_scale)
        assert np.abs(ga - gb).max() <= 2e-2 * scale


def test_regnet_im2col_levels_parity():
    """im2col-routed top levels: identical param tree/init, forward and
    gradient parity vs the direct path (same scale-normalized check)."""
    from ctagan_tpu.models.reg import RegNet

    r_ref = RegNet(1, 1, tap_convs=False)
    r_im = RegNet(1, 1, tap_convs=False, im2col_levels=2)
    a = _rand((1, 128, 128, 1), 41)
    b = _rand((1, 128, 128, 1), 42)
    params = r_ref.init(jax.random.PRNGKey(0), a, b)
    im_params = r_im.init(jax.random.PRNGKey(0), a, b)
    assert jax.tree_util.tree_structure(im_params) == (
        jax.tree_util.tree_structure(params)
    )
    for pa, pb in zip(
        jax.tree_util.tree_leaves(im_params),
        jax.tree_util.tree_leaves(params),
    ):
        np.testing.assert_array_equal(pa, pb)
    np.testing.assert_allclose(
        r_im.apply(params, a, b), r_ref.apply(params, a, b), atol=3e-5
    )
    out_k = params["params"]["output"]["ConvTorch_0"]["Conv_0"]["kernel"]
    params["params"]["output"]["ConvTorch_0"]["Conv_0"]["kernel"] = (
        out_k + 0.01 * _rand(out_k.shape, 43)
    )
    g_im = jax.grad(
        lambda p: jnp.sum(jnp.square(r_im.apply(p, a, b)))
    )(params)
    g_ref = jax.grad(
        lambda p: jnp.sum(jnp.square(r_ref.apply(p, a, b)))
    )(params)
    leaves_t = jax.tree_util.tree_leaves(g_im)
    leaves_r = jax.tree_util.tree_leaves(g_ref)
    global_scale = max(float(np.abs(np.asarray(g)).max()) for g in leaves_r)
    for ga, gb in zip(leaves_t, leaves_r):
        ga, gb = np.asarray(ga), np.asarray(gb)
        scale = max(np.abs(gb).max(), 1e-6 * global_scale)
        assert np.abs(ga - gb).max() <= 2e-2 * scale


def test_conv3d_head_taps_matches_direct():
    from ctagan_tpu.ops.tap_conv import conv3d_head_taps

    x = _rand((1, 4, 12, 12, 1), 51)
    k = _rand((3, 7, 7, 1, 16), 52, 0.05)
    b = _rand((16,), 53)
    got = conv3d_head_taps(x, k, b)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1), (3, 3), (3, 3)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + b
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_generator3d_tap_head_parity():
    from ctagan_tpu.models.volumetric import Generator3D

    g_ref = Generator3D(n_residual_blocks=1, base_features=8,
                        tap_head=False, tap_tail=False)
    g_tap = Generator3D(n_residual_blocks=1, base_features=8,
                        tap_head=True, tap_tail=False)
    x = _rand((1, 4, 16, 16, 1), 54)
    params = g_ref.init(jax.random.PRNGKey(0), x)
    tap_params = g_tap.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(tap_params) == (
        jax.tree_util.tree_structure(params)
    )
    for pa, pb in zip(
        jax.tree_util.tree_leaves(tap_params),
        jax.tree_util.tree_leaves(params),
    ):
        np.testing.assert_array_equal(pa, pb)
    np.testing.assert_allclose(
        g_tap.apply(params, x), g_ref.apply(params, x), atol=2e-5
    )
