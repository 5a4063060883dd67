"""Gradient parity of the fused-body custom VJP vs the XLA autodiff path.

All Pallas kernels run in interpret mode on the CPU test platform (compiled
on real TPU); the oracle is jax.vjp of an op-by-op XLA body with identical
forward math (reflect-pad conv + one-pass clamped-variance InstanceNorm —
models/layers.py semantics, Model/CycleGan.py:6-21)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctagan_tpu.ops.fused_resblock_grad import (
    conv3x3_input_grad,
    conv3x3_weight_grad,
    fused_chain_vjp_make,
)

EPS = 1e-5


def _rand(shape, seed=0, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
        * scale
    )


def _conv(x, w, b):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b


def _inorm(h):
    m = jnp.mean(h, (1, 2), keepdims=True)
    v = jnp.maximum(jnp.mean(h * h, (1, 2), keepdims=True) - m * m, 0.0)
    return (h - m) * jax.lax.rsqrt(v + EPS)


def test_input_grad_matches_vjp():
    x = _rand((2, 8, 128, 128), 0)
    w = _rand((3, 3, 128, 128), 1, 0.05)
    b = jnp.zeros((128,))
    g = _rand((2, 8, 128, 128), 2)
    _, vjp = jax.vjp(lambda x_: _conv(x_, w, b), x)
    (want,) = vjp(g)
    got = conv3x3_input_grad(g, w, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_input_grad_tall_image():
    # multiple row tiles (H=32 -> T=4 with R=8): slab-boundary halos of the
    # correlation kernel + edge folds
    x = _rand((1, 32, 128, 128), 3)
    w = _rand((3, 3, 128, 128), 4, 0.05)
    g = _rand((1, 32, 128, 128), 5)
    _, vjp = jax.vjp(lambda x_: _conv(x_, w, jnp.zeros((128,))), x)
    (want,) = vjp(g)
    got = conv3x3_input_grad(g, w, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_weight_grad_matches_vjp():
    x = _rand((2, 16, 128, 128), 6)
    w = _rand((3, 3, 128, 128), 7, 0.05)
    g = _rand((2, 16, 128, 128), 8)
    _, vjp = jax.vjp(lambda w_: _conv(x, w_, jnp.zeros((128,))), w)
    (want,) = vjp(g)
    got = conv3x3_weight_grad(x, g, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-3, rtol=1e-4
    )


def test_weight_grad_with_streaming_norm_relu():
    # conv2's weight grad: input activation recomputed in-kernel from the
    # raw conv output + (mean, rstd) — vs materializing relu(IN(h)) in XLA
    h = _rand((1, 16, 128, 128), 9)
    w = _rand((3, 3, 128, 128), 10, 0.05)
    g = _rand((1, 16, 128, 128), 11)
    m = jnp.mean(h, (1, 2))
    v = jnp.maximum(jnp.mean(h * h, (1, 2)) - m * m, 0.0)
    norm = jnp.stack([m, jax.lax.rsqrt(v + EPS)], axis=1)
    a = jax.nn.relu(_inorm(h))
    _, vjp = jax.vjp(lambda w_: _conv(a, w_, jnp.zeros((128,))), w)
    (want,) = vjp(g)
    got = conv3x3_weight_grad(h, g, norm=norm, relu=True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-3, rtol=1e-4
    )


def _xla_chain(x, block_params):
    for (k1, b1, k2, b2) in block_params:
        h1 = _conv(x, k1, b1)
        a1 = jax.nn.relu(_inorm(h1))
        h2 = _conv(a1, k2, b2)
        x = x + _inorm(h2)
    return x


def test_generator_fused_body_grad_parity():
    """Generator(fused_body_grad=True): forward AND gradients match the
    XLA-body generator (body 4x128x128 at reduced scale)."""
    from ctagan_tpu.models import Generator

    g_ref = Generator(1, 1, n_residual_blocks=2, base_features=32)
    g_new = Generator(
        1, 1, n_residual_blocks=2, base_features=32, fused_body_grad=True
    )
    x = _rand((1, 16, 512, 1), 80)
    params = g_ref.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(
        g_new.init(jax.random.PRNGKey(0), x)
    ) == jax.tree_util.tree_structure(params)
    np.testing.assert_allclose(
        np.asarray(g_new.apply(params, x)),
        np.asarray(g_ref.apply(params, x)),
        atol=1e-4,
    )

    def loss(model):
        def fn(p, x_):
            return jnp.mean(jnp.abs(model.apply(p, x_)))

        return fn

    gp_ref = jax.grad(loss(g_ref))(params, x)
    gp_new = jax.grad(loss(g_new))(params, x)
    for a, b in zip(jax.tree.leaves(gp_ref), jax.tree.leaves(gp_new)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-3, rtol=2e-3
        )


@pytest.mark.parametrize("n_blocks", [1, 3])
def test_chain_vjp_matches_xla(n_blocks):
    x = _rand((1, 8, 128, 128), 20)
    params = [
        (
            _rand((3, 3, 128, 128), 30 + i, 0.05),
            _rand((128,), 40 + i, 0.01),
            _rand((3, 3, 128, 128), 50 + i, 0.05),
            _rand((128,), 60 + i, 0.01),
        )
        for i in range(n_blocks)
    ]
    chain = fused_chain_vjp_make(eps=EPS, interpret=True)
    out = chain(x, params)
    want_out = _xla_chain(x, params)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want_out), atol=2e-4
    )

    cot = _rand(out.shape, 70)

    def loss_new(x_, p_):
        return jnp.sum(chain(x_, p_) * cot)

    def loss_ref(x_, p_):
        return jnp.sum(_xla_chain(x_, p_) * cot)

    gx_new, gp_new = jax.grad(loss_new, argnums=(0, 1))(x, params)
    gx_ref, gp_ref = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(
        np.asarray(gx_new), np.asarray(gx_ref), atol=3e-3
    )
    for t_new, t_ref in zip(jax.tree.leaves(gp_new), jax.tree.leaves(gp_ref)):
        np.testing.assert_allclose(
            np.asarray(t_new), np.asarray(t_ref), atol=5e-3, rtol=1e-3
        )
