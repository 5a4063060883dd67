"""Model zoo tests: shapes, param counts, and numerics parity of the
PyTorch-compatible primitives (conv / transposed conv / instance norm)
against torch functional ops."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from ctagan_tpu.models import (
    Generator,
    Discriminator,
    NLayerDiscriminator,
    MultiScaleDiscriminator,
    RegNet,
)
from ctagan_tpu.models.layers import ConvTorch, ConvTransposeTorch, instance_norm


def _nparams(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# primitive parity vs torch
# ---------------------------------------------------------------------------

def test_conv_matches_torch_conv2d():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    w = rng.standard_normal((5, 3, 4, 4)).astype(np.float32)
    b = rng.standard_normal((5,)).astype(np.float32)
    want = F.conv2d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=2, padding=1
    ).numpy()

    m = ConvTorch(5, 4, stride=2, padding=1)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = {"params": {"Conv_0": {
        "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)
    }}}
    got = np.asarray(
        m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_conv_transpose_matches_torch():
    """ConvTranspose2d(k=3, s=2, p=1, output_padding=1) — the generator's
    upsampler (CycleGan.py:50)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    w = rng.standard_normal((4, 6, 3, 3)).astype(np.float32)  # (in, out, kh, kw)
    b = rng.standard_normal((6,)).astype(np.float32)
    want = F.conv_transpose2d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b),
        stride=2, padding=1, output_padding=1,
    ).numpy()
    assert want.shape == (2, 6, 16, 16)

    m = ConvTransposeTorch(6)
    params = {"params": {"ConvTranspose_0": {
        # flax transpose_kernel=True layout: (kh, kw, out, in)
        "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)
    }}}
    got = np.asarray(
        m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_instance_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 5, 12, 12)).astype(np.float32)
    want = F.instance_norm(torch.tensor(x)).numpy()
    got = np.asarray(instance_norm(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-4)


# ---------------------------------------------------------------------------
# shapes / param counts (vs hand-computed reference totals)
# ---------------------------------------------------------------------------

def test_generator_shapes_and_params():
    g = Generator(1, 1)
    params = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    # exact torch param count of Model/CycleGan.py Generator(1,1)
    assert _nparams(params) == 11_365_633
    y = g.apply(params, jnp.zeros((2, 64, 64, 1)))
    assert y.shape == (2, 64, 64, 1)
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh head


def test_generator_multiple_resolutions():
    g = Generator(1, 1)
    params = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    for s in (64, 128):
        y = g.apply(params, jnp.zeros((1, s, s, 1)))
        assert y.shape == (1, s, s, 1)


def test_discriminator_scalar_logit_and_params():
    d = Discriminator(1)
    params = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    assert _nparams(params) == 2_762_689
    y = d.apply(params, jnp.zeros((3, 64, 64, 1)))
    assert y.shape == (3, 1)


def test_nlayer_discriminator_features():
    d = NLayerDiscriminator(1, get_interm_feat=True)
    params = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    assert _nparams(params) == 2_762_689
    feats = d.apply(params, jnp.zeros((1, 64, 64, 1)))
    assert len(feats) == 5  # n_layers + 2 stages
    assert feats[0].shape == (1, 32, 32, 64)
    assert feats[-1].shape[-1] == 1


def test_multiscale_discriminator_center_crop_pyramid():
    d = MultiScaleDiscriminator(1, num_d=2)
    params = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    outs = d.apply(params, jnp.zeros((1, 64, 64, 1)))
    assert len(outs) == 2
    # first result sees the full 64, second the center-cropped 32
    assert outs[0][0].shape == (1, 32, 32, 64)
    assert outs[1][0].shape == (1, 16, 16, 64)


def test_regnet_flow_shape_and_near_identity_init():
    r = RegNet()
    a = jnp.zeros((1, 128, 128, 1))
    params = r.init(jax.random.PRNGKey(0), a, a)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 1)).astype(np.float32))
    flow = r.apply(params, x, x)
    assert flow.shape == (1, 128, 128, 2)
    # init_to_identity: flow starts near zero (head init std 1e-5)
    assert float(jnp.max(jnp.abs(flow))) < 1e-2


def test_regnet_is_differentiable():
    r = RegNet()
    a = jnp.zeros((1, 128, 128, 1))
    params = r.init(jax.random.PRNGKey(0), a, a)

    def loss(p):
        return jnp.sum(r.apply(p, a + 0.1, a - 0.1) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))


def test_generator_pad_mode_zero():
    from ctagan_tpu.models import Generator

    g_ref = Generator(1, 1, n_residual_blocks=2)
    g_zero = Generator(1, 1, n_residual_blocks=2, pad_mode="zero")
    x = jnp.zeros((1, 64, 64, 1))
    p_ref = g_ref.init(jax.random.PRNGKey(0), x)
    p_zero = g_zero.init(jax.random.PRNGKey(0), x)
    # padding mode does not change the parameter tree: checkpoints carry over
    assert jax.tree.structure(p_ref) == jax.tree.structure(p_zero)
    out = g_zero.apply(p_zero, jnp.ones((2, 64, 64, 1)) * 0.5)
    assert out.shape == (2, 64, 64, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_pad_mode_config_validation():
    import pytest as _pytest

    from ctagan_tpu.utils.config import load_config

    with _pytest.raises(ValueError):
        load_config(dict(pad_mode="circular"))
    assert load_config(dict(pad_mode="zero")).pad_mode == "zero"


def test_max_pool_matches_reduce_window_and_torch():
    """The reshape-form max_pool (layers.py) must be forward-identical to
    lax.reduce_window / torch MaxPool2d(2), and its VJP must route the
    cotangent to the argmax (reference pool: trainer/reg.py:82)."""
    from flax import linen as nn

    from ctagan_tpu.models.layers import max_pool

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 8, 10, 3)).astype(np.float32)
    got = max_pool(jnp.asarray(x), 2)
    want_rw = nn.max_pool(jnp.asarray(x), (2, 2), strides=(2, 2))
    want_torch = (
        torch.nn.functional.max_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), 2
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want_rw))
    np.testing.assert_array_equal(np.asarray(got), want_torch)

    # gradient: with unique maxima, d sum(pool(x)) / dx is a 0/1 argmax mask
    g = jax.grad(lambda v: max_pool(v, 2).sum())(jnp.asarray(x))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2).requires_grad_(True)
    torch.nn.functional.max_pool2d(xt, 2).sum().backward()
    np.testing.assert_allclose(
        np.asarray(g), xt.grad.permute(0, 2, 3, 1).numpy(), atol=1e-6
    )

    # odd spatial size falls back to reduce_window (still exact)
    x2 = jnp.asarray(rng.standard_normal((1, 7, 7, 2)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(max_pool(x2, 2)),
        np.asarray(nn.max_pool(x2, (2, 2), strides=(2, 2))),
    )
