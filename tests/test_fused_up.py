"""Fused ResUNet up stage: phase-decomposition exactness + param-tree parity."""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ctagan_tpu.models.reg import RegNet
from ctagan_tpu.ops.fused_up import fused_up_concat_conv
from ctagan_tpu.ops.resize import interpolate_bilinear

_DN = ("NHWC", "HWIO", "NHWC")


def _reference_chain(x, skip, kernel, bias):
    up = interpolate_bilinear(x, (2 * x.shape[1], 2 * x.shape[2]))
    cat = jnp.concatenate([up, skip], axis=-1)
    y = lax.conv_general_dilated(
        cat, kernel, (1, 1), [(1, 1), (1, 1)], dimension_numbers=_DN
    )
    return y + bias


def test_fused_up_interior_exact():
    rng = np.random.default_rng(0)
    n, h, w, cu, cs, co = 2, 16, 16, 5, 7, 6
    x = jnp.asarray(rng.normal(size=(n, h, w, cu)).astype(np.float32))
    skip = jnp.asarray(rng.normal(size=(n, 2 * h, 2 * w, cs)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, cu + cs, co)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
    ref = np.asarray(_reference_chain(x, skip, k, b))
    fused = np.asarray(fused_up_concat_conv(x, skip, k, b))
    # exact away from the 1-px frame (documented border-semantics difference)
    np.testing.assert_allclose(
        fused[:, 2:-2, 2:-2, :], ref[:, 2:-2, 2:-2, :], atol=2e-5, rtol=1e-5
    )


def test_fused_regnet_param_tree_identical():
    # same module names + same init fns => byte-identical param trees, so
    # fused and unfused checkpoints interchange
    xa = jnp.zeros((1, 128, 128, 1))
    xb = jnp.zeros((1, 128, 128, 1))
    p0 = RegNet(1, 1).init(jax.random.PRNGKey(3), xa, xb)
    p1 = RegNet(1, 1, fuse_up=True).init(jax.random.PRNGKey(3), xa, xb)
    assert jax.tree.structure(p0) == jax.tree.structure(p1)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_regnet_runs_and_grads():
    xa = jax.random.uniform(jax.random.PRNGKey(0), (1, 128, 128, 1), minval=-1)
    xb = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 1), minval=-1)
    r = RegNet(1, 1, fuse_up=True)
    params = r.init(jax.random.PRNGKey(2), xa, xb)
    flow = r.apply(params, xa, xb)
    assert flow.shape == (1, 128, 128, 2)

    def loss(p):
        f = r.apply(p, xa, xb)
        return jnp.mean(f * f)

    grads = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(g)) for g in jax.tree.leaves(grads))


def test_fused_regnet_keeps_near_identity_init():
    # the deep (tiny) pyramid levels are all within 1 px of a border, so
    # fused and unfused flows differ at the near-identity noise scale by
    # design (documented border semantics); what must hold is the
    # init_to_identity property itself and the same magnitude scale
    xa = jax.random.uniform(jax.random.PRNGKey(0), (1, 128, 128, 1), minval=-1)
    xb = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 1), minval=-1)
    params = RegNet(1, 1).init(jax.random.PRNGKey(2), xa, xb)
    f0 = np.asarray(RegNet(1, 1).apply(params, xa, xb))
    f1 = np.asarray(RegNet(1, 1, fuse_up=True).apply(params, xa, xb))
    assert np.max(np.abs(f1)) < 1e-2
    assert np.max(np.abs(f1 - f0)) < np.max(np.abs(f0))
