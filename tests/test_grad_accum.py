"""Gradient accumulation (config ``grad_accum``): K-microbatch steps must
equal the full-batch step.

Every loss term in the P2p and Reg/HD-stage-1 steps is an elementwise mean,
so the mean of K equal-microbatch grads equals the full-batch grad up to
float summation order — ``steps._grad_accum_scan`` is exact there, and
these tests lock it. Stage 2's mask-normalized SR_loss2 weights
microbatches equally (the standard convention); locked as runs-and-finite.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctagan_tpu.models import Discriminator, Generator, RegNet
from ctagan_tpu.train import steps


def _assert_state_close(a, b, atol):
    for x, y in zip(
        jax.tree.leaves(jax.device_get(a)), jax.tree.leaves(jax.device_get(b))
    ):
        if hasattr(x, "dtype") and np.issubdtype(np.asarray(x).dtype, np.floating):
            np.testing.assert_allclose(x, y, atol=atol)


def test_p2p_grad_accum_matches_full_batch():
    g = Generator(1, 1, n_residual_blocks=2)
    d = Discriminator(2)
    state, tx = steps.init_p2p_state(g, d, jax.random.PRNGKey(0), 64)
    base = {"P2P_lamda": 10.0, "Adv_lamda": 1.0, "noise_level": 1}
    rng = np.random.default_rng(0)
    batch = {
        k: jnp.asarray(rng.uniform(-1, 1, (8, 64, 64, 1)).astype(np.float32))
        for k in ("A", "B")
    }
    lr = jnp.float32(1e-4)
    ref_state, ref_losses = jax.jit(partial(steps.p2p_train_step, g, d, tx, base))(
        state, batch, lr
    )
    acc_cfg = dict(base, grad_accum=4)
    acc_state, acc_losses = jax.jit(
        partial(steps.p2p_train_step, g, d, tx, acc_cfg)
    )(state, batch, lr)
    for k in ref_losses:
        np.testing.assert_allclose(
            float(acc_losses[k]), float(ref_losses[k]), rtol=2e-5, atol=1e-6
        )
    # Adam sign-flip bound (see test_parallel_tensor.py): a near-zero grad
    # element may flip sign under the changed summation order, moving the
    # param by up to 2*lr on the first step
    _assert_state_close(acc_state.g_params, ref_state.g_params, atol=2.2e-4)
    _assert_state_close(acc_state.d_params, ref_state.d_params, atol=2.2e-4)


def test_hd1_grad_accum_matches_full_batch():
    g = Generator(1, 1, n_residual_blocks=2)
    r = RegNet(1, 1)
    d = Discriminator(1)
    state, tx = steps.init_reg_state(g, r, d, jax.random.PRNGKey(1), 128)
    base = {
        "Adv_lamda1": 1.0, "Corr_lamda1": 20.0, "Corr_lamda2": 2.0,
        "Smooth_lamda": 10.0, "Adv_lamda": 1.0, "Corr_lamda": 20.0,
        "noise_level": 1,
    }
    rng = np.random.default_rng(2)
    batch = {
        k: jnp.asarray(rng.uniform(-1, 1, (4, 128, 128, 1)).astype(np.float32))
        for k in ("A2", "B1", "B2")
    }
    lr = jnp.float32(1e-4)
    step = lambda cfg: jax.jit(partial(
        steps.reg_train_step, g, r, d, tx, cfg, dual_window_mode=True
    ))
    ref_state, ref_losses = step(base)(state, batch, lr, lr_d=jnp.float32(1e-4))
    acc_state, acc_losses = step(dict(base, grad_accum=2))(
        state, batch, lr, lr_d=jnp.float32(1e-4)
    )
    for k in ref_losses:
        np.testing.assert_allclose(
            float(acc_losses[k]), float(ref_losses[k]), rtol=3e-5, atol=1e-5
        )
    _assert_state_close(acc_state.g_params, ref_state.g_params, atol=2.2e-4)
    _assert_state_close(acc_state.r_params, ref_state.r_params, atol=2.2e-4)
    _assert_state_close(acc_state.d_params, ref_state.d_params, atol=2.2e-4)


def test_stage2_grad_accum_runs_finite():
    from ctagan_tpu.models import MultiScaleDiscriminator

    g = Generator(1, 1, n_residual_blocks=2)
    r = RegNet(1, 1)
    d = MultiScaleDiscriminator(1)
    state, tx = steps.init_reg_state(g, r, d, jax.random.PRNGKey(3), 128)
    cfg = {
        "Adv_lamda1": 1.0, "Corr_lamda1": 20.0, "Corr_lamda2": 2.0,
        "Smooth_lamda": 10.0, "Adv_lamda": 1.0, "Corr_lamda": 20.0,
        "FM_lamda": 0.0, "noise_level": 1, "grad_accum": 2,
    }
    rng = np.random.default_rng(4)
    batch = {
        k: jnp.asarray(rng.uniform(-1, 1, (4, 128, 128, 1)).astype(np.float32))
        for k in ("A2", "B1", "B2")
    }
    new_state, losses = jax.jit(partial(
        steps.reg_train_step, g, r, d, tx, cfg,
        dual_window_mode=True, stage2=True,
    ))(state, batch, jnp.float32(1e-4), lr_d=jnp.float32(1e-4))
    assert all(np.isfinite(float(v)) for v in losses.values()), losses
    assert "SR_loss2" in losses


def test_grad_accum_must_divide_batch():
    g = Generator(1, 1, n_residual_blocks=1)
    d = Discriminator(2)
    state, tx = steps.init_p2p_state(g, d, jax.random.PRNGKey(0), 64)
    cfg = {"P2P_lamda": 10.0, "Adv_lamda": 1.0, "noise_level": 1,
           "grad_accum": 3}
    batch = {
        k: jnp.zeros((4, 64, 64, 1), jnp.float32) for k in ("A", "B")
    }
    with pytest.raises(AssertionError, match="grad_accum"):
        jax.jit(partial(steps.p2p_train_step, g, d, tx, cfg))(
            state, batch, jnp.float32(1e-4)
        )


def test_cyc_grad_accum_matches_full_batch():
    from ctagan_tpu.models import Discriminator

    g = Generator(1, 1, n_residual_blocks=2)
    d = Discriminator(1)
    state, tx = steps.init_cyc_state(
        g, d, jax.random.PRNGKey(0), 64, buffer_size=8
    )
    base = {"Adv_lamda": 1.0, "Cyc_lamda": 10.0, "noise_level": 1}
    rng = np.random.default_rng(2)
    batch = {
        k: jnp.asarray(rng.uniform(-1, 1, (4, 64, 64, 1)).astype(np.float32))
        for k in ("A", "B")
    }
    lr = jnp.float32(1e-4)
    ref_state, ref_losses = jax.jit(
        partial(steps.cyc_train_step, g, d, tx, base)
    )(state, batch, lr)
    acc_state, acc_losses = jax.jit(
        partial(steps.cyc_train_step, g, d, tx, dict(base, grad_accum=2))
    )(state, batch, lr)
    for k in ref_losses:
        np.testing.assert_allclose(
            float(acc_losses[k]), float(ref_losses[k]), rtol=2e-5, atol=1e-6
        )
    _assert_state_close(acc_state.g_a2b_params, ref_state.g_a2b_params, atol=2.2e-4)
    _assert_state_close(acc_state.d_a_params, ref_state.d_a_params, atol=2.2e-4)
    # replay buffers see the SAME pre-update fakes in both paths
    _assert_state_close(
        acc_state.fake_a_buffer, ref_state.fake_a_buffer, atol=1e-5
    )


def test_p3d_grad_accum_matches_full_batch():
    from ctagan_tpu.models.volumetric import Discriminator3D, Generator3D

    g = Generator3D(1, 1, n_residual_blocks=2)
    d = Discriminator3D(2)
    state, tx = steps.init_p3d_state(g, d, jax.random.PRNGKey(0), 8, 32)
    base = {"P2P_lamda": 10.0, "Adv_lamda": 1.0}
    rng = np.random.default_rng(3)
    batch = {
        k: jnp.asarray(
            rng.uniform(-1, 1, (4, 8, 32, 32, 1)).astype(np.float32)
        )
        for k in ("A", "B")
    }
    lr = jnp.float32(1e-4)
    ref_state, ref_losses = jax.jit(
        partial(steps.p3d_train_step, g, d, tx, base)
    )(state, batch, lr)
    acc_state, acc_losses = jax.jit(
        partial(steps.p3d_train_step, g, d, tx, dict(base, grad_accum=2))
    )(state, batch, lr)
    for k in ref_losses:
        np.testing.assert_allclose(
            float(acc_losses[k]), float(ref_losses[k]), rtol=2e-5, atol=1e-6
        )
    _assert_state_close(acc_state.g_params, ref_state.g_params, atol=2.2e-4)
    _assert_state_close(acc_state.d_params, ref_state.d_params, atol=2.2e-4)
