"""Spatial-parallel training (parallel/spatial.py): step equality.

The H-sharded (activation-parallel) P2p train step must reproduce the
single-device step to float tolerance — GSPMD derives the conv halo
exchanges and the InstanceNorm/loss all-reduces from the batch placement
alone. Runs on the 8-virtual-device CPU mesh (conftest)."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctagan_tpu.models import Discriminator, Generator
from ctagan_tpu.parallel.spatial import (
    make_dp_sp_mesh,
    make_sp_mesh,
    shard_batch_sp,
    shard_p2p_state_sp,
    sp_train_step_fn,
)
from ctagan_tpu.train import steps


@pytest.fixture(scope="module")
def p2p_state():
    g = Generator(1, 1, n_residual_blocks=2)
    d = Discriminator(2)
    state, tx = steps.init_p2p_state(g, d, jax.random.PRNGKey(0), 64, ema=True)
    return g, d, state, tx


def _reference_step(g, d, tx, cfg, state, batch_np, lr):
    return jax.jit(partial(steps.p2p_train_step, g, d, tx, cfg))(
        state, {k: jnp.asarray(v) for k, v in batch_np.items()}, lr
    )


def _assert_matches(new_state, losses, ref_state, ref_losses):
    for k in ref_losses:
        np.testing.assert_allclose(
            float(losses[k]), float(ref_losses[k]), rtol=2e-5, atol=1e-5
        )
    # same sign-flip bound as the TP/FSDP step tests: Adam's first step moves
    # a near-zero-grad element by up to 2*lr under a changed reduction order
    for a, b in zip(
        jax.tree.leaves(jax.device_get(new_state.g_params)),
        jax.tree.leaves(jax.device_get(ref_state.g_params)),
    ):
        np.testing.assert_allclose(a, b, atol=2.2e-4)
    for a, b in zip(
        jax.tree.leaves(jax.device_get(new_state.d_params)),
        jax.tree.leaves(jax.device_get(ref_state.d_params)),
    ):
        np.testing.assert_allclose(a, b, atol=2.2e-4)


def test_sp_train_step_matches_unsharded(p2p_state):
    """ONE P2p training step with every batch H-sharded 8 ways == the
    single-device step (batch N=2 so nothing hides in a batch split)."""
    g, d, state, tx = p2p_state
    cfg = {"P2P_lamda": 10.0, "Adv_lamda": 1.0, "noise_level": 1}
    rng = np.random.default_rng(7)
    batch_np = {
        k: rng.uniform(-1, 1, (2, 64, 64, 1)).astype(np.float32)
        for k in ("A", "B")
    }
    lr = jnp.float32(1e-4)
    ref_state, ref_losses = _reference_step(g, d, tx, cfg, state, batch_np, lr)

    mesh = make_sp_mesh()
    sp = shard_p2p_state_sp(state, mesh)
    batch = shard_batch_sp(batch_np, mesh)
    assert not batch["A"].sharding.is_fully_replicated
    step = sp_train_step_fn(g, d, tx, cfg)
    new_state, losses = step(sp, batch, lr)
    _assert_matches(new_state, losses, ref_state, ref_losses)


def test_dp_sp_hybrid_matches_unsharded(p2p_state):
    """2-D (dp=2, sp=4) hybrid: batch N on ``data`` AND H on ``spatial`` —
    still equals the single-device step."""
    g, d, state, tx = p2p_state
    cfg = {"P2P_lamda": 10.0, "Adv_lamda": 1.0, "noise_level": 1}
    rng = np.random.default_rng(11)
    batch_np = {
        k: rng.uniform(-1, 1, (4, 64, 64, 1)).astype(np.float32)
        for k in ("A", "B")
    }
    lr = jnp.float32(1e-4)
    ref_state, ref_losses = _reference_step(g, d, tx, cfg, state, batch_np, lr)

    mesh = make_dp_sp_mesh(dp=2, sp=4)
    sp = shard_p2p_state_sp(state, mesh)
    batch = shard_batch_sp(batch_np, mesh)
    step = sp_train_step_fn(g, d, tx, cfg)
    new_state, losses = step(sp, batch, lr)
    _assert_matches(new_state, losses, ref_state, ref_losses)


def test_sp_reg_family_step_runs_sharded():
    """The batch placement generalizes to any family: the HD/Reg three-net
    step runs H-sharded to finite losses (warp gathers + ResUNet pyramid
    included)."""
    from ctagan_tpu.models import RegNet

    g = Generator(1, 1, n_residual_blocks=2)
    r = RegNet(1, 1)
    d = Discriminator(1)
    state, tx = steps.init_reg_state(g, r, d, jax.random.PRNGKey(1), 128)
    cfg = {
        "Adv_lamda1": 1.0, "Corr_lamda1": 20.0, "Corr_lamda2": 2.0,
        "Smooth_lamda": 10.0, "Adv_lamda": 1.0, "Corr_lamda": 20.0,
        "noise_level": 1,
    }
    mesh = make_sp_mesh()
    rng = np.random.default_rng(3)
    batch = shard_batch_sp(
        {
            k: rng.uniform(-1, 1, (1, 128, 128, 1)).astype(np.float32)
            for k in ("A2", "B1", "B2")
        },
        mesh,
    )
    g2 = g.clone(fused_body=False, fused_body_grad=False, tap_heads=False)
    step = jax.jit(partial(
        steps.reg_train_step, g2, r, d, tx, cfg, dual_window_mode=True,
    ))
    state, losses = step(
        state, batch, jnp.float32(1e-4), lr_d=jnp.float32(1e-4)
    )
    assert all(np.isfinite(float(v)) for v in losses.values())
