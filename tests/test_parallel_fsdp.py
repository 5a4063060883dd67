"""FSDP (ZeRO-3-style) state sharding: memory claim + step equality.

The fully-sharded layout (parallel/fsdp.py) must (a) actually cut per-device
state memory ~1/n and (b) reproduce the single-device P2p train step to
float tolerance — GSPMD derives the all-gather/reduce-scatter schedule from
the placement alone. Runs on the 8-virtual-device CPU mesh (conftest)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctagan_tpu.models import Discriminator, Generator
from ctagan_tpu.parallel.fsdp import (
    FSDP_AXIS,
    batch_sharding_fsdp,
    fsdp_param_specs,
    fsdp_train_step_fn,
    make_fsdp_mesh,
    shard_p2p_state_fsdp,
    state_bytes_per_device,
    shard_tree_fsdp,
)
from ctagan_tpu.train import steps


@pytest.fixture(scope="module")
def p2p_state():
    g = Generator(1, 1, n_residual_blocks=2)
    d = Discriminator(2)
    state, tx = steps.init_p2p_state(g, d, jax.random.PRNGKey(0), 64, ema=True)
    return g, d, state, tx


def test_fsdp_specs_shard_trailing_divisible_dim(p2p_state):
    _, _, state, _ = p2p_state
    mesh = make_fsdp_mesh()
    specs = fsdp_param_specs(state.g_params, mesh)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): spec
        for path, spec in jax.tree_util.tree_flatten_with_path(specs)[0]
    }
    # body conv kernel (3,3,256,256): output-channel dim sharded
    assert flat["params/ResidualBlock_0/ConvTorch_0/Conv_0/kernel"] == (
        None, None, None, FSDP_AXIS,
    )
    # head kernel (7,7,1,64): O dim divisible
    assert flat["params/ConvTorch_0/Conv_0/kernel"][3] == FSDP_AXIS
    # tail kernel (7,7,64,1): O=1 indivisible -> falls back to the I dim
    g_tail = flat["params/ConvTorch_3/Conv_0/kernel"]
    assert g_tail[3] is None and g_tail[2] == FSDP_AXIS
    # tail bias (1,): nothing divisible -> replicated
    assert flat["params/ConvTorch_3/Conv_0/bias"] == ()


def test_fsdp_state_memory_drops(p2p_state):
    _, _, state, _ = p2p_state
    mesh = make_fsdp_mesh()
    n = len(mesh.devices.ravel())
    total = sum(
        leaf.nbytes for leaf in jax.tree.leaves(state)
        if hasattr(leaf, "nbytes")
    )
    fs = shard_p2p_state_fsdp(state, mesh)
    peak = state_bytes_per_device(fs)
    # params + 2 Adam moments + EMA nearly all shard; only biases of width
    # <8, count scalars and the rng key replicate
    assert peak < total / n * 1.10, (peak, total / n)
    # Adam moments really are sharded, not just params
    mu = fs.g_opt.mu["params"]["ResidualBlock_0"]["ConvTorch_0"]["Conv_0"][
        "kernel"
    ]
    assert not mu.sharding.is_fully_replicated


def test_fsdp_train_step_matches_unsharded(p2p_state):
    """ONE P2p training step with ALL state fully sharded over the 8-way
    fsdp mesh (batch sharded on the same axis) == the single-device step."""
    g, d, state, tx = p2p_state
    cfg = {"P2P_lamda": 10.0, "Adv_lamda": 1.0, "noise_level": 1}
    rng = np.random.default_rng(7)
    batch_np = {
        k: rng.uniform(-1, 1, (8, 64, 64, 1)).astype(np.float32)
        for k in ("A", "B")
    }
    lr = jnp.float32(1e-4)

    from functools import partial

    ref_state, ref_losses = jax.jit(
        partial(steps.p2p_train_step, g, d, tx, cfg)
    )(state, {k: jnp.asarray(v) for k, v in batch_np.items()}, lr)

    mesh = make_fsdp_mesh()
    fs = shard_p2p_state_fsdp(state, mesh)
    bsh = batch_sharding_fsdp(mesh)
    batch = {k: jax.device_put(v, bsh) for k, v in batch_np.items()}
    step = fsdp_train_step_fn(g, d, tx, cfg)
    new_state, losses = step(fs, batch, lr)

    for k in ref_losses:
        np.testing.assert_allclose(
            float(losses[k]), float(ref_losses[k]), rtol=2e-5, atol=1e-5
        )
    # same sign-flip bound as the TP step test: Adam's first step moves a
    # near-zero-grad element by up to 2*lr under a changed reduction order
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
    # the updated state is STILL fully sharded (no silent re-replication)
    k1 = new_state.g_params["params"]["ResidualBlock_0"]["ConvTorch_0"][
        "Conv_0"
    ]["kernel"]
    assert not k1.sharding.is_fully_replicated
    mu = new_state.g_opt.mu["params"]["ResidualBlock_0"]["ConvTorch_0"][
        "Conv_0"
    ]["kernel"]
    assert not mu.sharding.is_fully_replicated


def test_fsdp_generic_state_reg_family():
    """shard_state_fsdp works on ANY family's state dataclass: the HD/Reg
    three-net state (G+R+D params, three Adam moment trees) shards with the
    same memory claim and one reg train step stays finite and sharded."""
    from functools import partial

    from ctagan_tpu.models import RegNet
    from ctagan_tpu.parallel.fsdp import shard_state_fsdp

    g = Generator(1, 1, n_residual_blocks=2)
    r = RegNet(1, 1)
    d = Discriminator(1)
    state, tx = steps.init_reg_state(g, r, d, jax.random.PRNGKey(1), 128)
    total = sum(
        leaf.nbytes for leaf in jax.tree.leaves(state)
        if hasattr(leaf, "nbytes")
    )
    mesh = make_fsdp_mesh()
    fs = shard_state_fsdp(state, mesh)
    assert state_bytes_per_device(fs) < total / 4
    cfg = {
        "Adv_lamda1": 1.0, "Corr_lamda1": 20.0, "Corr_lamda2": 2.0,
        "Smooth_lamda": 10.0, "Adv_lamda": 1.0, "Corr_lamda": 20.0,
        "noise_level": 1,
    }
    bsh = batch_sharding_fsdp(mesh)
    rng = np.random.default_rng(3)
    batch = {
        k: jax.device_put(
            rng.uniform(-1, 1, (8, 128, 128, 1)).astype(np.float32), bsh
        )
        for k in ("A2", "B1", "B2")
    }
    g2 = g.clone(fused_body=False, fused_body_grad=False, tap_heads=False)
    step = jax.jit(partial(
        steps.reg_train_step, g2, r, d, tx, cfg,
        dual_window_mode=True,
    ))
    fs, losses = step(fs, batch, jnp.float32(1e-4), lr_d=jnp.float32(1e-4))
    assert all(np.isfinite(float(v)) for v in losses.values())
    k1 = fs.g_params["params"]["ResidualBlock_0"]["ConvTorch_0"]["Conv_0"][
        "kernel"
    ]
    assert not k1.sharding.is_fully_replicated


def test_fsdp_second_step_stays_sharded_and_finite(p2p_state):
    g, d, state, tx = p2p_state
    cfg = {"P2P_lamda": 10.0, "Adv_lamda": 1.0, "noise_level": 1}
    mesh = make_fsdp_mesh()
    fs = shard_p2p_state_fsdp(state, mesh)
    bsh = batch_sharding_fsdp(mesh)
    rng = np.random.default_rng(9)
    step = fsdp_train_step_fn(g, d, tx, cfg)
    lr = jnp.float32(1e-4)
    for _ in range(2):
        batch = {
            k: jax.device_put(
                rng.uniform(-1, 1, (8, 64, 64, 1)).astype(np.float32), bsh
            )
            for k in ("A", "B")
        }
        fs, losses = step(fs, batch, lr)
    assert all(np.isfinite(float(v)) for v in losses.values())
    assert state_bytes_per_device(fs) < sum(
        leaf.nbytes for leaf in jax.tree.leaves(state)
        if hasattr(leaf, "nbytes")
    ) / 4


def test_dp_fsdp_hybrid_matches_unsharded(p2p_state):
    """2-D (dp=2, fsdp=4) hybrid: state sharded 1/4 + replicated across the
    2 dp groups, batch 8-way data-parallel over both axes — still equals
    the single-device step."""
    from ctagan_tpu.parallel.fsdp import make_dp_fsdp_mesh

    g, d, state, tx = p2p_state
    cfg = {"P2P_lamda": 10.0, "Adv_lamda": 1.0, "noise_level": 1}
    rng = np.random.default_rng(11)
    batch_np = {
        k: rng.uniform(-1, 1, (8, 64, 64, 1)).astype(np.float32)
        for k in ("A", "B")
    }
    lr = jnp.float32(1e-4)

    from functools import partial

    ref_state, ref_losses = jax.jit(
        partial(steps.p2p_train_step, g, d, tx, cfg)
    )(state, {k: jnp.asarray(v) for k, v in batch_np.items()}, lr)

    mesh = make_dp_fsdp_mesh(dp=2, fsdp=4)
    fs = shard_p2p_state_fsdp(state, mesh)
    bsh = batch_sharding_fsdp(mesh)
    batch = {k: jax.device_put(v, bsh) for k, v in batch_np.items()}
    step = fsdp_train_step_fn(g, d, tx, cfg)
    new_state, losses = step(fs, batch, lr)
    for k in ref_losses:
        np.testing.assert_allclose(
            float(losses[k]), float(ref_losses[k]), rtol=2e-5, atol=1e-5
        )
    k1 = new_state.g_params["params"]["ResidualBlock_0"]["ConvTorch_0"][
        "Conv_0"
    ]["kernel"]
    assert not k1.sharding.is_fully_replicated
    # state memory: 1/4 sharded (not 1/8 — replicated across the dp=2 axis)
    total = sum(
        leaf.nbytes for leaf in jax.tree.leaves(state)
        if hasattr(leaf, "nbytes")
    )
    peak = state_bytes_per_device(fs)
    assert peak < total / 4 * 1.10
