"""Depth-parallel 3-D training (parallel/volume.py): step equality.

The D-sharded P3d train step must reproduce the single-device step to
float tolerance — GSPMD derives the conv3d depth-halo exchanges and the
InstanceNorm3d/loss all-reduces from the batch placement alone (VERDICT
r2 #8: a volume larger than one chip's activation budget trains on the
mesh). Runs on the 8-virtual-device CPU mesh (conftest)."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctagan_tpu.models.volumetric import Discriminator3D, Generator3D
from ctagan_tpu.parallel.volume import (
    depth_train_step_fn,
    make_depth_mesh,
    make_dp_depth_mesh,
    shard_batch_depth,
    shard_p3d_state_depth,
)
from ctagan_tpu.train import steps


@pytest.fixture(scope="module")
def p3d_state():
    g = Generator3D(1, 1, n_residual_blocks=2)
    d = Discriminator3D(2)
    state, tx = steps.init_p3d_state(g, d, jax.random.PRNGKey(0), 16, 32)
    return g, d, state, tx


def _batch(n=2, depth=16, size=32, seed=0):
    rng = np.random.default_rng(seed)
    return {
        k: rng.uniform(-1, 1, (n, depth, size, size, 1)).astype(np.float32)
        for k in ("A", "B")
    }


def _assert_matches(new_state, losses, ref_state, ref_losses):
    for k in ref_losses:
        np.testing.assert_allclose(
            float(losses[k]), float(ref_losses[k]), rtol=2e-4, atol=1e-5
        )
    for a, b in zip(
        jax.tree.leaves(jax.device_get(new_state.g_params)),
        jax.tree.leaves(jax.device_get(ref_state.g_params)),
    ):
        np.testing.assert_allclose(a, b, atol=2.2e-4)


def test_depth_sharded_step_matches_unsharded(p3d_state):
    g, d, state, tx = p3d_state
    cfg = {"P2P_lamda": 10.0, "Adv_lamda": 1.0}
    batch_np = _batch()
    lr = jnp.float32(1e-4)
    ref_state, ref_losses = jax.jit(
        partial(steps.p3d_train_step, g, d, tx, cfg)
    )(state, {k: jnp.asarray(v) for k, v in batch_np.items()}, lr)

    mesh = make_depth_mesh()  # 8-way D sharding
    st = shard_p3d_state_depth(state, mesh)
    db = shard_batch_depth(batch_np, mesh)
    step = depth_train_step_fn(g, d, tx, cfg)
    new_state, losses = step(st, db, lr)
    _assert_matches(new_state, losses, ref_state, ref_losses)


def test_dp_x_depth_hybrid_matches(p3d_state):
    g, d, state, tx = p3d_state
    cfg = {"P2P_lamda": 10.0, "Adv_lamda": 1.0}
    batch_np = _batch(n=2, depth=16)
    lr = jnp.float32(1e-4)
    ref_state, ref_losses = jax.jit(
        partial(steps.p3d_train_step, g, d, tx, cfg)
    )(state, {k: jnp.asarray(v) for k, v in batch_np.items()}, lr)

    mesh = make_dp_depth_mesh(2, 4)
    st = shard_p3d_state_depth(state, mesh)
    db = shard_batch_depth(batch_np, mesh)
    step = depth_train_step_fn(g, d, tx, cfg)
    new_state, losses = step(st, db, lr)
    _assert_matches(new_state, losses, ref_state, ref_losses)


def test_indivisible_depth_clear_error(p3d_state):
    mesh = make_depth_mesh()
    with pytest.raises(ValueError, match="D divisible"):
        shard_batch_depth(_batch(depth=12), mesh)


def test_plan_from_spec_depth():
    from ctagan_tpu.parallel.mesh import plan_from_spec
    from ctagan_tpu.parallel.volume import DEPTH_AXIS

    p = plan_from_spec({"depth": 8})
    assert p.kind == "depth" and p.model_sharded and p.batch_scale == 1
    assert DEPTH_AXIS in p.mesh.axis_names
    p2 = plan_from_spec({"dp": 2, "depth": 4})
    assert p2.kind == "depth" and p2.batch_scale == 2
    with pytest.raises(ValueError, match="at most one"):
        plan_from_spec({"depth": 2, "sp": 2})
