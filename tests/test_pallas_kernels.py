"""Pallas kernel correctness (interpret mode on CPU; compiled path on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from ctagan_tpu.models.layers import instance_norm
from ctagan_tpu.ops.pallas_kernels import instance_norm_pallas


def _x(seed, shape):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape).astype(np.float32)
    )


def test_instance_norm_pallas_matches_reference():
    x = _x(0, (2, 32, 16, 8))
    got = instance_norm_pallas(x, block_rows=8, interpret=True)
    want = instance_norm(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_instance_norm_pallas_relu_fusion():
    x = _x(1, (1, 16, 16, 4))
    got = instance_norm_pallas(x, activation="relu", block_rows=8, interpret=True)
    want = jax.nn.relu(instance_norm(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_instance_norm_pallas_leaky_fusion():
    x = _x(2, (1, 16, 16, 4))
    got = instance_norm_pallas(
        x, activation="leaky_relu", block_rows=8, interpret=True
    )
    want = jax.nn.leaky_relu(instance_norm(x), 0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_instance_norm_pallas_bf16_io_fp32_stats():
    x = _x(3, (1, 32, 32, 8)).astype(jnp.bfloat16)
    got = instance_norm_pallas(x, block_rows=16, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = instance_norm(x)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2
    )
