"""Resize parity vs torch F.interpolate; augmentation distribution checks."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from ctagan_tpu.ops.resize import interpolate_nearest, interpolate_bilinear
from ctagan_tpu.ops.augment import random_affine, affine_warp


def _pair(seed, shape):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


def test_nearest_matches_torch_default_interpolate():
    x = _pair(0, (2, 3, 17, 23))
    for size in [(17, 23), (32, 32), (8, 10), (34, 46)]:
        want = F.interpolate(torch.tensor(x), size=list(size)).numpy()
        got = np.asarray(
            interpolate_nearest(jnp.asarray(x.transpose(0, 2, 3, 1)), size)
        ).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want)


def test_bilinear_matches_torch_align_corners_false():
    x = _pair(1, (1, 2, 9, 11))
    for size in [(18, 22), (5, 7), (16, 16)]:
        want = F.interpolate(
            torch.tensor(x), size=list(size), mode="bilinear", align_corners=False
        ).numpy()
        got = np.asarray(
            interpolate_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), size)
        ).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_affine_identity_params_is_identity():
    img = jnp.asarray(_pair(2, (2, 16, 16, 1)))
    out = affine_warp(
        img, jnp.zeros(2), jnp.zeros(2), jnp.zeros(2), jnp.ones(2)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_affine_translation_moves_content():
    img = jnp.zeros((1, 8, 8, 1)).at[0, 4, 4, 0].set(1.0)
    out = affine_warp(
        img, jnp.zeros(1), jnp.array([2.0]), jnp.array([1.0]), jnp.ones(1)
    )
    assert float(out[0, 6, 5, 0]) == 1.0


def test_affine_fill_is_minus_one_outside():
    img = jnp.ones((1, 8, 8, 1))
    out = affine_warp(
        img, jnp.zeros(1), jnp.array([4.0]), jnp.zeros(1), jnp.ones(1)
    )
    assert float(out[0, 0, 0, 0]) == -1.0


def test_random_affine_shared_key_is_deterministic():
    key = jax.random.PRNGKey(0)
    img = jnp.asarray(_pair(3, (2, 32, 32, 1)))
    a = random_affine(key, img, noise_level=1)
    b = random_affine(key, img, noise_level=1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_random_affine_stays_in_input_range():
    key = jax.random.PRNGKey(1)
    img = jnp.clip(jnp.asarray(_pair(4, (4, 32, 32, 1))), -1, 1)
    out = np.asarray(random_affine(key, img, noise_level=3))
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6
