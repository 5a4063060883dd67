"""Sharded volume inference + sliding-window blending tests."""
import numpy as np
import jax
import jax.numpy as jnp

from ctagan_tpu.parallel.mesh import make_mesh
from ctagan_tpu.parallel.volume import infer_volume, sliding_window


def _identityish(params, x):
    return x * params["scale"]


def test_infer_volume_shards_and_pads():
    mesh = make_mesh()
    vol = np.random.default_rng(0).uniform(-1, 1, (19, 32, 32)).astype(np.float32)
    out = infer_volume(
        _identityish, {"scale": 2.0}, vol, mesh=mesh, batch_per_device=1
    )
    assert out.shape == vol.shape
    np.testing.assert_allclose(out, vol * 2.0, atol=1e-6)


def test_sliding_window_blends_seamlessly():
    # a linear model commutes with blending -> output must equal direct apply
    img = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (96, 80, 1)).astype(np.float32)
    )
    out = sliding_window(
        lambda p, x: x * 0.5, None, img, tile=48, overlap=0.5
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(img) * 0.5, atol=1e-5)


def test_sliding_window_small_image_passthrough():
    img = jnp.ones((32, 32, 1))
    out = sliding_window(lambda p, x: x + 1, None, img, tile=64)
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_sliding_window_one_small_dimension():
    img = jnp.asarray(
        np.random.default_rng(2).uniform(-1, 1, (32, 96, 1)).astype(np.float32)
    )
    out = sliding_window(lambda p, x: x * 0.5, None, img, tile=48, overlap=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img) * 0.5, atol=1e-5)
