"""Depth-halo sharded 3-D inference: sharded == unsharded on the
symmetric-extended volume (the exact-semantics contract of
parallel.volume.infer_volume_depth_sharded). 8-virtual-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctagan_tpu.models.volumetric import Generator3D
from ctagan_tpu.parallel.mesh import make_mesh
from ctagan_tpu.parallel.volume import infer_volume_depth_sharded


@pytest.fixture(scope="module")
def g_and_params():
    g = Generator3D(1, 1, n_residual_blocks=1, tap_head=False, tap_tail=False)
    params = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 1)))
    return g, params


def _reference(g, params, volume, halo):
    padded = np.pad(
        volume, ((halo, halo), (0, 0), (0, 0)), mode="symmetric"
    )
    out = g.apply(params, jnp.asarray(padded[None, ..., None]))
    return np.asarray(out)[0, halo:-halo, :, :, 0]


def test_depth_sharded_matches_extended_unsharded(g_and_params):
    g, params = g_and_params
    rng = np.random.default_rng(0)
    vol = rng.uniform(-1, 1, (32, 32, 32)).astype(np.float32)
    mesh = make_mesh(n=4)
    halo = 8  # depth RF radius for n_residual_blocks=1
    out = infer_volume_depth_sharded(g, params, vol, mesh=mesh, halo=halo)
    ref = _reference(g, params, vol, halo)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_depth_sharded_default_halo_and_8way(g_and_params):
    g, params = g_and_params
    rng = np.random.default_rng(1)
    vol = rng.uniform(-1, 1, (64, 32, 32)).astype(np.float32)
    mesh = make_mesh()  # all 8 devices, slab 8 >= default halo 8
    out = infer_volume_depth_sharded(g, params, vol, mesh=mesh)
    ref = _reference(g, params, vol, 6 + 2 * g.n_residual_blocks)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_depth_sharded_validates_geometry(g_and_params):
    g, params = g_and_params
    vol = np.zeros((30, 32, 32), np.float32)
    with pytest.raises(ValueError, match="divide"):
        infer_volume_depth_sharded(g, params, vol, mesh=make_mesh(n=4))
    with pytest.raises(ValueError, match="halo"):
        infer_volume_depth_sharded(
            g, params, np.zeros((16, 32, 32), np.float32),
            mesh=make_mesh(n=4), halo=8,
        )
    with pytest.raises(ValueError, match="depth_strides"):
        g2 = g.clone(depth_strides=(2, 1))
        infer_volume_depth_sharded(
            g2, params, np.zeros((32, 32, 32), np.float32),
            mesh=make_mesh(n=4), halo=8,
        )
