"""Halo-exchanged spatially-sharded inference: exactness vs the reference
semantics (unsharded forward over the symmetric-extended image, cropped)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ctagan_tpu.models import Generator
from ctagan_tpu.parallel.halo import infer_spatial_sharded
from ctagan_tpu.parallel.mesh import make_mesh


def _setup(size=256, n_res=2):
    g = Generator(1, 1, n_residual_blocks=n_res)
    params = g.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 1)))
    rng = np.random.default_rng(1)
    img = rng.uniform(-1, 1, (size, size)).astype(np.float32)
    return g, params, img


def _ref_extended(g, params, img, halo):
    ext = np.pad(img, ((halo, halo), (0, 0)), mode="symmetric")
    out = np.asarray(g.apply(params, ext[None, :, :, None]))[0, :, :, 0]
    return out[halo:-halo]


def test_sharded_exact_vs_extended_reference_everywhere():
    mesh = make_mesh(n=4)
    g, params, img = _setup()
    out = infer_spatial_sharded(g, params, img, mesh=mesh, halo=32)
    ref = _ref_extended(g, params, img, 32)
    # exact everywhere — seams, interior AND borders (fp tolerance only)
    np.testing.assert_allclose(out, ref, atol=5e-5)


def test_sharded_close_to_plain_unsharded_interior():
    mesh = make_mesh(n=4)
    g, params, img = _setup()
    plain = np.asarray(g.apply(params, img[None, :, :, None]))[0, :, :, 0]
    out = infer_spatial_sharded(g, params, img, mesh=mesh, halo=32)
    # vs the PLAIN forward the border extension shifts InstanceNorm stats
    # slightly (global coupling) — a small approximation even in the
    # interior. Random noise input is the worst case for this; real CT
    # slices border on uniform air. The exact contract is the
    # extended-reference test above.
    d = np.abs(out[40:-40] - plain[40:-40])
    assert d.mean() < 0.02 and d.max() < 0.1


def test_halo_equal_to_strip_supported():
    mesh = make_mesh(n=4)
    g, params, img = _setup()
    out = infer_spatial_sharded(g, params, img, mesh=mesh, halo=64)
    ref = _ref_extended(g, params, img, 64)
    np.testing.assert_allclose(out, ref, atol=5e-5)


def test_halo_validation():
    mesh = make_mesh(n=4)
    g, params, img = _setup(size=256)
    with pytest.raises(ValueError):
        infer_spatial_sharded(g, params, img, mesh=mesh, halo=30)  # not /4
    with pytest.raises(ValueError):
        infer_spatial_sharded(g, params, img, mesh=mesh, halo=128)  # > strip


def test_insufficient_halo_detectably_differs():
    # negative control: halo far below the receptive field must NOT match —
    # guards against the exactness tests comparing trivial regions
    mesh = make_mesh(n=4)
    g, params, img = _setup()
    out = infer_spatial_sharded(g, params, img, mesh=mesh, halo=4)
    ref = _ref_extended(g, params, img, 4)
    assert np.max(np.abs(out - ref)) > 1e-3
