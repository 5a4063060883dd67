"""Serialized-artifact export: roundtrip + output parity + symbolic batch."""
import jax
import jax.numpy as jnp
import numpy as np

from ctagan_tpu.models import Generator
from ctagan_tpu.serving.export import export_generator, load_exported


def test_export_roundtrip_symbolic_batch(tmp_path):
    g = Generator(1, 1, n_residual_blocks=2)
    params = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    path = str(tmp_path / "gen.ctax")
    export_generator(g, params, path, size=64)

    fn, header = load_exported(path)
    assert header["size"] == 64 and header["batch"] is None
    rng = np.random.default_rng(0)
    for b in (1, 3):
        x = jnp.asarray(rng.uniform(-1, 1, (b, 64, 64, 1)).astype(np.float32))
        ref = g.apply(params, x)
        out = fn(x)
        # separately lowered program: float-reordering-level differences
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def test_export_multi_platform(tmp_path):
    g = Generator(1, 1, n_residual_blocks=1)
    params = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    path = str(tmp_path / "gen_mp.ctax")
    export_generator(g, params, path, size=64, platforms=("tpu", "cpu"))
    fn, header = load_exported(path)
    assert set(header["platforms"]) == {"tpu", "cpu"}
    assert fn(jnp.zeros((1, 64, 64, 1), jnp.float32)).shape == (1, 64, 64, 1)


def test_export_pinned_batch(tmp_path):
    g = Generator(1, 1, n_residual_blocks=2)
    params = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    path = str(tmp_path / "gen_b2.ctax")
    export_generator(g, params, path, size=64, batch=2)
    fn, header = load_exported(path)
    assert header["batch"] == 2
    x = jnp.zeros((2, 64, 64, 1), jnp.float32)
    assert fn(x).shape == (2, 64, 64, 1)
