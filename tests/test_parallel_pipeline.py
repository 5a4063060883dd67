"""Pipeline parallelism: staged-vs-sequential generator forward equality.

The GPipe schedule (parallel/pipeline.py) must reproduce the sequential
generator forward to float tolerance for any (stages, microbatches) split.
Runs on the 8-virtual-device CPU mesh (conftest)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctagan_tpu.models import Generator
from ctagan_tpu.parallel.pipeline import (
    make_pp_mesh,
    pipeline_generator_forward,
)


@pytest.fixture(scope="module")
def g_and_params():
    g = Generator(1, 1, n_residual_blocks=6)
    params = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    return g, params


@pytest.mark.parametrize("stages,micro", [(2, 2), (3, 4), (6, 1)])
def test_pipeline_matches_sequential(g_and_params, stages, micro):
    g, params = g_and_params
    x = np.random.default_rng(stages).uniform(
        -1, 1, (4, 64, 64, 1)
    ).astype(np.float32)
    ref = g.apply(params, jnp.asarray(x))
    out = pipeline_generator_forward(
        g, params, x, mesh=make_pp_mesh(stages), microbatches=micro
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_pipeline_rejects_uneven_split(g_and_params):
    g, params = g_and_params
    x = np.zeros((2, 64, 64, 1), np.float32)
    with pytest.raises(ValueError, match="divide"):
        pipeline_generator_forward(
            g, params, x, mesh=make_pp_mesh(4), microbatches=2
        )
