"""3-D volumetric family tests: models, dataset, trainer e2e, depth-blended
series inference."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ctagan_tpu.data.fixtures import make_corpus
from ctagan_tpu.data.volumes import VolumePatchDataset
from ctagan_tpu.models.volumetric import (
    Discriminator3D,
    Generator3D,
    instance_norm3d,
)
from ctagan_tpu.parallel.volume import infer_volume_3d
from ctagan_tpu.train import P3dTrainer, build_trainer
from ctagan_tpu.utils.config import load_config


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("vol_corpus")
    return make_corpus(str(root), n_patients=2, slices_per_patient=6, size=32)


def test_generator3d_shapes():
    g = Generator3D(1, 1, n_residual_blocks=2, base_features=8)
    x = jnp.zeros((1, 4, 32, 32, 1))
    params = g.init(jax.random.PRNGKey(0), x)
    y = g.apply(params, x)
    assert y.shape == (1, 4, 32, 32, 1)
    assert float(jnp.max(jnp.abs(y))) <= 1.0


def test_discriminator3d_scalar_logit():
    d = Discriminator3D(2)
    x = jnp.zeros((2, 4, 32, 32, 2))
    params = d.init(jax.random.PRNGKey(0), x)
    assert d.apply(params, x).shape == (2, 1)


def test_instance_norm3d_normalizes():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(3.0, 2.0, (2, 4, 8, 8, 3)).astype(np.float32))
    y = np.asarray(instance_norm3d(x))
    np.testing.assert_allclose(y.mean(axis=(1, 2, 3)), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.std(axis=(1, 2, 3)), 1.0, atol=1e-3)


def test_volume_patch_dataset(corpus):
    ds = VolumePatchDataset(corpus["train"], depth=4, size=32, train=True)
    assert len(ds) >= 1
    item = ds[0]
    assert item["A"].shape == (4, 32, 32, 1)
    assert item["B"].shape == (4, 32, 32, 1)
    # eval windows are deterministic and cover the series
    ev = VolumePatchDataset(corpus["train"], depth=4, size=32, train=False)
    assert len(ev) >= 1
    assert ev[0]["A"].shape == (4, 32, 32, 1)


@pytest.mark.slow
def test_p3d_trainer_end_to_end(tmp_path, corpus):
    cfg = load_config(dict(
        name="P3d", size=32, patch_depth=4,
        train_list=corpus["train"], val_list=corpus["val"],
        test_list=corpus["test"],
        save_root=str(tmp_path / "m") + "/", image_save=str(tmp_path / "i") + "/",
        n_epochs=1, decay_epoch=1, batchSize=1, n_cpu=1, val_every=1,
        data_parallel=False, seed=0,
    ))
    t = build_trainer(cfg, quiet=True)
    assert isinstance(t, P3dTrainer)
    t.train(max_steps_per_epoch=2)
    leaves = jax.tree.leaves(jax.device_get(t.state))
    assert all(
        np.all(np.isfinite(x)) for x in leaves if np.asarray(x).dtype.kind == "f"
    )
    psnr, ssim_v = t.validate()
    assert np.isfinite(psnr) and -1 <= ssim_v <= 1
    agg = t.test()
    assert np.isfinite(agg["PSNR"])


def test_infer_volume_3d_blends():
    # near-identity model commutes with depth blending
    vol = np.random.default_rng(1).uniform(-1, 1, (10, 16, 16)).astype(np.float32)
    out = infer_volume_3d(lambda p, x: x * 0.5, None, vol, depth=4, overlap=0.5)
    np.testing.assert_allclose(out, vol * 0.5, atol=1e-5)


def test_infer_volume_3d_short_series():
    vol = np.random.default_rng(2).uniform(-1, 1, (3, 8, 8)).astype(np.float32)
    out = infer_volume_3d(lambda p, x: x, None, vol, depth=8)
    np.testing.assert_allclose(out, vol, atol=1e-5)


@pytest.mark.parametrize("strides", [(1, 2), (2, 2)])
def test_generator3d_depth_downsample_shapes(strides):
    from ctagan_tpu.models.volumetric import Generator3D

    g = Generator3D(1, 1, n_residual_blocks=1, depth_strides=strides)
    x = jnp.zeros((1, 4, 16, 16, 1))
    params = g.init(jax.random.PRNGKey(0), x)
    out = g.apply(params, x)
    assert out.shape == x.shape  # depth restored by the mirrored up path


def test_depth_downsample_config_validation():
    from ctagan_tpu.utils.config import load_config

    with pytest.raises(ValueError):
        load_config(dict(depth_downsample=3))
    with pytest.raises(ValueError):
        load_config(dict(depth_downsample=4, patch_depth=6))
    cfg = load_config(dict(name="P3d", depth_downsample=2, patch_depth=8))
    assert cfg.depth_downsample == 2
