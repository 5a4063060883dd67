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


def test_infer_series_writes_se2(tmp_path):
    from ctagan_tpu.data.fixtures import make_corpus
    from ctagan_tpu.parallel.serve import infer_series, load_series_fullrange
    from ctagan_tpu.train import P2pTrainer
    from ctagan_tpu.utils.config import load_config
    from ctagan_tpu.data.dicom import read_dicom
    import os

    lists = make_corpus(str(tmp_path / "c"), n_patients=1, slices_per_patient=3, size=32)
    cfg = load_config(dict(
        name="P2p", size=32, train_list=lists["train"], val_list=lists["val"],
        test_list=lists["test"], save_root=str(tmp_path / "m") + "/",
        image_save=str(tmp_path / "i") + "/", n_cpu=1, data_parallel=False,
    ))
    t = P2pTrainer(cfg, quiet=True)
    series_dir = os.path.join(str(tmp_path), "c", "patient0", "ST0", "SE0")
    vol, paths = load_series_fullrange(series_dir, size=32)
    assert vol.shape[0] == len(paths) >= 1
    out = infer_series(t, series_dir, cfg.image_save)
    files = os.listdir(out)
    assert len(files) == len(paths)
    ds = read_dicom(os.path.join(out, files[0]))
    assert ds.pixel_array().shape == (32, 32)


def test_infer_series_with_context_slices(tmp_path):
    from ctagan_tpu.data.fixtures import make_corpus
    from ctagan_tpu.parallel.serve import infer_series
    from ctagan_tpu.train import P2pTrainer
    from ctagan_tpu.utils.config import load_config
    import os

    lists = make_corpus(str(tmp_path / "c"), n_patients=1, slices_per_patient=4, size=32)
    cfg = load_config(dict(
        name="P2p", size=32, context_slices=3, train_list=lists["train"],
        val_list=lists["val"], test_list=lists["test"],
        save_root=str(tmp_path / "m") + "/", image_save=str(tmp_path / "i") + "/",
        n_cpu=1, data_parallel=False,
    ))
    t = P2pTrainer(cfg, quiet=True)
    series_dir = os.path.join(str(tmp_path), "c", "patient0", "ST0", "SE0")
    out = infer_series(t, series_dir, cfg.image_save)
    assert len(os.listdir(out)) == 4


def test_infer_series_depth_sharded_p3d(tmp_path):
    """--mode infer wiring for infer_depth_sharded: the P3d series path
    routes through the exact depth-halo program (submesh auto-sized; n=1
    degenerates to the exact whole-volume forward) and writes a full SE2."""
    import os

    from ctagan_tpu.data.fixtures import make_corpus
    from ctagan_tpu.parallel.serve import infer_series
    from ctagan_tpu.train import build_trainer
    from ctagan_tpu.utils.config import load_config

    lists = make_corpus(
        str(tmp_path / "c"), n_patients=1, slices_per_patient=8, size=32
    )
    cfg = load_config(dict(
        name="P3d", size=32, patch_depth=4, infer_depth_sharded=True,
        train_list=lists["train"], val_list=lists["val"],
        test_list=lists["test"], save_root=str(tmp_path / "m") + "/",
        image_save=str(tmp_path / "i") + "/", n_cpu=1, data_parallel=False,
    ))
    t = build_trainer(cfg, quiet=True)
    series_dir = os.path.join(str(tmp_path), "c", "patient0", "ST0", "SE0")
    out = infer_series(t, series_dir, cfg.image_save)
    assert len(os.listdir(out)) == 8
