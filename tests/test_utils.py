"""Config/checkpoint/logging/profiling utility tests."""
import os
import time

import numpy as np
import pytest

from ctagan_tpu.utils.checkpoint import (
    checkpoint_name,
    find_latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from ctagan_tpu.utils.config import Config, load_config
from ctagan_tpu.utils.logging import TrainLogger
from ctagan_tpu.utils.profiling import StepTimer


def test_compilation_cache_gating(tmp_path):
    """compilation_cache wiring: accelerator backends get the cache dir,
    cpu is a no-op (its SPMD executables don't serialize), off disables;
    'auto' resolves to the default user-cache path."""
    import jax

    from ctagan_tpu.utils.jaxcache import maybe_enable_compilation_cache

    before = jax.config.jax_compilation_cache_dir
    try:
        assert maybe_enable_compilation_cache("auto", backend="cpu") is None
        assert maybe_enable_compilation_cache("off", backend="tpu") is None
        assert maybe_enable_compilation_cache(None, backend="tpu") is None
        d = str(tmp_path / "jc")
        got = maybe_enable_compilation_cache(d, backend="tpu")
        assert got == d and os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
        auto = maybe_enable_compilation_cache("auto", backend="tpu")
        assert auto.endswith(os.path.join("ctagan_tpu", "jaxcache"))
    finally:
        jax.config.update("jax_compilation_cache_dir", before)


def test_shipped_config_presets_load():
    """Every configs/*.yaml preset (incl. the r5 certified-fast recipe)
    loads and validates through load_config."""
    import glob

    from ctagan_tpu.utils.config import load_config

    root = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")
    presets = sorted(glob.glob(os.path.join(root, "*.yaml")))
    assert len(presets) >= 7, presets
    for p in presets:
        cfg = load_config(p)
        assert cfg.name, p
    fast = load_config(os.path.join(root, "HdGan_fast.yaml"))
    assert fast.pad_mode == "zero" and fast.warp_max_disp == 4
    assert fast.reg_downsample == 2 and fast.compute_dtype == "bfloat16"


def test_config_reference_yaml_compat(tmp_path):
    # a verbatim reference-style YAML loads with exact key names
    y = tmp_path / "ref.yaml"
    y.write_text(
        """
name: HdGan
noise_level: 1
port: 8097
save_root: './output/Hd/model3/'
image_save: './output/Hd/img1/e3'
Adv_lamda1: 1
Adv_lamda2: 0.1
Cyc_lamda: 10
Corr_lamda1: 20
Corr_lamda2: 2
Smooth_lamda: 10
epoch: 0
n_epochs: 45
batchSize: 1
train_list: './data/train.txt'
val_list: './data/val2.txt'
test_list: './data/test1.txt'
lr: 0.0001
lrd: 0.0001
decay_epoch: 20
size: 512
input_nc: 1
output_nc: 1
cuda: True
n_cpu: 1
"""
    )
    cfg = load_config(str(y))
    assert cfg.name == "HdGan" and cfg.n_epochs == 45 and cfg.lrd == 1e-4
    assert cfg.total_epochs == 65
    assert cfg.Corr_lamda2 == 2


def test_config_unknown_keys_preserved():
    cfg = load_config({"name": "P2p", "my_custom_key": 7})
    assert cfg.extras["my_custom_key"] == 7


def test_config_validation_errors():
    with pytest.raises(ValueError):
        load_config({"size": 510})
    with pytest.raises(ValueError):
        load_config({"compute_dtype": "fp17"})
    with pytest.raises(ValueError):
        load_config({"decay_mode": "exp"})


def test_checkpoint_roundtrip_and_latest(tmp_path):
    state = {"a": np.arange(6).reshape(2, 3).astype(np.float32), "b": 3}
    p1 = save_checkpoint(str(tmp_path), "net", 1, state)
    p2 = save_checkpoint(str(tmp_path), "net", 5, state, psnr=31.2345, ssim=0.91)
    save_checkpoint(str(tmp_path), "other", 9, state)
    assert os.path.basename(p2) == "net_e5_31.2345_0.91.ckpt"
    path, epoch = find_latest_checkpoint(str(tmp_path), "net")
    assert epoch == 5 and path == p2
    back = load_checkpoint(p1, {"a": np.zeros((2, 3), np.float32), "b": 0})
    np.testing.assert_array_equal(back["a"], state["a"])
    assert find_latest_checkpoint(str(tmp_path), "missing") is None


def test_train_logger_csv(tmp_path):
    lg = TrainLogger("t", n_epochs=2, batches_per_epoch=3, log_dir=str(tmp_path), quiet=True)
    for _ in range(6):
        lg.log({"loss": 1.0})
    csv = tmp_path / "t_losses.csv"
    assert csv.exists()
    lines = csv.read_text().strip().splitlines()
    assert lines[0] == "epoch,loss"
    assert len(lines) == 3  # header + 2 epochs


def test_step_timer():
    st = StepTimer()
    for _ in range(4):
        st.tick()
        time.sleep(0.01)
    s = st.summary()
    assert 5 < s["p50_ms"] < 100
    assert s["steps_per_sec"] > 5


def test_ema_ramp_debiases_short_runs():
    """ema_decay=0.999 must not leave the shadow ~= random init on short
    runs: the effective decay ramps as min(decay, (1+t)/(10+t))."""
    import jax.numpy as jnp
    import numpy as np

    from ctagan_tpu.train.steps import _ema_update

    ema = {"w": jnp.zeros(3)}
    params = {"w": jnp.ones(3)}
    out = _ema_update(ema, params, 0.999, count=0)  # eff decay 0.1
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9, rtol=1e-6)
    out2 = _ema_update(ema, params, 0.999, count=10**6)  # asymptotic
    np.testing.assert_allclose(np.asarray(out2["w"]), 0.001, rtol=1e-4)
    # no count (legacy callers): flat decay
    out3 = _ema_update(ema, params, 0.999)
    np.testing.assert_allclose(np.asarray(out3["w"]), 0.001, rtol=1e-4)


def test_fused_body_grad_config_resolution():
    from ctagan_tpu.train.trainers import _fused_body_grad
    from ctagan_tpu.utils.config import load_config

    import pytest

    mk = lambda v: load_config(dict(name="HdGan", fused_body_grad=v))
    assert _fused_body_grad(mk(True)) is True
    assert _fused_body_grad(mk("on")) is True
    assert _fused_body_grad(mk(False)) is False
    assert _fused_body_grad(mk("off")) is False
    # tests force the CPU backend -> 'auto' resolves off here, on on TPU
    assert _fused_body_grad(mk("auto")) is False
    with pytest.raises(ValueError):
        mk("bogus")
