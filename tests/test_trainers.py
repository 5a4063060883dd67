"""End-to-end trainer tests: 1-epoch train + val + test per family at small
sizes on the CPU mesh (the reference has no tests at all; SURVEY.md §4)."""
import os

import numpy as np
import pytest
import jax

from ctagan_tpu.data.fixtures import make_corpus
from ctagan_tpu.train import (
    CycTrainer,
    HdTrainerStage1,
    HdTrainerStage2,
    P2pTrainer,
    RegTrainer,
    build_trainer,
)
from ctagan_tpu.utils.config import Config, load_config

pytestmark = pytest.mark.slow  # compile-dominated e2e loops (~7 min cold)


def _config(tmp_path, lists, name="P2p", size=64, **kw):
    base = dict(
        name=name,
        save_root=str(tmp_path / "model") + "/",
        image_save=str(tmp_path / "img") + "/",
        train_list=lists["train"],
        val_list=lists["val"],
        test_list=lists["test"],
        size=size,
        n_epochs=1,
        decay_epoch=1,
        batchSize=1,
        n_cpu=2,
        val_every=1,
        data_parallel=False,
        seed=0,
    )
    base.update(kw)
    return load_config(base)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    return make_corpus(str(root), n_patients=2, slices_per_patient=2, size=32)


def _losses_finite(trainer):
    leaves = jax.tree.leaves(jax.device_get(trainer.state))
    assert all(np.all(np.isfinite(x)) for x in leaves if np.asarray(x).dtype.kind == "f")


def test_p2p_end_to_end(tmp_path, corpus):
    cfg = _config(tmp_path, corpus, name="P2p", size=64)
    t = P2pTrainer(cfg, quiet=True)
    t.train()
    _losses_finite(t)
    # checkpoints written each epoch, metric-stamped on val epochs
    ckpts = os.listdir(cfg.save_root)
    assert any(f.startswith("P2p_p2p_e") for f in ckpts)
    agg = t.test()
    for k in ("MAEw", "PSNRw", "SSIMw", "UQIw", "MAE", "PSNR", "SSIM", "UQI"):
        assert k in agg and np.isfinite(agg[k])
    # DICOM writeback produced the SE0/SE1/SE2 layout
    assert os.path.isdir(os.path.join(cfg.image_save, "ST1", "1", "SE2"))
    se2 = os.listdir(os.path.join(cfg.image_save, "ST1", "1", "SE2"))
    assert len(se2) >= 1
    from ctagan_tpu.data.dicom import read_dicom

    ds = read_dicom(os.path.join(cfg.image_save, "ST1", "1", "SE2", se2[0]))
    assert ds.pixel_array().shape == (64, 64)


def test_device_windowing_bit_exact(corpus):
    """raw-uint16 feed + on-device windowing must reproduce the host-side
    normalized views bit-for-bit (both families)."""
    from ctagan_tpu.data.datasets import DualWindowDataset, PairedSliceDataset
    from ctagan_tpu.ops.windowing import (
        dual_window_from_stored,
        fullrange_from_stored,
    )

    lists = corpus
    dsr = DualWindowDataset(lists["train"], raw_feed=True)
    dsh = DualWindowDataset(lists["train"])
    ir, ih = dsr[0], dsh[0]
    a1, a2 = jax.jit(dual_window_from_stored)(ir["A"])
    b1, b2 = jax.jit(dual_window_from_stored)(ir["B"])
    np.testing.assert_array_equal(np.asarray(a1), ih["A1"])
    np.testing.assert_array_equal(np.asarray(a2), ih["A2"])
    np.testing.assert_array_equal(np.asarray(b1), ih["B1"])
    np.testing.assert_array_equal(np.asarray(b2), ih["B2"])

    psr = PairedSliceDataset(lists["train"], raw_feed=True)
    psh = PairedSliceDataset(lists["train"])
    jr, jh = psr[0], psh[0]
    np.testing.assert_array_equal(
        np.asarray(jax.jit(fullrange_from_stored)(jr["A"])), jh["A"]
    )


def test_device_windowing_trainer_equivalence(tmp_path, corpus):
    """Training + eval with device_windowing on vs off: identical params
    (same seed) and identical validate() numbers."""
    def run(dw, tag):
        cfg = _config(tmp_path, corpus, name="P2p", size=64,
                      device_windowing=dw,
                      save_root=str(tmp_path / f"dw{tag}") + "/")
        t = P2pTrainer(cfg, quiet=True)
        t.train(max_steps_per_epoch=2)
        return jax.device_get(t.state.g_params), t.validate()

    (g1, v1), (g2, v2) = run(True, "on"), run(False, "off")
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(v1, v2, rtol=1e-6)


def test_device_denorm_matches_host():
    """The on-device stored-pixel de-normalization in _test_step must match
    the host writeback arithmetic ((x+1)*0.5*4095, truncating int16 cast —
    HdTrainer.py:539-549) on generator-range inputs."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (4, 64, 64)).astype(np.float32)
    # include exact boundary / near-integer cases
    x[0, 0, :8] = [-1.0, 1.0, 0.0, -0.5, 0.5, 1.0 - 2**-12, -1.0 + 2**-12, 0.25]
    host = ((x + 1.0) * 0.5 * 4095.0).astype(np.int16)
    dev = np.asarray(
        jax.jit(lambda f: ((f + 1.0) * 0.5 * 4095.0).astype(jnp.int16))(x)
    )
    np.testing.assert_array_equal(dev, host)


def test_eval_batch_matches_per_slice(tmp_path, corpus):
    """eval_batch > 1 (vmap'd per-sample metrics, one device call per K
    slices) must reproduce the per-slice protocol's numbers."""
    cfg = _config(tmp_path, corpus, name="P2p", size=64)
    t = P2pTrainer(cfg, quiet=True)
    t.train(max_steps_per_epoch=1)
    v1 = t.validate()
    a1 = t.test(write_dicom=False)
    t.config.eval_batch = 3  # uneven tail exercises the partial batch
    v2 = t.validate()
    a2 = t.test(write_dicom=False)
    np.testing.assert_allclose(v1, v2, rtol=1e-5, atol=1e-6)
    assert set(a1) == set(a2)
    for k in a1:
        np.testing.assert_allclose(a1[k], a2[k], rtol=1e-4, atol=1e-5)


def test_p2p_lr_decay_accelerating_quirk(tmp_path, corpus):
    cfg = _config(tmp_path, corpus, name="P2p", n_epochs=0, decay_epoch=4)
    t = P2pTrainer(cfg, quiet=True)
    lrs = [t.lr]
    for _ in range(3):
        t.update_learning_rate()
        lrs.append(t.lr)
    # faithful accelerating decay: lr_{k+1} = lr_k * (1 - 1/decay_epoch)
    for a, b in zip(lrs, lrs[1:]):
        np.testing.assert_allclose(b, a * 0.75, rtol=1e-6)


def test_p2p_resume_roundtrip(tmp_path, corpus):
    cfg = _config(tmp_path, corpus, name="P2p")
    t = P2pTrainer(cfg, quiet=True)
    t.train(max_steps_per_epoch=1)
    g_before = jax.device_get(t.state.g_params)

    cfg2 = _config(tmp_path, corpus, name="P2p", resume=True)
    t2 = P2pTrainer(cfg2, quiet=True)
    assert t2.start_epoch >= 1
    g_after = jax.device_get(t2.state.g_params)
    for a, b in zip(jax.tree.leaves(g_before), jax.tree.leaves(g_after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # epoch numbering survives the resume: the loss CSV continues with
    # absolute epochs instead of restarting at 1 (observed on a real
    # watchdog-resumed run, r4)
    cfg3 = _config(tmp_path, corpus, name="P2p", resume=True, n_epochs=3)
    t3 = P2pTrainer(cfg3, quiet=True)
    start = t3.start_epoch
    t3.train(max_steps_per_epoch=1)
    import csv as _csv

    with open(tmp_path / "model" / "P2p_losses.csv") as f:
        rows = list(_csv.reader(f))
    epochs = [int(r[0]) for r in rows[1:]]
    assert epochs == sorted(set(epochs)), epochs  # strictly increasing
    assert epochs[0] == 1 and epochs[-1] == cfg3.total_epochs
    assert start + 1 in epochs  # the resumed process appended, not restarted


def test_resume_skips_truncated_checkpoint(tmp_path, corpus):
    """A torn write at the newest checkpoint (crash mid-save before the
    atomic-rename fix, or a dying disk) must not wedge resume: it gets
    quarantined and the next-newest good checkpoint loads."""
    import glob
    import os

    cfg = _config(tmp_path, corpus, name="P2p")
    t = P2pTrainer(cfg, quiet=True)
    t.train(max_steps_per_epoch=1)
    ckpts = sorted(glob.glob(os.path.join(cfg.save_root, "*.ckpt")))
    assert ckpts
    # forge a newer, truncated checkpoint as the resume target
    torn = os.path.join(cfg.save_root, "P2p_p2p_e99.ckpt")
    with open(ckpts[-1], "rb") as f:
        blob = f.read()
    with open(torn, "wb") as f:
        f.write(blob[: len(blob) // 2])

    cfg2 = _config(tmp_path, corpus, name="P2p", resume=True)
    t2 = P2pTrainer(cfg2, quiet=True)
    assert t2.start_epoch >= 1  # resumed from the good one, not epoch 0
    assert not os.path.exists(torn)
    assert os.path.exists(torn + ".corrupt")


def test_cyclegan_one_epoch(tmp_path, corpus):
    cfg = _config(tmp_path, corpus, name="CycleGan", size=64)
    t = CycTrainer(cfg, quiet=True)
    t.train(max_steps_per_epoch=2)
    _losses_finite(t)
    # replay buffers actually filled
    assert int(jax.device_get(t.state.fake_b_buffer.size)) >= 1
    psnr, ssim = t.validate()
    assert np.isfinite(psnr) and -1 <= ssim <= 1


def test_reggan_one_epoch(tmp_path, corpus):
    cfg = _config(tmp_path, corpus, name="RegGan", size=128)
    t = RegTrainer(cfg, quiet=True)
    t.train(max_steps_per_epoch=2)
    _losses_finite(t)


def test_hd_stage1_then_stage2(tmp_path, corpus):
    cfg = _config(tmp_path, corpus, name="HdGan", size=128)
    t1 = HdTrainerStage1(cfg, quiet=True)
    t1.train(max_steps_per_epoch=2)
    _losses_finite(t1)
    # stage-1 D lr never decays (faithful reference quirk)
    lr_d0 = t1.lr_d
    t1.update_learning_rate()
    assert t1.lr_d == lr_d0 and t1.lr < 1e-4

    cfg2 = _config(tmp_path, corpus, name="HdGan2", size=128)
    t2 = HdTrainerStage2(cfg2, quiet=True)
    t2.bootstrap_from_stage1(
        __import__("ctagan_tpu.utils.checkpoint", fromlist=["find_latest_checkpoint"])
        .find_latest_checkpoint(cfg.save_root, "HdGan_hd1")[0]
    )
    # bootstrapped G == stage-1 G
    for a, b in zip(
        jax.tree.leaves(jax.device_get(t1.state.g_params)),
        jax.tree.leaves(jax.device_get(t2.state.g_params)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    t2.train(max_steps_per_epoch=1)
    _losses_finite(t2)
    agg = t2.test(write_dicom=False)
    assert np.isfinite(agg["PSNRw"])


def test_data_parallel_p2p_on_8_devices(tmp_path, tmp_path_factory):
    # Needs >= one global batch (8 devices x batchSize 1) of train slices or
    # the empty-loader guard (trainers._check_loader) correctly refuses to run.
    assert len(jax.devices()) == 8
    root = tmp_path_factory.mktemp("dp_train_corpus")
    # make_corpus splits paths evenly over (train, val, test): 24 slices -> 8 each.
    lists = make_corpus(str(root), n_patients=2, slices_per_patient=12, size=32)
    cfg = _config(
        tmp_path, lists, name="P2p", size=64, data_parallel=True, batchSize=1
    )
    t = P2pTrainer(cfg, quiet=True)
    assert t.n_devices == 8
    t.train(max_steps_per_epoch=1)  # global batch 8, sharded over the mesh
    _losses_finite(t)


def test_data_parallel_eval_matches_single_device(tmp_path, tmp_path_factory):
    """DP eval: when eval_batch divides the mesh, validate()/test() shard
    the batch over the data axis (8 devices each score 1 slice) — numbers
    must match the single-device eval path."""
    root = tmp_path_factory.mktemp("dp_eval_corpus")
    lists = make_corpus(str(root), n_patients=2, slices_per_patient=4, size=32)

    def run(dp, tag):
        cfg = _config(tmp_path, lists, name="P2p", size=64,
                      data_parallel=dp, eval_batch=8,
                      save_root=str(tmp_path / f"dp{tag}") + "/")
        t = P2pTrainer(cfg, quiet=True)
        if dp:
            assert t.n_devices == 8  # the sharded _eval_put path engages
        return t.validate(), t.test(write_dicom=False)

    (v1, a1), (v8, a8) = run(False, "1"), run(True, "8")
    np.testing.assert_allclose(v1, v8, rtol=1e-5, atol=1e-6)
    for k in a1:
        np.testing.assert_allclose(a1[k], a8[k], rtol=1e-4, atol=1e-5)


def test_enable_compile_cache(tmp_path):
    from ctagan_tpu.utils.config import enable_compile_cache

    assert enable_compile_cache("") is False
    cache = tmp_path / "jaxcache"
    try:
        assert enable_compile_cache(str(cache)) is True
        assert cache.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(cache)
    finally:  # don't leak the cache dir into the rest of the session
        jax.config.update("jax_compilation_cache_dir", None)


def test_build_trainer_dispatch(tmp_path, corpus):
    for name, cls in [("P2p", P2pTrainer), ("CycleGan", CycTrainer)]:
        cfg = _config(tmp_path, corpus, name=name)
        assert isinstance(build_trainer(cfg, quiet=True), cls)
    with pytest.raises(KeyError):
        build_trainer(_config(tmp_path, corpus, name="P2p").validate().__class__(name="nope"))


def test_p2p_bfloat16_step(tmp_path, corpus):
    cfg = _config(tmp_path, corpus, name="P2p", size=64, compute_dtype="bfloat16")
    t = P2pTrainer(cfg, quiet=True)
    t.train(max_steps_per_epoch=1)
    _losses_finite(t)


def test_p2p_training_is_deterministic(tmp_path, corpus):
    """Same seed -> bit-identical params after training (the reference's
    per-item reseeding defeats its own global seed, SURVEY.md §5 — explicit
    PRNG-key threading makes determinism exact here)."""
    def run(tag):
        cfg = _config(tmp_path, corpus, name="P2p", size=64,
                      save_root=str(tmp_path / f"m{tag}") + "/")
        t = P2pTrainer(cfg, quiet=True)
        t.train(max_steps_per_epoch=2)
        return jax.device_get(t.state.g_params)

    g1, g2 = run("a"), run("b")
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_checkpoint_backend(tmp_path, corpus):
    cfg = _config(tmp_path, corpus, name="P2p", checkpoint_backend="orbax")
    t = P2pTrainer(cfg, quiet=True)
    t.train(max_steps_per_epoch=1)
    from ctagan_tpu.utils.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()
    ckpts = [f for f in os.listdir(cfg.save_root) if f.endswith(".ocp")]
    assert ckpts
    g_before = jax.device_get(t.state.g_params)
    cfg2 = _config(tmp_path, corpus, name="P2p", resume=True,
                   checkpoint_backend="orbax")
    t2 = P2pTrainer(cfg2, quiet=True)
    assert t2.start_epoch >= 1
    for a, b in zip(jax.tree.leaves(g_before),
                    jax.tree.leaves(jax.device_get(t2.state.g_params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hd_stage2_multiscale_num_d2(tmp_path, corpus):
    cfg = _config(tmp_path, corpus, name="HdGan2", size=128)
    cfg.extras["num_d"] = 2
    t = HdTrainerStage2(cfg, quiet=True)
    t.train(max_steps_per_epoch=1)
    _losses_finite(t)


def test_p2p_context_slices_25d(tmp_path, corpus):
    cfg = _config(tmp_path, corpus, name="P2p", size=64, context_slices=3)
    t = P2pTrainer(cfg, quiet=True)
    t.train(max_steps_per_epoch=1)
    _losses_finite(t)
    psnr, _ = t.validate()
    assert np.isfinite(psnr)


def test_context_slices_rejected_for_other_families(tmp_path, corpus):
    cfg = _config(tmp_path, corpus, name="CycleGan", context_slices=3)
    with pytest.raises(ValueError):
        CycTrainer(cfg, quiet=True)


def test_reggan_fast_warp_option(tmp_path, corpus):
    cfg = _config(tmp_path, corpus, name="RegGan", size=128, warp_max_disp=4)
    t = RegTrainer(cfg, quiet=True)
    t.train(max_steps_per_epoch=1)
    _losses_finite(t)


def test_reggan_downsampled_registration(tmp_path, corpus):
    cfg = _config(
        tmp_path, corpus, name="RegGan", size=256, reg_downsample=2,
        warp_max_disp=4,
    )
    t = RegTrainer(cfg, quiet=True)
    t.train(max_steps_per_epoch=1)
    _losses_finite(t)


def test_hd_stage2_bootstrap_from_orbax_stage1(tmp_path, corpus):
    cfg = _config(tmp_path, corpus, name="HdGan", size=128,
                  checkpoint_backend="orbax")
    t1 = HdTrainerStage1(cfg, quiet=True)
    t1.train(max_steps_per_epoch=1)
    from ctagan_tpu.utils.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()
    cfg2 = _config(tmp_path, corpus, name="HdGan2", size=128)
    t2 = HdTrainerStage2(cfg2, quiet=True)
    t2.bootstrap_from_stage1()  # auto-discovers the .ocp stage-1 checkpoint
    for a, b in zip(
        jax.tree.leaves(jax.device_get(t1.state.g_params)),
        jax.tree.leaves(jax.device_get(t2.state.g_params)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_p2p_ema_generator(tmp_path, corpus):
    cfg = _config(tmp_path, corpus, name="P2p", size=64, ema_decay=0.9)
    t = P2pTrainer(cfg, quiet=True)
    assert t.state.g_ema is not None
    t.train(max_steps_per_epoch=2)
    # EMA differs from the live params but stays close after 2 steps
    live = jax.tree.leaves(jax.device_get(t.state.g_params))
    ema = jax.tree.leaves(jax.device_get(t.state.g_ema))
    diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
             for a, b in zip(live, ema)]
    assert max(diffs) > 0  # actually shadowing
    # eval path serves the EMA params
    for a, b in zip(jax.tree.leaves(t._g_params()), jax.tree.leaves(t.state.g_ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    psnr, _ = t.validate()
    assert np.isfinite(psnr)


def test_cyclegan_ema(tmp_path, corpus):
    cfg = _config(tmp_path, corpus, name="CycleGan", size=64, ema_decay=0.9)
    t = CycTrainer(cfg, quiet=True)
    assert t.state.g_ema is not None
    assert t.state.g_ema_b2a is not None
    init_b2a = jax.device_get(t.state.g_b2a_params)
    t.train(max_steps_per_epoch=2)
    for a, b in zip(jax.tree.leaves(t._g_params()), jax.tree.leaves(t.state.g_ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the B2A shadow tracks its own generator (debiased EMA: after the first
    # steps the shadow equals the debiased average, which has moved off init)
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(init_b2a), jax.tree.leaves(t.state.g_ema_b2a)
        )
    )
    assert moved


def test_cyclegan_unaligned_deterministic(tmp_path, corpus):
    """Same seed -> bit-identical params for the CycleGAN family, including
    the unaligned B-draws (keyed per (seed, index, access-count) instead of
    the reference's per-worker entropy reseeding, datasets.py:109-111)."""
    def run(tag):
        cfg = _config(tmp_path, corpus, name="CycleGan", size=64,
                      unaligned=True,
                      save_root=str(tmp_path / f"cyc{tag}") + "/")
        t = CycTrainer(cfg, quiet=True)
        t.train(max_steps_per_epoch=2)
        return jax.device_get(
            (t.state.g_a2b_params, t.state.g_b2a_params)
        )

    g1, g2 = run("a"), run("b")
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reggan_fused_up_option(tmp_path, corpus):
    cfg = _config(tmp_path, corpus, name="RegGan", size=128, reg_fuse_up=True)
    t = RegTrainer(cfg, quiet=True)
    t.train(max_steps_per_epoch=1)
    _losses_finite(t)


def test_r1_penalty_stabilizer(tmp_path, corpus):
    """Opt-in R1 gradient penalty (config ``r1_gamma``, VERDICT r1 #5):
    gamma=0 is exact reference semantics; gamma>0 only perturbs the D
    update, and the logged R1 value matches the closed-form
    gamma/2 * E[||dD(real)/dreal||^2] at the pre-step D params."""
    import jax.numpy as jnp

    k = jax.random.PRNGKey(3)
    a = jax.random.uniform(k, (1, 128, 128, 1), minval=-1.0, maxval=1.0)
    b = jnp.roll(a, 5, axis=1)
    batch = {"A": a, "B": b}

    cfg0 = _config(tmp_path, corpus, name="RegGan", size=128, noise_level=0)
    cfg1 = _config(tmp_path, corpus, name="RegGan", size=128, noise_level=0,
                   r1_gamma=0.5)
    t0 = RegTrainer(cfg0, quiet=True)
    t1 = RegTrainer(cfg1, quiet=True)
    s0, out0 = t0._compile_step()(t0.state, batch, 1e-4, 1e-4)
    s1, out1 = t1._compile_step()(t1.state, batch, 1e-4, 1e-4)
    assert "R1_loss" not in out0 and "R1_loss" in out1
    r1 = float(out1["R1_loss"])
    assert np.isfinite(r1) and r1 > 0.0
    # the G/R updates are untouched by the penalty...
    for x, y in zip(jax.tree.leaves(s0.g_params), jax.tree.leaves(s1.g_params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # ...while the D update actually changes
    diffs = [
        float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
        for x, y in zip(jax.tree.leaves(s0.d_params), jax.tree.leaves(s1.d_params))
    ]
    assert max(diffs) > 0.0

    # closed-form check (noise_level=0 -> the in-step affine is identity)
    def score(x):
        out = t1.d_model.apply(t1.state.d_params, x)
        return jnp.sum(
            jnp.mean(out.astype(jnp.float32), axis=tuple(range(1, out.ndim)))
        )

    gx = jax.grad(score)(b).astype(jnp.float32)
    want = 0.5 * 0.5 * float(jnp.mean(jnp.sum(jnp.square(gx), axis=(1, 2, 3))))
    assert abs(r1 - want) <= 1e-5 * max(1.0, abs(want))


def test_r1_penalty_stage2_multiscale(tmp_path, corpus):
    """R1 composes with the stage-2 multi-scale D (feature-list output)."""
    import jax.numpy as jnp

    cfg = _config(tmp_path, corpus, name="HdGan2", size=128, r1_gamma=0.1)
    t = HdTrainerStage2(cfg, quiet=True)
    k = jax.random.PRNGKey(5)
    img = jax.random.uniform(k, (1, 128, 128, 1), minval=-1.0, maxval=1.0)
    batch = {"A1": img, "A2": img, "B1": img, "B2": jnp.roll(img, 3, axis=2)}
    s, out = t._compile_step()(t.state, batch, 1e-4, 1e-4)
    assert np.isfinite(float(out["R1_loss"]))
    assert np.isfinite(float(out["toal_loss"]))


def test_test_report_lpips_columns(tmp_path, corpus, capsys):
    """VERDICT r4 #7: with `lpips_weights` configured, test() emits the
    reference's LPIPSw/LPIPS columns (HdTrainer.py:553-564); without, the
    aggregate print STATES their absence instead of silently printing 8
    of the reference's 10 numbers."""
    import torch

    from tests.test_lpips import _random_torch_sd

    wpath = str(tmp_path / "lpips.pth")
    torch.save(_random_torch_sd(seed=4), wpath)

    cfg = _config(tmp_path, corpus, name="P2p", size=64,
                  lpips_weights=wpath)
    t = P2pTrainer(cfg, quiet=True)
    agg = t.test(write_dicom=False)
    assert "LPIPS" in agg and "LPIPSw" in agg
    assert np.isfinite(agg["LPIPS"]) and np.isfinite(agg["LPIPSw"])

    cfg2 = _config(tmp_path, corpus, name="P2p", size=64,
                   save_root=str(tmp_path / "m2") + "/")
    t2 = P2pTrainer(cfg2, quiet=False)
    capsys.readouterr()
    agg2 = t2.test(write_dicom=False)
    out = capsys.readouterr().out
    assert "LPIPS" not in agg2
    assert "LPIPSw/LPIPS: not computed" in out
