"""Multi-process (multi-host convention) tests: the process>1 branches of
parallel.mesh run under a real 2-process jax.distributed CPU cluster.

Each subprocess gets 2 virtual CPU devices -> a 4-device global mesh across
2 processes, exercising ``make_array_from_process_local_data`` batch
assembly and the SPMD gradient all-reduce across process boundaries —
the DCN-scale-out conventions that single-process tests can't reach.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["REPO_ROOT"])
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PROC_ID"]),
)
import jax.numpy as jnp
import numpy as np
from ctagan_tpu.parallel.mesh import make_mesh, replicated_sharding, shard_batch

pid = jax.process_index()
mesh = make_mesh()
assert len(mesh.devices.ravel()) == 4, mesh

# each process contributes a distinct local shard (2 rows each)
local = np.arange(2, dtype=np.float32).reshape(2, 1) + 10.0 * pid  # p0: 0,1; p1: 10,11
batch = shard_batch(mesh, {"x": local})

w = jax.device_put(jnp.asarray(3.0), replicated_sharding(mesh))

@jax.jit
def loss_and_grad(w, x):
    def loss(w):
        return jnp.mean(w * x)  # global-batch mean -> grad = mean(x)
    return jax.value_and_grad(loss)(w)

val, grad = loss_and_grad(w, batch["x"])
out = {
    "process": pid,
    "n_global_devices": jax.device_count(),
    "loss": float(val),
    "grad": float(grad),
}
print("RESULT " + json.dumps(out), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_global_mean_and_grad(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env_base = {
        **os.environ,
        "REPO_ROOT": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "COORD": coord,
        "JAX_PLATFORMS": "cpu",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script)],
            env={**env_base, "PROC_ID": str(i)},
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("jax.distributed CPU cluster did not come up in time")
        outs.append(out)
    results = []
    for out, p in zip(outs, procs):
        if p.returncode != 0:
            if "distributed" in out.lower() or "coordinator" in out.lower():
                pytest.skip(f"jax.distributed unavailable here: {out[-400:]}")
            raise AssertionError(f"worker failed:\n{out[-2000:]}")
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        results.append(json.loads(line[len("RESULT "):]))

    # global batch = [0, 1, 10, 11]; loss = 3 * mean = 16.5; grad = mean = 5.5
    for r in results:
        assert r["n_global_devices"] == 4
        assert abs(r["loss"] - 16.5) < 1e-5
        assert abs(r["grad"] - 5.5) < 1e-5
    assert {r["process"] for r in results} == {0, 1}


_TRAINER_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["REPO_ROOT"])
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PROC_ID"]),
)
import numpy as np
from ctagan_tpu.train import build_trainer
from ctagan_tpu.utils.config import load_config

root = os.environ["CORPUS_ROOT"]
cfg = load_config(dict(
    name="P2p", size=32,
    train_list=os.path.join(root, "train.txt"),
    val_list=os.path.join(root, "val.txt"),
    test_list=os.path.join(root, "test.txt"),
    save_root=os.path.join(root, "model") + "/",
    image_save=os.path.join(root, "img") + "/",
    n_epochs=1, decay_epoch=1, batchSize=1, n_cpu=1, val_every=1,
    data_parallel=True, seed=0,
))
t = build_trainer(cfg, quiet=True)
t.train(max_steps_per_epoch=2)
leaves = jax.tree.leaves(jax.device_get(t.state.g_params))
checksum = float(sum(np.float64(np.sum(np.asarray(x, np.float64))) for x in leaves))
# host 0 writes the checkpoints; barrier so the other host's listing below
# can't race the final save (shared-storage convention)
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("ckpts-written")
ckpts = sorted(f for f in os.listdir(cfg.save_root)
               if not f.endswith(".tmp")) \
    if os.path.isdir(cfg.save_root) else []  # .tmp: in-flight atomic write on the other host
print("RESULT " + json.dumps({
    "process": jax.process_index(),
    "n_global_devices": jax.device_count(),
    "checksum": checksum,
    "ckpts": ckpts,
}), flush=True)
"""


_HD_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["REPO_ROOT"])
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PROC_ID"]),
)
import numpy as np
from ctagan_tpu.train import build_trainer
from ctagan_tpu.utils.config import load_config

root = os.environ["CORPUS_ROOT"]
cfg = load_config(dict(
    name="HdGan", size=128,
    train_list=os.path.join(root, "train.txt"),
    val_list=os.path.join(root, "val.txt"),
    test_list=os.path.join(root, "test.txt"),
    save_root=os.path.join(root, "model") + "/",
    image_save=os.path.join(root, "img") + "/",
    n_epochs=1, decay_epoch=1, batchSize=1, n_cpu=1, val_every=1,
    data_parallel=True, seed=0,
))
t = build_trainer(cfg, quiet=True)
t.train(max_steps_per_epoch=2)
sums = {}
for net in ("g_params", "r_params", "d_params"):
    leaves = jax.tree.leaves(jax.device_get(getattr(t.state, net)))
    sums[net] = float(sum(np.float64(np.sum(np.asarray(x, np.float64))) for x in leaves))
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("ckpts-written")
ckpts = sorted(f for f in os.listdir(cfg.save_root)
               if not f.endswith(".tmp")) \
    if os.path.isdir(cfg.save_root) else []  # .tmp: in-flight atomic write on the other host
print("RESULT " + json.dumps({
    "process": jax.process_index(),
    "n_global_devices": jax.device_count(),
    "sums": sums,
    "ckpts": ckpts,
}), flush=True)
"""


def test_two_process_hd_stage1_end_to_end(tmp_path):
    """HD stage-1 (dual-window loader + RegNet + per-epoch resample) across
    a REAL 2-process jax.distributed cluster: all three nets must end
    bit-identically replicated on both hosts (VERDICT r1 #10)."""
    from ctagan_tpu.data.fixtures import make_corpus

    corpus_root = tmp_path / "corpus"
    lists = make_corpus(
        str(corpus_root), n_patients=3, slices_per_patient=4, size=128
    )
    # hard-example oversample lists: traind1 once + traind2 xU(3..5) —
    # exercises the per-epoch loader rebuild across processes
    train = lists["train"]
    with open(train) as f:
        head = f.readline().strip()
    for extra in ("traind1", "traind2"):
        with open(train.replace("train", extra), "w") as f:
            f.write(head + "\n")
    script = tmp_path / "worker_hd.py"
    script.write_text(_HD_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env_base = {
        **os.environ,
        "REPO_ROOT": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "COORD": coord,
        "CORPUS_ROOT": os.path.dirname(lists["train"]),
        "JAX_PLATFORMS": "cpu",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script)],
            env={**env_base, "PROC_ID": str(i)},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=560)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("2-process HD stage-1 run did not finish in time")
        outs.append(out)
    results = []
    for out, p in zip(outs, procs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        results.append(json.loads(line[len("RESULT "):]))
    r0 = [r for r in results if r["process"] == 0][0]
    r1 = [r for r in results if r["process"] == 1][0]
    assert r0["n_global_devices"] == 4
    for net in ("g_params", "r_params", "d_params"):
        a, b = r0["sums"][net], r1["sums"][net]
        assert abs(a - b) < 1e-6 * max(1.0, abs(a)), (net, a, b)
    assert r0["ckpts"] and r0["ckpts"] == r1["ckpts"]


def test_two_process_trainer_end_to_end(tmp_path):
    from ctagan_tpu.data.fixtures import make_corpus

    corpus_root = tmp_path / "corpus"
    lists = make_corpus(str(corpus_root), n_patients=3, slices_per_patient=4, size=32)
    # workers expect train/val/test.txt under CORPUS_ROOT
    for name, path in lists.items():
        assert os.path.basename(path) == f"{name}.txt", path
    script = tmp_path / "worker2.py"
    script.write_text(_TRAINER_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env_base = {
        **os.environ,
        "REPO_ROOT": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "COORD": coord,
        "CORPUS_ROOT": os.path.dirname(lists["train"]),
        "JAX_PLATFORMS": "cpu",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script)],
            env={**env_base, "PROC_ID": str(i)},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("2-process trainer run did not finish in time")
        outs.append(out)
    results = []
    for out, p in zip(outs, procs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        results.append(json.loads(line[len("RESULT "):]))
    r0 = [r for r in results if r["process"] == 0][0]
    r1 = [r for r in results if r["process"] == 1][0]
    assert r0["n_global_devices"] == 4
    # replicated params: both hosts hold identical state after the all-reduce
    assert abs(r0["checksum"] - r1["checksum"]) < 1e-6 * max(1, abs(r0["checksum"]))
    # host-0-only checkpoint convention (shared storage: both see the files)
    assert r0["ckpts"] and r0["ckpts"] == r1["ckpts"]


_FSDP_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["REPO_ROOT"])
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PROC_ID"]),
)
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from ctagan_tpu.parallel.fsdp import state_bytes_per_device
from ctagan_tpu.train import build_trainer
from ctagan_tpu.utils.config import load_config

root = os.environ["CORPUS_ROOT"]
cfg = load_config(dict(
    name="P2p", size=32,
    train_list=os.path.join(root, "train.txt"),
    val_list=os.path.join(root, "val.txt"),
    test_list=os.path.join(root, "test.txt"),
    save_root=os.path.join(root, "model_fsdp") + "/",
    image_save=os.path.join(root, "img_fsdp") + "/",
    n_epochs=1, decay_epoch=1, batchSize=1, n_cpu=1, val_every=99,
    mesh={"fsdp": 4}, seed=0,
))
t = build_trainer(cfg, quiet=True)
assert t.plan.kind == "fsdp" and t.batch_scale == 4, (t.plan.kind, t.batch_scale)
total = sum(
    x.nbytes for x in jax.tree.leaves(t.state) if hasattr(x, "nbytes")
)
peak = state_bytes_per_device(t.state)
assert peak < total / 2, (peak, total)  # ZeRO-3 layout really sharded
t.train(max_steps_per_epoch=2)
# gather the sharded params to a replicated layout (the all-gather crosses
# the process boundary); device_get of the replicated result is local
rep = NamedSharding(t.mesh, P())
gathered = jax.jit(lambda tr: tr, out_shardings=rep)(t.state.g_params)
leaves = jax.tree.leaves(jax.device_get(gathered))
checksum = float(sum(np.float64(np.sum(np.asarray(x, np.float64))) for x in leaves))
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("ckpts-written")
ckpts = sorted(f for f in os.listdir(cfg.save_root)
               if not f.endswith(".tmp")) \
    if os.path.isdir(cfg.save_root) else []
print("RESULT " + json.dumps({
    "process": jax.process_index(),
    "n_global_devices": jax.device_count(),
    "state_frac": peak / total,
    "checksum": checksum,
    "ckpts": ckpts,
}), flush=True)
"""


_TP_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["REPO_ROOT"])
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PROC_ID"]),
)
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from ctagan_tpu.train import build_trainer
from ctagan_tpu.utils.config import load_config

root = os.environ["CORPUS_ROOT"]
cfg = load_config(dict(
    name="HdGan", size=128,
    train_list=os.path.join(root, "train.txt"),
    val_list=os.path.join(root, "val.txt"),
    test_list=os.path.join(root, "test.txt"),
    save_root=os.path.join(root, "model_tp") + "/",
    image_save=os.path.join(root, "img_tp") + "/",
    n_epochs=1, decay_epoch=1, batchSize=1, n_cpu=1, val_every=99,
    mesh={"tp": 4}, seed=0,
))
t = build_trainer(cfg, quiet=True)
assert t.plan.kind == "tp" and t.batch_scale == 1, (t.plan.kind, t.batch_scale)
# the Megatron layout really crosses the process boundary: a body conv1
# kernel and a ResUNet resblock conv1 kernel are channel-sharded over all
# 4 devices (2 per host)
gk = t.state.g_params["params"]["ResidualBlock_0"]["ConvTorch_0"]["Conv_0"]["kernel"]
rk = t.state.r_params["params"]["down_1"]["RegResnetBlock_0"]["ConvTorch_0"]["Conv_0"]["kernel"]
assert not gk.sharding.is_fully_replicated
assert not rk.sharding.is_fully_replicated
t.train(max_steps_per_epoch=2)
rep = NamedSharding(t.mesh, P())
sums = {}
for net in ("g_params", "r_params", "d_params"):
    gathered = jax.jit(lambda tr: tr, out_shardings=rep)(getattr(t.state, net))
    leaves = jax.tree.leaves(jax.device_get(gathered))
    sums[net] = float(sum(np.float64(np.sum(np.asarray(x, np.float64))) for x in leaves))
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("ckpts-written")
ckpts = sorted(f for f in os.listdir(cfg.save_root)
               if not f.endswith(".tmp")) \
    if os.path.isdir(cfg.save_root) else []
print("RESULT " + json.dumps({
    "process": jax.process_index(),
    "n_global_devices": jax.device_count(),
    "sums": sums,
    "ckpts": ckpts,
}), flush=True)
"""


def test_two_process_tp_trainer_end_to_end(tmp_path):
    """VERDICT r4 #8: a model-sharded axis beyond FSDP crosses a REAL
    2-process jax.distributed cluster — `mesh: {tp: 4}` on the flagship HD
    three-net step, generator Megatron-sharded AND ResUNet resblocks
    channel-sharded across the process boundary, batch REPLICATED (both
    hosts must feed the same samples — the loader's disjoint-shard mode
    applies only when batch_scale > 1), host-0 checkpointing of the
    all-gathered canonical state."""
    from ctagan_tpu.data.fixtures import make_corpus

    corpus_root = tmp_path / "corpus"
    lists = make_corpus(
        str(corpus_root), n_patients=3, slices_per_patient=4, size=128
    )
    script = tmp_path / "worker_tp.py"
    script.write_text(_TP_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env_base = {
        **os.environ,
        "REPO_ROOT": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "COORD": coord,
        "CORPUS_ROOT": os.path.dirname(lists["train"]),
        "JAX_PLATFORMS": "cpu",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script)],
            env={**env_base, "PROC_ID": str(i)},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=560)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("2-process tp run did not finish in time")
        outs.append(out)
    results = []
    for out, p in zip(outs, procs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        results.append(json.loads(line[len("RESULT "):]))
    r0 = [r for r in results if r["process"] == 0][0]
    r1 = [r for r in results if r["process"] == 1][0]
    assert r0["n_global_devices"] == 4
    for net in ("g_params", "r_params", "d_params"):
        a, b = r0["sums"][net], r1["sums"][net]
        assert abs(a - b) < 1e-6 * max(1.0, abs(a)), (net, a, b)
    assert r0["ckpts"] and r0["ckpts"] == r1["ckpts"]


def test_two_process_fsdp_trainer_end_to_end(tmp_path):
    """`mesh: {fsdp: 4}` across a REAL 2-process jax.distributed cluster:
    the DCN-scale-out ZeRO-3 convention — state sharded across process
    boundaries (1/4 per device), per-process local batch feed assembled
    into the global array, GSPMD all-gathers crossing the processes, and
    host-0 checkpointing of the gathered canonical state."""
    from ctagan_tpu.data.fixtures import make_corpus

    corpus_root = tmp_path / "corpus"
    lists = make_corpus(str(corpus_root), n_patients=3, slices_per_patient=4, size=32)
    script = tmp_path / "worker_fsdp.py"
    script.write_text(_FSDP_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env_base = {
        **os.environ,
        "REPO_ROOT": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "COORD": coord,
        "CORPUS_ROOT": os.path.dirname(lists["train"]),
        "JAX_PLATFORMS": "cpu",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script)],
            env={**env_base, "PROC_ID": str(i)},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("2-process fsdp run did not finish in time")
        outs.append(out)
    results = []
    for out, p in zip(outs, procs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        results.append(json.loads(line[len("RESULT "):]))
    r0 = [r for r in results if r["process"] == 0][0]
    r1 = [r for r in results if r["process"] == 1][0]
    assert r0["n_global_devices"] == 4
    assert r0["state_frac"] < 0.5 and r1["state_frac"] < 0.5
    # the gathered canonical params agree bit-for-bit across hosts
    assert abs(r0["checksum"] - r1["checksum"]) < 1e-6 * max(1, abs(r0["checksum"]))
    assert r0["ckpts"] and r0["ckpts"] == r1["ckpts"]
