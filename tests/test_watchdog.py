"""Stall watchdog + supervisor (utils/watchdog.py) and trainer wiring."""
import time

from ctagan_tpu.utils.watchdog import STALL_EXIT_CODE, Watchdog, supervise


def test_watchdog_fires_on_stall():
    fired = []
    wd = Watchdog(0.2, on_stall=lambda: fired.append(1), poll_s=0.05)
    with wd:
        time.sleep(0.5)
    assert fired


def test_watchdog_heartbeat_prevents_fire():
    fired = []
    wd = Watchdog(0.3, on_stall=lambda: fired.append(1), poll_s=0.05)
    with wd:
        for _ in range(10):
            wd.beat()
            time.sleep(0.08)
    assert not fired


def test_watchdog_pause_suspends_detection():
    fired = []
    wd = Watchdog(0.2, on_stall=lambda: fired.append(1), poll_s=0.05)
    with wd:
        wd.pause()
        time.sleep(0.5)  # well past timeout, but paused
        assert not fired
        wd.resume()
        wd.beat()
    assert not fired


def test_supervise_restarts_with_resume_then_succeeds():
    calls = []

    def fake_run(cmd):
        calls.append(list(cmd))
        # first attempt stall-killed, second crashes, third succeeds
        return {1: STALL_EXIT_CODE, 2: 1}.get(len(calls), 0)

    rc = supervise(["prog", "--config", "c.yaml"], max_restarts=3, run=fake_run)
    assert rc == 0
    assert len(calls) == 3
    assert "--resume" not in calls[0]
    assert "--resume" in calls[1] and "--resume" in calls[2]


def test_supervise_gives_up_after_max_restarts():
    calls = []

    def fake_run(cmd):
        calls.append(cmd)
        return 7

    rc = supervise(["prog"], max_restarts=2, run=fake_run)
    assert rc == 7
    assert len(calls) == 3  # initial + 2 restarts


def test_trainer_arms_and_disarms_watchdog(tmp_path):
    """A short CPU training run with stall_timeout armed completes cleanly
    (no false fire) and tears the watchdog down."""
    from ctagan_tpu.data.fixtures import make_corpus
    from ctagan_tpu.train import build_trainer
    from ctagan_tpu.utils.config import load_config

    root = str(tmp_path)
    # >= 8 train slices: the 8-virtual-device mesh makes the global batch 8
    lists = make_corpus(root, n_patients=6, slices_per_patient=6, size=64)
    cfg = load_config(dict(
        name="P2p", size=64, batchSize=1, n_epochs=1, decay_epoch=1,
        save_root=root + "/save/", image_save=root + "/img/",
        train_list=lists["train"], val_list=lists["val"],
        test_list=lists["test"], n_cpu=0, seed=0, val_every=5,
        stall_timeout=120.0,
    ))
    tr = build_trainer(cfg)
    tr.quiet = True
    tr.train(max_steps_per_epoch=2)
    assert tr._watchdog is None  # disarmed on exit


import pytest


@pytest.mark.slow
def test_supervised_run_recovers_from_wedge(tmp_path):
    """Full-loop failure drill: a training run that WEDGES mid-epoch (step
    timer patched to hang once, simulating the observed stuck device call)
    is killed by the stall watchdog (exit 42) and the supervisor relaunches
    it with --resume; the retry completes. Exercises train.py end-to-end."""
    import os
    import subprocess
    import sys

    from ctagan_tpu.data.fixtures import make_corpus

    root = str(tmp_path)
    # the subprocess inherits conftest's 8-virtual-device XLA_FLAGS: the
    # global batch is 8, so the corpus needs >= 8 training slices
    lists = make_corpus(root, n_patients=6, slices_per_patient=6, size=64)
    import yaml

    cfg = dict(
        name="P2p", size=64, batchSize=1, n_epochs=1, decay_epoch=1,
        save_root=root + "/save/", image_save=root + "/img/",
        train_list=lists["train"], val_list=lists["val"],
        test_list=lists["test"], n_cpu=0, seed=0, val_every=9,
        # 45s: past what a loaded CI box needs between beats (a 20s timeout
        # produced false stall-kills during per-step checkpoint writes when
        # the full suite ran concurrently) but far below the 600s wedge
        stall_timeout=45.0, checkpoint_every_iters=1,
    )
    cfgp = os.path.join(root, "cfg.yaml")
    yaml.safe_dump(cfg, open(cfgp, "w"))
    marker = os.path.join(root, "wedged_once")
    # interpose via a sitecustomize shadow (auto-imported by every
    # python process, so it survives the supervisor's re-exec of train.py —
    # a wrapper script would be dropped from the relaunch command; and
    # usercustomize is skipped in venvs): the first StepTimer.tick of the
    # first attempt hangs, simulating the wedge
    hook_dir = os.path.join(root, "hook")
    os.makedirs(hook_dir)
    open(os.path.join(hook_dir, "sitecustomize.py"), "w").write(
        "import os, time\n"
        "if os.environ.get('WEDGE_MARKER'):\n"
        "    import ctagan_tpu.utils.profiling as prof\n"
        "    _orig = prof.StepTimer.tick\n"
        "    def tick(self):\n"
        "        m = os.environ['WEDGE_MARKER']\n"
        "        if not os.path.exists(m):\n"
        "            open(m, 'w').write('x')\n"
        "            time.sleep(600)  # wedge: the watchdog must kill us\n"
        "        _orig(self)\n"
        "    prof.StepTimer.tick = tick\n"
    )
    env = dict(
        os.environ,
        PYTHONPATH=hook_dir + ":/root/repo:"
        + os.environ.get("PYTHONPATH", ""),
        JAX_PLATFORMS="cpu",
        WEDGE_MARKER=marker,
    )
    r = subprocess.run(
        [sys.executable, os.path.join("/root/repo", "train.py"),
         "--config", cfgp, "--mode", "train",
         "--max-steps", "2", "--supervise", "2"],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "[watchdog] no heartbeat" in r.stderr
    assert "[supervise] attempt 1 exited 42" in r.stderr
    assert os.path.exists(marker)  # the wedge really happened
