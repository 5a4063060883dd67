"""Measure grad_accum overhead on the HD stage-1 train step (512² bf16).

A/B on hardware: batch 4 full-batch vs grad_accum {2,4} on the same batch —
the feature trades activation memory for scan sequentialization; this
records the wall-clock cost so the config doc can state it.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
    docs/evidence/bench_grad_accum_r2e.py > docs/evidence/bench_grad_accum_r2e.log 2>&1 &
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ctagan_tpu.models import Discriminator, Generator, RegNet
from ctagan_tpu.train import steps

SIZE = 512
BATCH = 4
DT = jnp.bfloat16


def main():
    print("backend:", jax.default_backend(), flush=True)
    g = Generator(1, 1, dtype=DT)
    r = RegNet(1, 1, dtype=DT)
    d = Discriminator(1, dtype=DT)
    state, tx = steps.init_reg_state(g, r, d, jax.random.PRNGKey(0), SIZE)
    rng = np.random.default_rng(0)
    batch = {
        k: jnp.asarray(
            rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 1)).astype(np.float32)
        )
        for k in ("A2", "B1", "B2")
    }
    lr = jnp.float32(1e-4)

    base = {
        "Adv_lamda1": 1.0, "Corr_lamda1": 20.0, "Corr_lamda2": 2.0,
        "Smooth_lamda": 10.0, "Adv_lamda": 1.0, "Corr_lamda": 20.0,
        "noise_level": 1,
    }
    for accum in (1, 2, 4):
        cfg = dict(base, grad_accum=accum)
        step = jax.jit(partial(
            steps.reg_train_step, g, r, d, tx, cfg, dual_window_mode=True
        ))
        st = state
        # warm + compile
        st2, losses = step(st, batch, lr, lr_d=lr)
        _ = float(losses["toal_loss"])
        best = float("inf")
        for _rep in range(3):
            st_i = state
            t0 = time.perf_counter()
            n = 10
            for _ in range(n):
                st_i, losses = step(st_i, batch, lr, lr_d=lr)
            _ = float(losses["toal_loss"])  # sync by pulling a scalar
            dt = (time.perf_counter() - t0) / n * 1e3
            best = min(best, dt)
        print(
            f"grad_accum={accum}: {best:.1f} ms/step (batch {BATCH} @ {SIZE}²)"
            f" toal_loss={float(losses['toal_loss']):.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
