"""Refreshed HD train-step perf ladder (r2c): joint-affine baseline +
d_refwd reuse + fused_body_grad + perf-mode stack. 512² b=1 bf16,
pipelined best-of-3 (bench.py methodology). Run SERIALIZED on hardware.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from ctagan_tpu.models import Discriminator, Generator, RegNet
from ctagan_tpu.train import steps

print("devices:", jax.devices(), flush=True)
SIZE = 512
BASE = {
    "Adv_lamda1": 1.0, "Corr_lamda1": 20.0, "Corr_lamda2": 2.0,
    "Smooth_lamda": 10.0, "Adv_lamda": 1.0, "Corr_lamda": 20.0,
    "noise_level": 1,
}


def bench(tag, fused_grad=False, **cfg_extra):
    g = Generator(1, 1, dtype=jnp.bfloat16, fused_body_grad=fused_grad)
    r = RegNet(1, 1, dtype=jnp.bfloat16)
    d = Discriminator(1, dtype=jnp.bfloat16)
    state, tx = steps.init_reg_state(g, r, d, jax.random.PRNGKey(0), SIZE)
    cfg = dict(BASE, **cfg_extra)

    @jax.jit
    def step(state, batch, lr):
        return steps.reg_train_step(
            g, r, d, tx, cfg, state, batch, lr, dual_window_mode=True
        )

    rng = np.random.default_rng(0)
    batch = {
        k: jnp.asarray(rng.uniform(-1, 1, (1, SIZE, SIZE, 1)).astype(np.float32))
        for k in ("A2", "B1", "B2")
    }
    lr = jnp.float32(1e-4)
    state, losses = step(state, batch, lr)
    float(losses["toal_loss"])
    state, losses = step(state, batch, lr)
    float(losses["toal_loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            state, losses = step(state, batch, lr)
        float(losses["toal_loss"])
        best = min(best, (time.perf_counter() - t0) / 10)
    print(f"{tag}: {best * 1e3:.2f} ms ({1 / best:.2f} steps/s)", flush=True)


bench("exact default (joint affine)")
bench("exact + d_refwd=false", d_refwd=False)
bench("fused_body_grad", fused_grad=True)
bench("fused_body_grad + d_refwd=false", fused_grad=True, d_refwd=False)
bench(
    "perf-mode (warp4+regds2) + fused_grad + d_refwd=false",
    fused_grad=True, d_refwd=False, warp_max_disp=4, reg_downsample=2,
)
