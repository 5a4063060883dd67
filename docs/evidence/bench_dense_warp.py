"""A/B on real TPU: HD stage-1 train step 512² b=1 bf16 — warp_impl dense
(exact ring warp, scatter-free custom VJP) vs gather (XLA scatter backward).

Also isolates the warp fwd+bwd cost at 512². Pipelined methodology
(CLAUDE.md). Run detached: nohup python docs/evidence/bench_dense_warp.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from ctagan_tpu.models import Discriminator, Generator, RegNet
from ctagan_tpu.ops.warp import warp2d, warp2d_adaptive, warp2d_dense
from ctagan_tpu.train import steps


def bench_step(warp_impl: str, iters: int = 10, size: int = 512):
    g = Generator(1, 1, dtype=jnp.bfloat16)
    r = RegNet(1, 1, dtype=jnp.bfloat16)
    d = Discriminator(1, dtype=jnp.bfloat16)
    state, tx = steps.init_reg_state(g, r, d, jax.random.PRNGKey(0), size)
    cfg = {
        "Adv_lamda1": 1.0, "Corr_lamda1": 20.0, "Corr_lamda2": 2.0,
        "Smooth_lamda": 10.0, "Adv_lamda": 1.0, "Corr_lamda": 20.0,
        "noise_level": 1, "warp_impl": warp_impl,
    }

    @jax.jit
    def step(state, batch, lr):
        return steps.reg_train_step(
            g, r, d, tx, cfg, state, batch, lr, dual_window_mode=True
        )

    rng = np.random.default_rng(0)
    batch = {
        k: jnp.asarray(rng.uniform(-1, 1, (1, size, size, 1)).astype(np.float32))
        for k in ("A2", "B1", "B2")
    }
    lr = jnp.float32(1e-4)
    state, losses = step(state, batch, lr)
    float(losses["toal_loss"])
    state, losses = step(state, batch, lr)
    float(losses["toal_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = step(state, batch, lr)
    float(losses["toal_loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"HD step warp_impl={warp_impl}: {dt*1e3:.1f} ms "
          f"({1/dt:.2f} steps/s)", flush=True)


def bench_warp_only(impl, iters: int = 30, size: int = 512):
    rng = np.random.default_rng(0)
    src = jnp.asarray(
        rng.uniform(-1, 1, (1, size, size, 1)).astype(np.float32)
    )
    flow = jnp.asarray(
        (rng.standard_normal((1, size, size, 2)) * 1.5).astype(np.float32)
    )
    fn = {"dense": warp2d_dense, "gather": warp2d, "adaptive": warp2d_adaptive}[impl]

    @jax.jit
    def fwdbwd(s, f):
        out, vjp = jax.vjp(fn, s, f)
        ds, df = vjp(jnp.ones_like(out))
        return out, ds, df

    o, ds, df = fwdbwd(src, flow)
    float(ds[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        o, ds, df = fwdbwd(src, flow)
    float(ds[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    print(f"warp fwd+bwd impl={impl}: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    bench_warp_only("gather")
    bench_warp_only("dense")
    bench_step("gather")
    bench_step("dense")
