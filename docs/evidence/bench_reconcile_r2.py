"""VERDICT r1 #2: reconcile the HD train-step bench.

BENCH_r01 recorded 125.45 ms for the default HD step while the donation-
ladder harness (same code, same config) measured 96.9 ms. The only
structural difference: bench.py times the train step AFTER bench_inference
ran b=32 fused-forward work in the SAME process. This script measures:

  (a) HD step FIRST in the process (ladder conditions)
  (b) HD step again after a b=32 fused inference warmup (bench.py
      conditions)
  (c) HD step with fused_body_grad=True (the r2 custom-VJP body)
  (d) perf-mode step (sanity anchor: should be ~67 ms either way)
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from ctagan_tpu.models import Discriminator, Generator, RegNet
from ctagan_tpu.train import steps

def make(size=512, perf=False, fused_grad=False):
    g = Generator(1, 1, dtype=jnp.bfloat16, fused_body_grad=fused_grad)
    r = RegNet(1, 1, dtype=jnp.bfloat16)
    d = Discriminator(1, dtype=jnp.bfloat16)
    state, tx = steps.init_reg_state(g, r, d, jax.random.PRNGKey(0), size)
    cfg = {"Adv_lamda1": 1.0, "Corr_lamda1": 20.0, "Corr_lamda2": 2.0,
           "Smooth_lamda": 10.0, "Adv_lamda": 1.0, "Corr_lamda": 20.0,
           "noise_level": 1}
    if perf:
        cfg["warp_max_disp"] = 4; cfg["reg_downsample"] = 2
    fn = lambda s, b, lr: steps.reg_train_step(g, r, d, tx, cfg, s, b, lr, dual_window_mode=True)
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(rng.uniform(-1,1,(1,size,size,1)).astype(np.float32))
             for k in ("A2","B1","B2")}
    return jax.jit(fn), state, batch

def bench(tag, jitted, state, batch, iters=10):
    state, losses = jitted(state, batch, jnp.float32(1e-4)); float(losses["toal_loss"])
    state, losses = jitted(state, batch, jnp.float32(1e-4)); float(losses["toal_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = jitted(state, batch, jnp.float32(1e-4))
    float(losses["toal_loss"])
    dt = (time.perf_counter()-t0)/iters
    print(f"{tag}: {dt*1e3:.1f} ms ({1/dt:.2f} steps/s)", flush=True)
    return dt

print("devices:", jax.devices(), flush=True)

# (a) train step first
fn, st, b = make()
bench("(a) HD step default, fresh process", fn, st, b)

# (b) after inference warmup, as bench.py does
model = Generator(1, 1, dtype=jnp.bfloat16, fused_body=True)
params = Generator(1, 1).init(jax.random.PRNGKey(0), jnp.zeros((1,512,512,1)))
fwd = jax.jit(lambda p, x: model.apply(p, x))
x32 = jnp.asarray(np.random.default_rng(0).uniform(-1,1,(32,512,512,1)).astype(np.float32))
float(fwd(params, x32)[0,0,0,0]); float(fwd(params, x32)[0,0,0,0])
t0 = time.perf_counter()
for _ in range(20): out = fwd(params, x32)
float(out[0,0,0,0])
print(f"inference b=32: {(time.perf_counter()-t0)/20*1e3:.1f} ms", flush=True)
fn2, st2, b2 = make()
bench("(b) HD step default, after inference", fn2, st2, b2)

# (c) fused_body_grad
fn3, st3, b3 = make(fused_grad=True)
bench("(c) HD step fused_body_grad", fn3, st3, b3)

# (d) perf mode
fn4, st4, b4 = make(perf=True)
bench("(d) HD step perf-mode", fn4, st4, b4)
