"""(a) donate_argnums A/B on the HD train step, (b) tap-gate threshold
probe (b=2/4), (c) perf-mode ladder refresh with taps+adaptive defaults."""
import time
import numpy as np
import jax, jax.numpy as jnp
from ctagan_tpu.models import Discriminator, Generator, RegNet
from ctagan_tpu.train import steps

def make(size=512, perf=False):
    g = Generator(1, 1, dtype=jnp.bfloat16)
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
    return fn, state, batch

def bench(tag, jitted, state, batch, iters=10):
    state, losses = jitted(state, batch, jnp.float32(1e-4)); float(losses["toal_loss"])
    state, losses = jitted(state, batch, jnp.float32(1e-4)); float(losses["toal_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = jitted(state, batch, jnp.float32(1e-4))
    float(losses["toal_loss"])
    dt = (time.perf_counter()-t0)/iters
    print(f"{tag}: {dt*1e3:.1f} ms ({1/dt:.2f} steps/s)", flush=True)

print("devices:", jax.devices(), flush=True)

fn, state, batch = make()
bench("HD step default (no donate)", jax.jit(fn), state, batch)
try:
    fn2, state2, batch2 = make()
    bench("HD step donate_argnums=0", jax.jit(fn2, donate_argnums=0), state2, batch2)
except Exception as e:
    print("donation failed:", repr(e), flush=True)

fnp, statep, batchp = make(perf=True)
bench("HD step perf-mode (warp_max_disp=4, reg_ds=2)", jax.jit(fnp), statep, batchp)

# tap threshold probe
def bench_fwd(tap, batch_n, iters=20):
    model = Generator(1, 1, dtype=jnp.bfloat16, tap_heads=tap, fused_body=True)
    params = Generator(1, 1).init(jax.random.PRNGKey(0), jnp.zeros((1,512,512,1)))
    fwd = jax.jit(lambda x: model.apply(params, x))
    x = jnp.asarray(np.random.default_rng(0).uniform(-1,1,(batch_n,512,512,1)).astype(np.float32))
    float(fwd(x)[0,0,0,0]); float(fwd(x)[0,0,0,0])
    t0 = time.perf_counter()
    for _ in range(iters): out = fwd(x)
    float(out[0,0,0,0])
    dt = (time.perf_counter()-t0)/iters
    print(f"fwd taps={tap} b={batch_n}: {dt*1e3:.1f} ms = {batch_n/dt:.1f} sl/s", flush=True)

for b in (2, 4):
    bench_fwd(True, b)
    bench_fwd(False, b)
