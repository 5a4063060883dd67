"""A/B: RegNet tap_convs (tap-decomposed 2->32 input conv + 32->2 flow
head) at 512^2 b=1 bf16 — R fwd, R fwd+bwd, and the full HD stage-1 step.

Run AFTER the quality run frees the chip; never concurrently.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from ctagan_tpu.models import Discriminator, Generator, RegNet
from ctagan_tpu.train import steps

SIZE = 512
rng = np.random.default_rng(0)


def timeit(tag, fn, *args, iters=20, loops=3):
    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    best = np.inf
    for _ in range(loops):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{tag}: {best * 1e3:.2f} ms", flush=True)
    return best


print("devices:", jax.devices(), flush=True)

x = jnp.asarray(rng.uniform(-1, 1, (1, SIZE, SIZE, 1)).astype(np.float32), jnp.bfloat16)
y = jnp.asarray(rng.uniform(-1, 1, (1, SIZE, SIZE, 1)).astype(np.float32), jnp.bfloat16)

for taps in (False, True):
    r = RegNet(1, 1, dtype=jnp.bfloat16, tap_convs=taps)
    rp = r.init(jax.random.PRNGKey(1), x, y)
    tag = "taps" if taps else "direct"
    timeit(f"R fwd [{tag}]", jax.jit(lambda p, a, b, r=r: r.apply(p, a, b)), rp, x, y)
    timeit(f"R fwd+bwd [{tag}]", jax.jit(lambda p, a, b, r=r: jax.grad(
        lambda q: jnp.mean(jnp.square(r.apply(q, a, b).astype(jnp.float32))))(p)), rp, x, y)


def make(taps, fused_grad=True):
    gg = Generator(1, 1, dtype=jnp.bfloat16, fused_body_grad=fused_grad)
    rr = RegNet(1, 1, dtype=jnp.bfloat16, tap_convs=taps)
    dd = Discriminator(1, dtype=jnp.bfloat16)
    state, tx = steps.init_reg_state(gg, rr, dd, jax.random.PRNGKey(0), SIZE)
    cfg = {"Adv_lamda1": 1.0, "Corr_lamda1": 20.0, "Corr_lamda2": 2.0,
           "Smooth_lamda": 10.0, "Adv_lamda": 1.0, "Corr_lamda": 20.0,
           "noise_level": 1}
    fn = jax.jit(lambda s, b, lr: steps.reg_train_step(
        gg, rr, dd, tx, cfg, s, b, lr, dual_window_mode=True))
    batch = {k: jnp.asarray(rng.uniform(-1, 1, (1, SIZE, SIZE, 1)).astype(np.float32))
             for k in ("A2", "B1", "B2")}
    return fn, state, batch


def bench_step(tag, fn, state, batch, iters=10, loops=3):
    state, losses = fn(state, batch, jnp.float32(1e-4))
    float(losses["toal_loss"])
    best = np.inf
    for _ in range(loops):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, losses = fn(state, batch, jnp.float32(1e-4))
        float(losses["toal_loss"])
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{tag}: {best * 1e3:.2f} ms ({1 / best:.2f} steps/s)", flush=True)


for taps in (False, True):
    tag = "taps" if taps else "direct"
    fn, st, b = make(taps, fused_grad=False)
    bench_step(f"FULL default step [{tag}]", fn, st, b)
    fn, st, b = make(taps, fused_grad=True)
    bench_step(f"FULL fused_body_grad step [{tag}]", fn, st, b)
