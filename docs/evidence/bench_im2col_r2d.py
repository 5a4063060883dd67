"""A/B ladder: RegNet reg_im2col_levels (top-k levels' 3x3 convs as im2col
matmuls) at 512^2 b=1 bf16 — R fwd+bwd and the full HD stage-1 step.
tap_convs stays on (auto) in all variants.

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

r0 = RegNet(1, 1, dtype=jnp.bfloat16)
rp = r0.init(jax.random.PRNGKey(1), x, y)

for lv in (0, 1, 2, 3):
    r = RegNet(1, 1, dtype=jnp.bfloat16, im2col_levels=lv)
    timeit(f"R fwd [im2col_levels={lv}]",
           jax.jit(lambda p, a, b, r=r: r.apply(p, a, b)), rp, x, y)
    timeit(f"R fwd+bwd [im2col_levels={lv}]",
           jax.jit(lambda p, a, b, r=r: jax.grad(
               lambda q: jnp.mean(jnp.square(r.apply(q, a, b).astype(jnp.float32))))(p)),
           rp, x, y)


def make(lv, fused_grad=True):
    gg = Generator(1, 1, dtype=jnp.bfloat16, fused_body_grad=fused_grad)
    rr = RegNet(1, 1, dtype=jnp.bfloat16, im2col_levels=lv)
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


best_lv = None
for lv in (0, 1, 2):
    fn, st, b = make(lv, fused_grad=True)
    bench_step(f"FULL fused_body_grad step [im2col_levels={lv}]", fn, st, b)
for lv in (0, 1, 2):
    fn, st, b = make(lv, fused_grad=False)
    bench_step(f"FULL default step [im2col_levels={lv}]", fn, st, b)
