"""HD train-step segment breakdown at 512^2 b=1 bf16 (post-eval-fix, r2).

Locates the remaining cost in the fused-grad step (measured 83.6 ms; the
VERDICT r1 #3 target is <=80 ms): times each segment's fwd and fwd+bwd in
isolation (CAUTION: isolated segments overstate in-graph cost ~1.5-3x at
large batch — at b=1 overlap is minimal so the split is meaningful), then
the full default / fused-grad / perf-mode steps.

Run AFTER the quality run frees the chip; never concurrently.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from ctagan_tpu.models import Discriminator, Generator, RegNet
from ctagan_tpu.ops.warp import warp2d_adaptive
from ctagan_tpu.ops.losses import l1 as l1_loss
from ctagan_tpu.train import steps

SIZE = 512
rng = np.random.default_rng(0)


def timeit(tag, fn, *args, iters=20, loops=3):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
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

g = Generator(1, 1, dtype=jnp.bfloat16)
gp = g.init(jax.random.PRNGKey(0), x)
r = RegNet(1, 1, dtype=jnp.bfloat16)
rp = r.init(jax.random.PRNGKey(1), x, y)
d = Discriminator(1, dtype=jnp.bfloat16)
dp = d.init(jax.random.PRNGKey(2), x)

flow = jax.jit(lambda p, a, b: r.apply(p, a, b))(rp, x, y)

# --- forwards
timeit("G fwd", jax.jit(lambda p, a: g.apply(p, a)), gp, x)
timeit("R fwd", jax.jit(lambda p, a, b: r.apply(p, a, b)), rp, x, y)
timeit("D fwd", jax.jit(lambda p, a: d.apply(p, a)), dp, x)
timeit("warp fwd", jax.jit(lambda a, f: warp2d_adaptive(a, f)), x, flow)

# --- fwd+bwd per segment (L1 head so each has a scalar loss)
timeit("G fwd+bwd", jax.jit(lambda p, a: jax.grad(
    lambda q: l1_loss(g.apply(q, a), 0.5 * a).astype(jnp.float32))(p)), gp, x)
g_fused = Generator(1, 1, dtype=jnp.bfloat16, fused_body_grad=True)
timeit("G fwd+bwd (fused_body_grad)", jax.jit(lambda p, a: jax.grad(
    lambda q: l1_loss(g_fused.apply(q, a), 0.5 * a).astype(jnp.float32))(p)), gp, x)
timeit("R fwd+bwd", jax.jit(lambda p, a, b: jax.grad(
    lambda q: jnp.mean(jnp.square(r.apply(q, a, b).astype(jnp.float32))))(p)), rp, x, y)
timeit("D fwd+bwd", jax.jit(lambda p, a: jax.grad(
    lambda q: jnp.mean(jnp.square(d.apply(q, a).astype(jnp.float32))))(p)), dp, x)
timeit("warp fwd+bwd (adaptive)", jax.jit(lambda a, f: jax.grad(
    lambda q: jnp.sum(warp2d_adaptive(q, f).astype(jnp.float32)))(a)), x, flow)

# --- full steps
def make(fused_grad=False, perf=False):
    gg = Generator(1, 1, dtype=jnp.bfloat16, fused_body_grad=fused_grad)
    state, tx = steps.init_reg_state(gg, r, d, jax.random.PRNGKey(0), SIZE)
    cfg = {"Adv_lamda1": 1.0, "Corr_lamda1": 20.0, "Corr_lamda2": 2.0,
           "Smooth_lamda": 10.0, "Adv_lamda": 1.0, "Corr_lamda": 20.0,
           "noise_level": 1}
    if perf:
        cfg["warp_max_disp"] = 4
        cfg["reg_downsample"] = 2
    fn = jax.jit(lambda s, b, lr: steps.reg_train_step(
        gg, r, d, tx, cfg, s, b, lr, dual_window_mode=True))
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


fn, st, b = make()
bench_step("FULL default step", fn, st, b)
fn, st, b = make(fused_grad=True)
bench_step("FULL fused_body_grad step", fn, st, b)
fn, st, b = make(perf=True)
bench_step("FULL perf-mode step", fn, st, b)

# --- RegNet depth ladder: locate the cost by truncating the U-Net at k
# levels (down-only prefix + matching up path is complex; instead time
# (a) down path prefixes and (b) isolated per-level pieces).
from flax import linen as nn
from ctagan_tpu.models.layers import RegConv, RegResnetBlock, max_pool


class DownPrefix(nn.Module):
    k: int
    @nn.compact
    def __call__(self, xx):
        from ctagan_tpu.models.reg import NDF
        for i in range(self.k):
            xx = RegConv(NDF[i], 3, 1, 1, activation="leaky_relu",
                         use_resnet=True, dtype=jnp.bfloat16,
                         name=f"down_{i+1}")(xx)
            xx = max_pool(xx, 2)
        return xx


x2 = jnp.concatenate([x, y], axis=-1)
for k in (1, 2, 3, 7):
    m = DownPrefix(k)
    p = m.init(jax.random.PRNGKey(0), x2)
    timeit(f"R down-prefix k={k} fwd", jax.jit(lambda p, a, m=m: m.apply(p, a)), p, x2)
    timeit(f"R down-prefix k={k} fwd+bwd", jax.jit(lambda p, a, m=m: jax.grad(
        lambda q: jnp.mean(jnp.square(m.apply(q, a).astype(jnp.float32))))(p)), p, x2)

# isolated pool fwd+bwd at the top size (the SelectAndScatter suspect —
# after the reshape-form fix this should be ~free)
xp = jnp.asarray(rng.uniform(-1, 1, (1, SIZE, SIZE, 32)).astype(np.float32), jnp.bfloat16)
timeit("max_pool 512^2x32 fwd+bwd", jax.jit(lambda a: jax.grad(
    lambda q: jnp.sum(max_pool(q, 2).astype(jnp.float32)))(a)), xp)

# isolated bilinear-resize up fwd+bwd at the top size
from ctagan_tpu.ops.resize import interpolate_bilinear
xu = jnp.asarray(rng.uniform(-1, 1, (1, SIZE // 2, SIZE // 2, 64)).astype(np.float32), jnp.bfloat16)
timeit("bilinear up 256->512 x64 fwd+bwd", jax.jit(lambda a: jax.grad(
    lambda q: jnp.sum(interpolate_bilinear(q, (SIZE, SIZE)).astype(jnp.float32)))(a)), xu)
