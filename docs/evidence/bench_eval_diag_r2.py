"""Eval-throughput diagnosis (r2): where do the 100 ms/slice (validate) and
435 ms/slice (test) go?  Components measured pipelined in ONE process:
G fwd, masked_psnr, ssim (reduce_window 7x7), ssim separable-candidate,
the full 8-metric suite, host->device upload, device->host image pull.
"""
import time
import numpy as np
import jax, jax.numpy as jnp

from ctagan_tpu.models import Generator
from ctagan_tpu.ops.metrics import masked_psnr, ssim
from ctagan_tpu.train.evaluation import _metric_suite

print("devices:", jax.devices(), flush=True)


def timeit(tag, fn, *args, iters=20, sync=lambda out: float(jnp.ravel(out)[0])):
    sync(fn(*args)); sync(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{tag}: {best*1e3:.2f} ms", flush=True)
    return best


rng = np.random.default_rng(0)
a = jnp.asarray(rng.uniform(-1, 1, (512, 512)).astype(np.float32))
b = jnp.asarray(rng.uniform(-1, 1, (512, 512)).astype(np.float32))

timeit("masked_psnr 512^2", jax.jit(masked_psnr), a, b)
timeit("ssim reduce_window 7x7", jax.jit(ssim), a, b)


def _uf_sep(x, win=7):
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (win, 1), (1, 1), "VALID")
    s = jax.lax.reduce_window(s, 0.0, jax.lax.add, (1, win), (1, 1), "VALID")
    return s / float(win * win)


def ssim_sep(im1, im2, data_range=2.0, win=7, k1=0.01, k2=0.03):
    im1 = jnp.asarray(im1, jnp.float32); im2 = jnp.asarray(im2, jnp.float32)
    np_ = win * win
    cov_norm = np_ / (np_ - 1.0)
    ux = _uf_sep(im1); uy = _uf_sep(im2)
    uxx = _uf_sep(im1 * im1); uyy = _uf_sep(im2 * im2); uxy = _uf_sep(im1 * im2)
    vx = cov_norm * (uxx - ux * ux); vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (k1 * data_range) ** 2; c2 = (k2 * data_range) ** 2
    return jnp.mean(((2*ux*uy + c1) * (2*vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2)))


timeit("ssim separable 7+7", jax.jit(ssim_sep), a, b)
print("ssim values: rw", float(ssim(a, b)), "sep", float(ssim_sep(a, b)), flush=True)

timeit("metric suite (8 metrics)", jax.jit(lambda x, y: _metric_suite(x, y, jnp.float32(50.0), jnp.float32(400.0))), a, b,
       sync=lambda out: float(out["PSNR"]))

model = Generator(1, 1, dtype=jnp.bfloat16, fused_body=True)
params = Generator(1, 1).init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 1)))
fwd = jax.jit(lambda p, x: model.apply(p, x))
x1 = jnp.asarray(rng.uniform(-1, 1, (1, 512, 512, 1)).astype(np.float32))
timeit("G fwd b=1", fwd, params, x1, sync=lambda o: float(o[0, 0, 0, 0]))


def val_step(p, xa, xb):
    fake = model.apply(p, xa)
    fb = fake[:, :, :, 0][0].astype(jnp.float32)
    rb = xb[:, :, :, 0][0].astype(jnp.float32)
    return masked_psnr(fb, rb), ssim(fb, rb)


timeit("val step (fwd+psnr+ssim) b=1", jax.jit(val_step), params, x1, x1,
       sync=lambda o: float(o[0]))

# host->device upload of one val batch (2 x 1 MB)
host = rng.uniform(-1, 1, (1, 512, 512, 1)).astype(np.float32)


def upload():
    return jnp.asarray(host), jnp.asarray(host)


t0 = time.perf_counter()
for _ in range(20):
    da, db = upload()
float(da[0, 0, 0, 0]); float(db[0, 0, 0, 0])
print(f"upload 2x1MB (pipelined x20): {(time.perf_counter()-t0)/20*1e3:.2f} ms", flush=True)

# device->host pull of one 512^2 f32 image
out = fwd(params, x1)
t0 = time.perf_counter()
for _ in range(20):
    _ = np.asarray(out)
print(f"pull 1MB image x20: {(time.perf_counter()-t0)/20*1e3:.2f} ms", flush=True)

# pipelined val-step train: dispatch 32, sync once (the validate() pattern)
js = jax.jit(val_step)
float(js(params, x1, x1)[0])
t0 = time.perf_counter()
pend = [js(params, x1, x1) for _ in range(32)]
vals = [(float(p_), float(s_)) for p_, s_ in pend]
dt = time.perf_counter() - t0
print(f"pipelined 32 val steps: {dt:.2f}s = {32/dt:.1f} sl/s", flush=True)
