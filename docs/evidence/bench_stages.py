"""Per-stage generator breakdown at 512^2 b=32 bf16 on v5e + batch-64 probe.

Isolates head (7x7+IN+relu), down path, body, up path, tail to find where
the 61 ms of non-body time lives (body-only measured 71.1 ms fused).
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from flax import linen as nn
from ctagan_tpu.models.layers import (
    ConvTorch, ConvTransposeTorch, instance_norm, reflect_pad,
)
from ctagan_tpu.models import Generator

def sync(v): float(jnp.asarray(jax.tree_util.tree_leaves(v)[0]).ravel()[0])

def timeit(f, arg, tag, iters=20):
    out = f(arg); sync(out); out = f(arg); sync(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = f(arg)
    sync(out)
    print(f"{tag}: {(time.perf_counter()-t0)/iters*1e3:.2f} ms", flush=True)

print("devices:", jax.devices(), flush=True)
DT = jnp.bfloat16
rng = np.random.default_rng(0)

class Head(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = ConvTorch(64, 7, dtype=DT)(reflect_pad(x, 3))
        return nn.relu(instance_norm(h))

class Down(nn.Module):
    @nn.compact
    def __call__(self, h):
        for mult in (2, 4):
            h = ConvTorch(64*mult, 3, stride=2, padding=1, dtype=DT)(h)
            h = nn.relu(instance_norm(h))
        return h

class Up(nn.Module):
    @nn.compact
    def __call__(self, h):
        for mult in (2, 1):
            h = ConvTransposeTorch(64*mult, dtype=DT)(h)
            h = nn.relu(instance_norm(h))
        return h

class Tail(nn.Module):
    @nn.compact
    def __call__(self, h):
        return nn.tanh(ConvTorch(1, 7, dtype=DT)(reflect_pad(h, 3)))

x1 = jnp.asarray(rng.uniform(-1,1,(32,512,512,1)).astype(np.float32))
x64 = jnp.asarray(rng.standard_normal((32,512,512,64)).astype(np.float32)).astype(DT)
x256 = jnp.asarray(rng.standard_normal((32,128,128,256)).astype(np.float32)).astype(DT)

for mod, arg, tag in ((Head(), x1, "head 7x7+IN+relu 512^2"),
                      (Down(), x64, "down x2 (conv s2+IN+relu)"),
                      (Up(), x256, "up x2 (convT+IN+relu)"),
                      (Tail(), x64, "tail pad+7x7+tanh 512^2")):
    p = mod.init(jax.random.PRNGKey(0), jax.tree_util.tree_map(lambda a: a[:1], arg))
    timeit(jax.jit(lambda a, m=mod, pp=p: m.apply(pp, a)), arg, tag)

# batch-64 probe on the full fused generator
model = Generator(1, 1, dtype=DT, fused_body=True)
params = Generator(1, 1).init(jax.random.PRNGKey(0), jnp.zeros((1,512,512,1)))
x64b = jnp.asarray(rng.uniform(-1,1,(64,512,512,1)).astype(np.float32))
fwd = jax.jit(lambda x: model.apply(params, x))
out = fwd(x64b); sync(out); out = fwd(x64b); sync(out)
t0 = time.perf_counter()
for _ in range(10): out = fwd(x64b)
sync(out)
dt = (time.perf_counter()-t0)/10
print(f"G fwd b64 fused: {dt*1e3:.1f} ms = {64/dt:.1f} sl/s", flush=True)
