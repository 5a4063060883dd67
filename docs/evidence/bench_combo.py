"""One TPU session: (1) restored-v1 fused fwd sanity, (2) body-only overhead
probe, (3) dense-warp isolated + HD-step A/B."""
import time
import numpy as np
import jax, jax.numpy as jnp
from ctagan_tpu.models import Generator
from ctagan_tpu.ops.fused_resblock import fused_residual_block

def sync(v): float(jnp.asarray(jax.tree_util.tree_leaves(v)[0]).ravel()[0])

def timeit(f, arg, tag, iters=20):
    out = f(arg); sync(out); out = f(arg); sync(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = f(arg)
    sync(out)
    print(f"{tag}: {(time.perf_counter()-t0)/iters*1e3:.2f} ms", flush=True)

print("devices:", jax.devices(), flush=True)

# (1) full generator fwd, restored v1
model = Generator(1, 1, dtype=jnp.bfloat16, fused_body=True)
params = Generator(1, 1).init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 1)))
x512 = jnp.asarray(np.random.default_rng(0).uniform(-1,1,(32,512,512,1)).astype(np.float32))
timeit(jax.jit(lambda x: model.apply(params, x)), x512, "G fwd b32 fused(v1-restored)")

# (2) body-only: 9 fused residual blocks chained
N,H,W,C = 32,128,128,256
rngk = np.random.default_rng(1)
xb = jnp.asarray(rngk.standard_normal((N,H,W,C)).astype(np.float32)).astype(jnp.bfloat16)
ws = [jnp.asarray((rngk.standard_normal((3,3,C,C))*0.02).astype(np.float32)) for _ in range(18)]
bs = [jnp.zeros((C,), jnp.float32) for _ in range(18)]
@jax.jit
def body9(x):
    for i in range(9):
        x = fused_residual_block(x, ws[2*i], bs[2*i], ws[2*i+1], bs[2*i+1])
    return x
timeit(body9, xb, "body-only 9 fused blocks b32")

# XLA body for comparison
from ctagan_tpu.models.layers import ResidualBlock
blk = ResidualBlock(256, dtype=jnp.bfloat16)
p18 = [{"params": {"ConvTorch_0": {"Conv_0": {"kernel": ws[2*i], "bias": bs[2*i]}},
                    "ConvTorch_1": {"Conv_0": {"kernel": ws[2*i+1], "bias": bs[2*i+1]}}}}
       for i in range(9)]
@jax.jit
def body9_xla(x):
    for i in range(9):
        x = blk.apply(p18[i], x)
    return x
timeit(body9_xla, xb, "body-only 9 XLA blocks b32")

# (3) dense warp
import importlib.util, sys
spec = importlib.util.spec_from_file_location("bdw", "/root/repo/docs/evidence/bench_dense_warp.py")
bdw = importlib.util.module_from_spec(spec); spec.loader.exec_module(bdw)
bdw.bench_warp_only("gather")
bdw.bench_warp_only("dense")
bdw.bench_step("gather")
bdw.bench_step("dense")
