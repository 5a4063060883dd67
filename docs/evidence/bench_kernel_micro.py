import time
import numpy as np
import jax, jax.numpy as jnp
from ctagan_tpu.ops.fused_resblock import conv3x3_reflect_stats

N,H,W,C = 32,128,128,256
x = jnp.asarray(np.random.default_rng(0).standard_normal((N,H,W,C)).astype(np.float32)).astype(jnp.bfloat16)
w = jnp.asarray((np.random.default_rng(1).standard_normal((3,3,C,C))*0.05).astype(np.float32))
b = jnp.zeros((C,), jnp.float32)

@jax.jit
def pallas_conv(x):
    out, stats = conv3x3_reflect_stats(x, w, b)
    return out, stats

@jax.jit
def xla_conv(x):
    xp = jnp.pad(x, ((0,0),(1,1),(1,1),(0,0)), mode='reflect')
    y = jax.lax.conv_general_dilated(xp, w.astype(jnp.bfloat16), (1,1), 'VALID',
        dimension_numbers=('NHWC','HWIO','NHWC'), preferred_element_type=jnp.float32)
    return (y + b).astype(jnp.bfloat16)

@jax.jit
def xla_conv_in(x):
    y = xla_conv(x)
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=(1,2), keepdims=True)
    m2 = jnp.mean(yf*yf, axis=(1,2), keepdims=True)
    var = jnp.maximum(m2-mean*mean, 0.0)
    return ((yf-mean)*jax.lax.rsqrt(var+1e-5)).astype(x.dtype)

def timeit(f, tag, iters=30):
    out = f(x); jax.tree_util.tree_leaves(out)[0][0,0]
    float(jnp.asarray(jax.tree_util.tree_leaves(f(x))[0][0,0,0,0]))
    t0 = time.perf_counter()
    for _ in range(iters): out = f(x)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0][0,0,0,0]))
    dt = (time.perf_counter()-t0)/iters
    print(f"{tag}: {dt*1e3:.2f} ms", flush=True)

print("devices:", jax.devices(), flush=True)
timeit(xla_conv, "xla conv3x3 b32 128^2 c256")
timeit(xla_conv_in, "xla conv3x3+IN")
timeit(pallas_conv, "pallas conv3x3+stats")
