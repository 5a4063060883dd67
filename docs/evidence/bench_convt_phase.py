"""A/B: ConvTranspose(k3,s2,p1,op1) direct (input-dilation) vs exact phase
decomposition (conv at low res with 4x output channels + depth_to_space),
plus the up-stage with IN+relu, b=32 bf16 on v5e. Also re-probe taps b=8."""
import time
import numpy as np
import jax, jax.numpy as jnp
from flax import linen as nn
from ctagan_tpu.models.layers import ConvTransposeTorch, instance_norm

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
N, H, W, C, CO = 32, 128, 128, 256, 128
x = jnp.asarray(rng.standard_normal((N,H,W,C)).astype(np.float32)).astype(DT)

mod = ConvTransposeTorch(CO, dtype=DT)
p = mod.init(jax.random.PRNGKey(0), x[:1])
k = p["params"]["ConvTranspose_0"]["kernel"]  # (3,3,CO,C) transpose layout
b = p["params"]["ConvTranspose_0"]["bias"]

# phase decomposition: out[2i+pi, 2j+pj] = sum_{di,dj,c} x[i+..] ... derive
# from the dilation form: out[m, n] = sum_{ky,kx} xd[m+ky, n+kx] k'[ky,kx]
# where xd = zero-dilated x padded lo=hi=1 (k=3, p=1, op=1), k' flipped.
# For phase (pi,pj): contributing taps are those hitting real (non-zero)
# dilated positions — build the 4 phase kernels by slicing the flipped k.
kt = k  # flax transpose_kernel=True stores (ky,kx,CO,C); conv form needs flip
kf = jnp.flip(jnp.flip(kt, 0), 1).transpose(0, 1, 3, 2)  # (3,3,C,CO) flipped

def phase_kernels(kf):
    # out[2i+pi, 2j+pj] = sum_{a,b} x[i+a, j+b] * kf[1+pi-2a, 1+pj-2b]
    ks = {}
    for pi in (0, 1):
        for pj in (0, 1):
            taps = []
            for a in (0, 1):
                for bb in (0, 1):
                    ky, kx = 1 + pi - 2*a, 1 + pj - 2*bb
                    taps.append(((a, bb), (ky, kx) if 0 <= ky < 3 and 0 <= kx < 3 else None))
            ks[(pi, pj)] = taps
    return ks

TAPS = phase_kernels(kf)

@jax.jit
def direct(x):
    return mod.apply(p, x)

@jax.jit
def phased(x):
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0,0),(0,1),(0,1),(0,0)))  # x[i+1] at i=h-1
    outs = {}
    for (pi, pj), taps in TAPS.items():
        acc = None
        for (a, bb), kk in taps:
            if kk is None: continue
            xa = xp[:, a:a+h, bb:bb+w, :]
            t = jax.lax.dot_general(xa.reshape(n*h*w, c), kf[kk[0], kk[1]],
                dimension_numbers=(((1,),(0,)),((),())),
                preferred_element_type=jnp.float32).reshape(n, h, w, -1)
            acc = t if acc is None else acc + t
        outs[(pi, pj)] = acc
    # interleave: (N, H, 2, W, 2, CO) -> (N, 2H, 2W, CO)
    o = jnp.stack([jnp.stack([outs[(0,0)], outs[(0,1)]], axis=3),
                   jnp.stack([outs[(1,0)], outs[(1,1)]], axis=3)], axis=2)
    o = o.transpose(0, 1, 2, 4, 3, 5).reshape(n, 2*h, 2*w, -1)
    return (o + b).astype(x.dtype)

d = direct(x); ph = phased(x)
print("convT phase max err:", float(jnp.max(jnp.abs(d.astype(jnp.float32)-ph.astype(jnp.float32)))), flush=True)
timeit(direct, x, "convT direct b32")
timeit(phased, x, "convT phased b32")

@jax.jit
def direct_in(x): return nn.relu(instance_norm(mod.apply(p, x)))
@jax.jit
def phased_in(x): return nn.relu(instance_norm(phased(x)))
timeit(direct_in, x, "convT+IN+relu direct")
timeit(phased_in, x, "convT+IN+relu phased")

# taps b=8 re-probe
from ctagan_tpu.models import Generator
for tap in (True, False):
    model = Generator(1, 1, dtype=DT, tap_heads=tap, fused_body=True)
    params = Generator(1, 1).init(jax.random.PRNGKey(0), jnp.zeros((1,512,512,1)))
    fwd = jax.jit(lambda xx: model.apply(params, xx))
    xx = jnp.asarray(rng.uniform(-1,1,(8,512,512,1)).astype(np.float32))
    float(fwd(xx)[0,0,0,0]); float(fwd(xx)[0,0,0,0])
    t0 = time.perf_counter()
    for _ in range(20): out = fwd(xx)
    float(out[0,0,0,0])
    dt = (time.perf_counter()-t0)/20
    print(f"fwd taps={tap} b=8: {dt*1e3:.1f} ms = {8/dt:.1f} sl/s", flush=True)
