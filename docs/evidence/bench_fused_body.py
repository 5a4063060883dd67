"""A/B on real TPU: generator forward 512² bf16, fused_body vs XLA path.

Pipelined methodology (dispatch K, pull one scalar) — see CLAUDE.md.
Run: nohup python docs/evidence/bench_fused_body.py > .._r1c.log 2>&1 &
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from ctagan_tpu.models import Generator


def bench(fused: bool, batch: int = 32, size: int = 512, iters: int = 20):
    model = Generator(1, 1, dtype=jnp.bfloat16, fused_body=fused)
    params = Generator(1, 1).init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 1))
    )
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    x = jnp.asarray(
        np.random.default_rng(0)
        .uniform(-1, 1, (batch, size, size, 1))
        .astype(np.float32)
    )
    float(fwd(params, x)[0, 0, 0, 0])
    float(fwd(params, x)[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, x)
    float(out[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    print(
        f"fused={fused}: {dt*1e3:.1f} ms/batch{batch} = "
        f"{batch/dt:.1f} slices/s", flush=True,
    )
    return out


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    ref = bench(False)
    got = bench(True)
    # numerical check on-device
    d = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
    print("max |fused - xla| on tanh output:", float(d), flush=True)
    bench(False, batch=8)
    bench(True, batch=8)
    bench(True, batch=1)
    bench(False, batch=1)
