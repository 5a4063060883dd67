"""VERDICT r2 #6b: the b>=16 saturated plateau (~279 sl/s since r1c) —
measure where the non-body 53 ms/batch goes and roofline it.

Method: in-graph DIFFERENCES, not isolated stages (isolated probes
overstate 1.5-3x — r1c/r2c lesson). Ladder of ablated forwards at 512^2
b=32 bf16, each timed pipelined best-of-3:

  A full fwd (chain + tail-tap autos)        — the shipped path
  B body-only (head+down precomputed input)  — the fused chain alone
  C A with pad_mode=zero clone               — reflect-pad tax (semantics
    change, measurement only)
  D A with plain XLA body                    — chain gain re-confirm

Roofline arithmetic (v5e: 197 TFLOP/s bf16 MXU, ~819 GB/s HBM):
non-body compute ~100 GFLOP/slice -> 0.51 ms/slice ideal; non-body HBM
traffic ~0.3 GB/slice -> ~0.37 ms/slice ideal; measured non-body
(A - B·(body share)) tells which bound binds and how far we sit from it.
"""
import time

import numpy as np


def timeit(fn, *args, iters=10, loops=3, sync=None):
    out = fn(*args)
    sync(out)
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(loops):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from ctagan_tpu.models import Generator

    rng = np.random.default_rng(0)
    B = 32
    xin = jnp.asarray(rng.uniform(-1, 1, (B, 512, 512, 1)).astype(np.float32))
    params = Generator(1, 1).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 1))
    )
    pull = lambda o: float(jnp.asarray(o).ravel()[0])

    variants = {
        "A_full_fused": Generator(1, 1, dtype=jnp.bfloat16, fused_body=True),
        "D_full_xla": Generator(1, 1, dtype=jnp.bfloat16, fused_body=False),
        "C_zero_pads": Generator(
            1, 1, dtype=jnp.bfloat16, fused_body=True, pad_mode="zero"
        ),
    }
    times = {}
    for name, g in variants.items():
        if name == "C_zero_pads":
            p = Generator(1, 1, pad_mode="zero").init(
                jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 1))
            )
        else:
            p = params
        f = jax.jit(lambda pp, v, g=g: g.apply(pp, v))
        t = timeit(f, p, xin, sync=pull)
        times[name] = t
        print(f"{name:14s} {t*1e3:7.1f} ms  {B/t:6.1f} sl/s", flush=True)

    # body-only: stage the input to the body entry (head+down at f32 once,
    # off the clock) then time ONLY the 9-block chain
    from ctagan_tpu.ops.fused_resblock import fused_residual_chain

    g = variants["A_full_fused"]
    bp = [params["params"][f"ResidualBlock_{i}"] for i in range(9)]
    blocks = [
        (
            b["ConvTorch_0"]["Conv_0"]["kernel"].astype(jnp.bfloat16),
            b["ConvTorch_0"]["Conv_0"]["bias"].astype(jnp.bfloat16),
            b["ConvTorch_1"]["Conv_0"]["kernel"].astype(jnp.bfloat16),
            b["ConvTorch_1"]["Conv_0"]["bias"].astype(jnp.bfloat16),
        )
        for b in bp
    ]
    hbody = jnp.asarray(
        rng.uniform(-1, 1, (B, 128, 128, 256)).astype(np.float32),
        dtype=jnp.bfloat16,
    )
    f_body = jax.jit(lambda h: fused_residual_chain(h, blocks))
    t_body = timeit(f_body, hbody, sync=pull)
    print(f"B_body_chain   {t_body*1e3:7.1f} ms", flush=True)

    t_nb = times["A_full_fused"] - t_body
    per_slice = t_nb / B * 1e3
    print(
        f"\nnon-body in-graph: {t_nb*1e3:.1f} ms/batch = {per_slice:.2f} "
        f"ms/slice (ideal compute 0.51, ideal HBM ~0.37)",
        flush=True,
    )
    pad_tax = times["A_full_fused"] - times["C_zero_pads"]
    print(f"reflect-pad tax vs zero pads: {pad_tax*1e3:.1f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
