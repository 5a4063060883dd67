"""VERDICT r2 #7: make int8 pay or prove it can't — the roofline probe.

Question: v5e's s8 MXU peak is ~2x bf16 (394 vs 197 TOPS), yet the fused
s8 serving body measured 0.75x the bf16 chain. Where does the 2.7x gap go?

Probes (each timed by scalar pull, pipelined, best-of-3; body shapes:
the 9-block residual body at 128^2 x 256ch, batch 32 — the MXU-dominant
regime bench.py's headline lives in):

1. RAW MATMUL LADDER — jnp.dot at the fused-body matmul shape
   (M=R*W=2048, K=3C=768, N=256): bf16xbf16->f32 vs s8xs8->i32 vs
   s8xs8->i32 + f32 dequant epilogue. If s8 isn't ~2x here, the MXU mode
   isn't reachable through this lowering and the idea retires on
   hardware evidence.
2. QUANT OVERHEAD — dynamic per-tensor activation quantization cost
   (abs-max reduce + scale + round + clip on the body activation tensor)
   measured alone: the per-block tax the s8 chain pays that bf16 doesn't.
3. CHAIN A/B — ops/fused_resblock.fused_residual_chain (bf16) vs
   ops/fused_s8.fused_residual_chain_s8 on the same 9-block body, plus
   the s8 chain with STATIC activation scales (quant folded away) to
   separate matmul-mode gains from quant overhead.

Verdict criterion: int8 >= 1.15x bf16 at b=32 ships as a speed mode;
otherwise the numbers below retire it (memory mode only) in PARITY.md.
"""
import time

import numpy as np


def timeit(fn, *args, iters=20, loops=3, sync=lambda out: None):
    import jax

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

    rng = np.random.default_rng(0)
    # body matmul shape: per-slab conv as (R*W, 3C) x (3C, Cout); a block
    # runs H/R of these per conv. Time ONE BIG equivalent matmul stream:
    # M = B*H*W (flattened conv positions) in slabs of 2048 rows.
    M, K, N = 32 * 128 * 128, 768, 256
    a_f = jnp.asarray(rng.uniform(-1, 1, (M, K)).astype(np.float32),
                      dtype=jnp.bfloat16)
    b_f = jnp.asarray(rng.uniform(-1, 1, (K, N)).astype(np.float32),
                      dtype=jnp.bfloat16)
    a_s = jnp.asarray(rng.integers(-127, 128, (M, K)), dtype=jnp.int8)
    b_s = jnp.asarray(rng.integers(-127, 128, (K, N)), dtype=jnp.int8)

    pull = lambda o: float(jnp.asarray(o).ravel()[0])

    f_bf16 = jax.jit(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32))
    f_s8 = jax.jit(lambda x, y: jax.lax.dot(x, y, preferred_element_type=jnp.int32))
    f_s8_deq = jax.jit(
        lambda x, y: jax.lax.dot(x, y, preferred_element_type=jnp.int32)
        .astype(jnp.float32) * jnp.float32(1e-4)
    )

    t_bf = timeit(f_bf16, a_f, b_f, sync=pull)
    t_s8 = timeit(f_s8, a_s, b_s, sync=pull)
    t_s8d = timeit(f_s8_deq, a_s, b_s, sync=pull)
    flops = 2 * M * K * N
    print(f"RAW MATMUL ({M}x{K}x{N}):")
    print(f"  bf16      {t_bf*1e3:8.3f} ms  {flops/t_bf/1e12:6.1f} TFLOP/s")
    print(f"  s8->i32   {t_s8*1e3:8.3f} ms  {flops/t_s8/1e12:6.1f} TOP/s   "
          f"({t_bf/t_s8:.2f}x bf16)")
    print(f"  s8+deq    {t_s8d*1e3:8.3f} ms  ({t_bf/t_s8d:.2f}x bf16)",
          flush=True)

    # 2. dynamic activation quant tax on a body tensor
    x = jnp.asarray(rng.uniform(-4, 4, (32, 128, 128, 256)).astype(np.float32),
                    dtype=jnp.bfloat16)

    @jax.jit
    def quant(x):
        s = jnp.max(jnp.abs(x)) / 127.0
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
        return q.astype(jnp.int8), s

    t_q = timeit(quant, x, sync=lambda o: float(o[1]))
    print(f"QUANT TAX (one 32x128x128x256 act): {t_q*1e3:.3f} ms "
          f"(x18 convs = {18*t_q*1e3:.1f} ms/fwd)", flush=True)

    # 3. chain A/B at the real body
    from ctagan_tpu.models import Generator

    g_f = Generator(1, 1, dtype=jnp.bfloat16, fused_body=True)
    g_x = Generator(1, 1, dtype=jnp.bfloat16, fused_body=False)
    params = Generator(1, 1).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 1))
    )
    xin = jnp.asarray(
        rng.uniform(-1, 1, (32, 512, 512, 1)).astype(np.float32)
    )
    f_full = jax.jit(lambda p, v: g_f.apply(p, v))
    t_full = timeit(f_full, params, xin, iters=10,
                    sync=lambda o: float(o[0, 0, 0, 0]))
    print(f"bf16 fused fwd b=32: {t_full*1e3:.1f} ms "
          f"({32/t_full:.1f} sl/s)", flush=True)

    from ctagan_tpu.ops.quantize import generator_int8_forward, quantize_generator

    qp = quantize_generator(params)
    f_q = jax.jit(generator_int8_forward)
    t_qfull = timeit(f_q, qp, xin, iters=10,
                     sync=lambda o: float(o[0, 0, 0, 0]))
    print(f"int8 fused fwd b=32: {t_qfull*1e3:.1f} ms "
          f"({32/t_qfull:.1f} sl/s, {t_full/t_qfull:.2f}x bf16)", flush=True)


if __name__ == "__main__":
    main()
