"""Border-fix reflect convs (ops/border_conv.py) on hardware, b=32 focus.

The r3 plateau probe (bench_probes_r3.log) showed pad_mode=zero running
99.4 ms vs 116.6 full-fused at 512^2 b=32 — but that ablation also swaps
the body implementation (zero disables the Pallas chain), so it bounds two
things at once. This ladder separates them:

  body-only @ (32,128,128,256), 9 blocks:
    chain          — fused Pallas residual chain (the shipped b=32 body)
    xla_reflect    — ResidualBlock, materialized reflect pads
    xla_borderfix  — ResidualBlock(border_fix=True): exact reflect, fused
                     zero-pad convs + border strips
    xla_zero       — ResidualBlock(pad_mode=zero) (diagnostic, semantics
                     change: lower bound for any XLA body)

  full forward @ 512^2 bf16, b in {32, 8, 1}:
    old            — shipped r2 path (border_fix=False)
    new            — border_fix auto (head conv7 + any XLA resblocks)
    xla_bfix       — fused_body=False + border_fix=True (all-XLA exact
                     body; candidate default if xla_borderfix beats chain)

Timing: pipelined best-of-3 (dispatch 10, sync once by pulling a scalar).
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
    from flax import linen as nn

    from ctagan_tpu.models import Generator
    from ctagan_tpu.models.layers import ResidualBlock

    rng = np.random.default_rng(0)
    pull = lambda o: float(jnp.asarray(o).ravel()[0])

    # ---- body-only ladder ----
    B = 32
    hbody = jnp.asarray(
        rng.uniform(-1, 1, (B, 128, 128, 256)).astype(np.float32),
        dtype=jnp.bfloat16,
    )

    class Body(nn.Module):
        pad_mode: str = "reflect"
        border_fix: bool = False

        @nn.compact
        def __call__(self, h):
            for _ in range(9):
                h = ResidualBlock(256, dtype=jnp.bfloat16,
                                  pad_mode=self.pad_mode,
                                  border_fix=self.border_fix)(h)
            return h

    bparams = Body().init(jax.random.PRNGKey(0), hbody[:1])
    from ctagan_tpu.ops.fused_resblock import fused_residual_chain

    bp = [bparams["params"][f"ResidualBlock_{i}"] for i in range(9)]
    blocks = [
        (
            b["ConvTorch_0"]["Conv_0"]["kernel"].astype(jnp.bfloat16),
            b["ConvTorch_0"]["Conv_0"]["bias"].astype(jnp.bfloat16),
            b["ConvTorch_1"]["Conv_0"]["kernel"].astype(jnp.bfloat16),
            b["ConvTorch_1"]["Conv_0"]["bias"].astype(jnp.bfloat16),
        )
        for b in bp
    ]
    t = timeit(jax.jit(lambda h: fused_residual_chain(h, blocks)), hbody,
               sync=pull)
    print(f"body chain          {t*1e3:7.1f} ms", flush=True)
    for name, kw in (
        ("body xla_reflect   ", {}),
        ("body xla_borderfix ", {"border_fix": True}),
        ("body xla_zero      ", {"pad_mode": "zero"}),
    ):
        m = Body(**kw)
        if kw.get("pad_mode") == "zero":
            p = m.init(jax.random.PRNGKey(0), hbody[:1])
        else:
            p = bparams
        t = timeit(jax.jit(lambda h, m=m, p=p: m.apply(p, h)), hbody,
                   sync=pull)
        print(f"{name}{t*1e3:7.1f} ms", flush=True)

    # ---- full forward ladder ----
    params = Generator(1, 1).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 1))
    )
    variants = {
        "old (bfix off)": dict(fused_body=True, border_fix=False),
        "new (bfix auto)": dict(fused_body=True),
        "xla_bfix": dict(fused_body=False, border_fix=True),
    }
    for b in (32, 8, 1):
        xin = jnp.asarray(
            rng.uniform(-1, 1, (b, 512, 512, 1)).astype(np.float32)
        )
        for name, kw in variants.items():
            g = Generator(1, 1, dtype=jnp.bfloat16, **kw)
            f = jax.jit(lambda p, v, g=g: g.apply(p, v))
            t = timeit(f, params, xin, sync=pull)
            print(
                f"fwd b={b:<2d} {name:16s} {t*1e3:7.1f} ms "
                f"{b/t:6.1f} sl/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
