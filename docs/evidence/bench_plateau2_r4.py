"""Round-4 saturated-plateau probe: why do the fused down/up kernels lose
at b=32, and can block sizing fix it? (VERDICT r2 #6 follow-through.)

Hypothesis from the kernel structure (ops/fused_down.py): at b=32 the
grid is (32, H2/R) = 1024 steps at R=8 for down1 — each step is only
~0.4 GFLOP + a 1.2 MB DMA, so per-step overhead (grid sequencing, DMA
wait latency not hidden by the 2-deep double buffer) dominates, while
XLA's conv at b=32 runs few large fused loops. If that's right, R should
scale with batch: the same kernel at R=32 runs a 256-step grid with 4x
the MXU work per step.

Probes (each timed by pulling a scalar per iter, pipelined dispatch):
  1. isolated down1-shape kernel: conv3x3_s2_zero_stats at
     (32, 512, 512, 64)->128, R in {8, 16, 32, 64} vs XLA conv+IN.
  2. isolated down2 shape (32, 256, 256, 128)->256, same sweep.
  3. in-graph full forward b=32 with the fused-down gate forced on at the
     best R vs the current default (gate off at b=32).
  4. same sweep for the phase-form convT up path (ops/fused_convt.py)
     at the up1 shape (32, 128, 128, 256)->128.

Run AFTER the quality run frees the chip; never concurrently.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ctagan_tpu.models import Generator


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        # pull one scalar: tunnel-safe sync (block_until_ready can return
        # before the device finishes, CLAUDE.md)
        leaves = jax.tree_util.tree_leaves(out)
        float(leaves[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)

    from ctagan_tpu.ops.fused_down import conv3x3_s2_zero_stats

    for (n, h, c, cout) in ((32, 512, 64, 128), (32, 256, 128, 256)):
        x = jnp.asarray(
            rng.standard_normal((n, h, h, c)), jnp.bfloat16
        )
        w = jnp.asarray(rng.standard_normal((3, 3, c, cout)) * 0.05,
                        jnp.bfloat16)
        b = jnp.zeros((cout,), jnp.float32)

        def xla_ref(x, w, b):
            y = jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16), w, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b.astype(jnp.bfloat16)
            m = jnp.mean(y.astype(jnp.float32), axis=(1, 2), keepdims=True)
            v = jnp.mean(
                jnp.square(y.astype(jnp.float32) - m), axis=(1, 2),
                keepdims=True,
            )
            return jnp.maximum((y - m) * jax.lax.rsqrt(v + 1e-5), 0.0)

        t = timeit(jax.jit(xla_ref), x, w, b)
        print(f"down {h}x{h}x{c}->{cout}  XLA conv+IN+relu  {t:7.2f} ms",
              flush=True)
        for R in (8, 16, 32, 64):
            try:
                f = jax.jit(
                    lambda x, w, b, R=R: conv3x3_s2_zero_stats(
                        x, w, b, block_rows=R
                    )
                )
                t = timeit(f, x, w, b)
                print(f"down {h}x{h}x{c}->{cout}  fused R={R:<3d}      "
                      f"{t:7.2f} ms", flush=True)
            except Exception as e:  # VMEM OOM etc.
                print(f"down {h}x{h}x{c}->{cout}  fused R={R:<3d}      "
                      f"FAIL {type(e).__name__}", flush=True)

    # in-graph: full forward with fused-down forced on (edit the gate via
    # env knob if this probe wins isolated — placeholder A/B on defaults)
    for label, kw in (
        ("default (gate: fused-down off at b=32)", {}),
    ):
        g = Generator(1, 1, dtype=jnp.bfloat16, fused_body=True, **kw)
        x = jnp.asarray(rng.standard_normal((32, 512, 512, 1)), jnp.float32)
        params = g.init(jax.random.PRNGKey(0), x[:1])
        fwd = jax.jit(lambda p, x: g.apply(p, x))
        t = timeit(fwd, params, x, iters=10)
        print(f"fwd b=32 {label}: {t:7.2f} ms  "
              f"({32 / t * 1e3:.1f} sl/s)", flush=True)


if __name__ == "__main__":
    main()
