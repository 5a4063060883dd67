"""Int8 fused residual body (Pallas) — the serving throughput mode.

Round 1 measured XLA's s8 lowering at 0.58-0.64x bf16 (ops/quantize.py):
the dynamic-quant chains + XLA's s8 conv path cost more than the MXU saves.
This kernel keeps the fused-body structure (ops/fused_resblock.py: conv as
3 (R·W, 3C)x(3C, Cout) matmuls per row slab + in-kernel stats) but runs the
matmuls s8 x s8 -> s32 — 2x MXU peak on v5e — with the quantization folded
into the streaming passes:

- conv1 input (the residual trunk x_i, arbitrary scale): dynamic per-tensor
  scale from one XLA max-abs (fused into the preceding epilogue pass);
  the kernel consumes pre-quantized s8 rows.
- conv2 input (relu(IN1(h1))): InstanceNorm makes the activation
  unit-variance BY CONSTRUCTION, so a STATIC clip (``act_clip`` sigma,
  default 8) is principled — the kernel reads the raw bf16 h1, applies
  (mean, rstd) + ReLU and quantizes in VMEM; the s8 image never exists in
  HBM and no extra pass is paid.
- accumulation s32, dequant (x_scale · w_scale[c]) + bias in f32, stats of
  the dtype-rounded output — same numerics contract as the bf16 chain.

Weights: per-output-channel symmetric s8 (ops/quantize.py convention).
Quality: IN after every conv absorbs the per-channel affine, so the only
noise is activation rounding (see quantize.py quality note + tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ctagan_tpu.ops.fused_resblock import BLOCK_ROWS, _issue_or_wait, _stats_to_norm


def _s8_kernel(*refs, R, T, H, W, prenorm, act_clip, out_dtype):
    it = iter(refs)
    x_ref = next(it)
    w_ref = next(it)
    ws_ref = next(it)  # (1, Cout) combined dequant scale
    b_ref = next(it)
    norm_ref = next(it) if prenorm else None
    o_ref, stats_ref = next(it), next(it)
    xbuf = next(it)
    sems = next(it)
    n = pl.program_id(0)
    t = pl.program_id(1)
    lin = n * T + t
    total = pl.num_programs(0) * T
    slot = jax.lax.rem(lin, 2)

    @pl.when(lin == 0)
    def _():
        _issue_or_wait(x_ref, xbuf, sems, 0, 0, R=R, T=T, H=H, start=True)

    @pl.when(lin + 1 < total)
    def _():
        _issue_or_wait(x_ref, xbuf, sems, lin + 1, jax.lax.rem(lin + 1, 2),
                       R=R, T=T, H=H, start=True)

    _issue_or_wait(x_ref, xbuf, sems, lin, slot, R=R, T=T, H=H, start=False)

    xs = xbuf[slot]  # (R+4, W, C): s8 (mode i) or bf16 raw (mode ii)
    if prenorm:
        mean = norm_ref[0, 0, :][None, None, :]
        rstd = norm_ref[0, 1, :][None, None, :]
        a = jnp.maximum((xs.astype(jnp.float32) - mean) * rstd, 0.0)
        # static quantization of the unit-variance activation
        q = jnp.round(a * (127.0 / act_clip))
        xs8 = jnp.clip(q, 0.0, 127.0).astype(jnp.int8)
    else:
        xs8 = xs
    body = xs8[1 : R + 3]  # (R+2, W, C)
    left = jnp.concatenate([body[:, 1:2], body[:, : W - 1]], axis=1)
    right = jnp.concatenate([body[:, 1:], body[:, W - 2 : W - 1]], axis=1)
    cat3 = jnp.concatenate([left, body, right], axis=-1)  # (R+2, W, 3C) s8
    cout = o_ref.shape[-1]
    acc = jnp.zeros((R * W, cout), jnp.int32)
    for kh in range(3):
        a2 = cat3[kh : kh + R].reshape(R * W, -1)
        acc += jax.lax.dot_general(
            a2, w_ref[kh],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    out = acc.astype(jnp.float32) * ws_ref[0][None, :] + b_ref[0][None, :]
    outc = out.astype(out_dtype)
    o_ref[0] = outc.reshape(R, W, cout)
    of = outc.astype(jnp.float32)
    s = jnp.sum(of, axis=0)
    s2 = jnp.sum(of * of, axis=0)

    @pl.when(t == 0)
    def _():
        stats_ref[0, 0, :] = s
        stats_ref[0, 1, :] = s2

    @pl.when(t != 0)
    def _():
        stats_ref[0, 0, :] += s
        stats_ref[0, 1, :] += s2


def conv3x3_reflect_s8(
    x, w_q, w_scale, b, x_scale=None, norm=None, act_clip: float = 8.0,
    out_dtype=jnp.bfloat16, block_rows=None, interpret=None,
):
    """Reflect-padded 3×3 conv, s8 MXU path, + output statistics.

    Mode (i) — ``x`` int8, ``x_scale`` scalar: pre-quantized input (the
    trunk).  Mode (ii) — ``x`` float raw conv output + ``norm`` (N, 2, C):
    the kernel applies (mean, rstd) + ReLU and quantizes with the static
    ``act_clip`` scale in VMEM.  ``w_q``: (3, 3, C, Cout) int8;
    ``w_scale``: (Cout,) f32.  Returns (y ``out_dtype``, stats (N,2,Cout)).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_rows is None:
        block_rows = BLOCK_ROWS
    n, h, wdim, c = x.shape
    cout = w_q.shape[-1]
    assert wdim % 128 == 0 and c % 128 == 0 and cout % 128 == 0
    prenorm = norm is not None
    if prenorm:
        act_scale = act_clip / 127.0
        assert x_scale is None
    else:
        assert x.dtype == jnp.int8 and x_scale is not None
        act_scale = x_scale  # scalar jnp array ok (folded into wscale below)
    R = block_rows
    while h % R:
        R //= 2
    T = h // R
    kernel = functools.partial(
        _s8_kernel, R=R, T=T, H=h, W=wdim, prenorm=prenorm,
        act_clip=act_clip, out_dtype=out_dtype,
    )
    wscale_comb = (
        jnp.asarray(w_scale, jnp.float32) * act_scale
    ).reshape(1, cout)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((3, 3 * c, cout), lambda ni, ti: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda ni, ti: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda ni, ti: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, w_q.reshape(3, 3 * c, cout), wscale_comb,
            jnp.asarray(b, jnp.float32).reshape(1, cout)]
    if prenorm:
        in_specs.append(
            pl.BlockSpec((1, 2, c), lambda ni, ti: (ni, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(norm.astype(jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(n, T),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, R, wdim, cout), lambda ni, ti: (ni, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, cout), lambda ni, ti: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, wdim, cout), out_dtype),
            jax.ShapeDtypeStruct((n, 2, cout), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, R + 4, wdim, c), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(*args)


def s8_chain_ok(shape) -> bool:
    if len(shape) != 4:
        return False
    _, h, wdim, c = shape
    return wdim % 128 == 0 and h % 2 == 0 and h >= 4 and c % 128 == 0


def fused_residual_chain_s8(x, qblocks, eps: float = 1e-5, act_clip=8.0,
                            interpret=None):
    """The int8 residual body: per block, one XLA pass (epilogue + trunk
    max-abs + quantize) and two s8 Pallas convs.

    ``qblocks``: list of (q1, s1, b1, q2, s2, b2) — per-channel s8 weights
    + scales + biases for both convs (ops/quantize.py layout, kernels
    (3, 3, C, Cout))."""
    n, h, wdim, c = x.shape
    hw = float(h * wdim)
    x = x.astype(jnp.float32)
    for q1, s1, b1, q2, s2, b2 in qblocks:
        amax = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12)
        x_scale = amax / 127.0
        x_s8 = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
        h1, st1 = conv3x3_reflect_s8(
            x_s8, q1, s1, b1, x_scale=x_scale, act_clip=act_clip,
            interpret=interpret,
        )
        n1 = _stats_to_norm(st1, hw, eps)
        h2, st2 = conv3x3_reflect_s8(
            h1, q2, s2, b2, norm=n1, act_clip=act_clip, interpret=interpret,
        )
        n2 = _stats_to_norm(st2, hw, eps)
        mean = n2[:, 0][:, None, None, :]
        rstd = n2[:, 1][:, None, None, :]
        x = x + (h2.astype(jnp.float32) - mean) * rstd
    return x
