"""Pallas TPU kernels for the hot memory-bound ops.

The FLOPs of this workload live in convolutions (XLA already maps those onto
the MXU well); the remaining hot spots are bandwidth-bound elementwise/
reduction chains at 512² resolution. The biggest is InstanceNorm(+activation)
— it appears 20+ times per generator pass. This module provides a fused
two-phase Pallas kernel:

- phase 0 streams each (sample) plane tile-by-tile through VMEM accumulating
  per-channel sum/sum² in fp32 scratch;
- phase 1 revisits the same tiles, normalizing with the finalized statistics
  and applying the activation in the same pass — one kernel launch, two HBM
  reads + one write total, fp32 statistics even for bf16 activations.

Grid layout: ``(N, 2, T)`` — samples × {accumulate, normalize} × row tiles.
TPU grids execute sequentially (last dim fastest), so phase 1 of a sample
always sees its completed phase-0 accumulators; scratch is re-zeroed at the
start of each sample.

Correctness is locked to ``models.layers.instance_norm`` by tests (interpret
mode on CPU, compiled on TPU); ``use_pallas_instance_norm`` gates adoption
in the model stack.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _in_kernel(x_ref, o_ref, acc_ref, *, eps: float, act: Optional[str], hw: int):
    phase = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when((phase == 0) & (t == 0))
    def _reset():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(phase == 0)
    def _accumulate():
        xf = x_ref[0].astype(jnp.float32)  # (bh, W, C)
        s = jnp.sum(xf, axis=(0, 1))
        s2 = jnp.sum(xf * xf, axis=(0, 1))
        acc_ref[0, :] += s
        acc_ref[1, :] += s2

    @pl.when(phase == 1)
    def _normalize():
        mean = acc_ref[0, :] / hw
        var = acc_ref[1, :] / hw - mean * mean
        inv = jax.lax.rsqrt(var + eps)
        xf = x_ref[0].astype(jnp.float32)
        out = (xf - mean[None, None, :]) * inv[None, None, :]
        if act == "relu":
            out = jnp.maximum(out, 0.0)
        elif act == "leaky_relu":
            out = jnp.where(out >= 0.0, out, 0.2 * out)
        o_ref[0] = out.astype(o_ref.dtype)


def instance_norm_pallas(
    x: jnp.ndarray,
    eps: float = 1e-5,
    activation: Optional[str] = None,
    block_rows: int = 16,
    interpret: bool = False,
):
    """Fused InstanceNorm(affine=False)(+activation) for NHWC input."""
    n, h, w, c = x.shape
    block_rows = min(block_rows, h)
    assert h % block_rows == 0, f"H={h} not divisible by block_rows={block_rows}"
    t = h // block_rows

    kernel = functools.partial(
        _in_kernel, eps=eps, act=activation, hw=float(h * w)
    )
    return pl.pallas_call(
        kernel,
        grid=(n, 2, t),
        in_specs=[
            pl.BlockSpec(
                (1, block_rows, w, c),
                lambda ni, p, ti: (ni, ti, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, block_rows, w, c),
            lambda ni, p, ti: (ni, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=interpret,
    )(x)
