"""Fused 2× transposed-conv (k=3, s=2, p=1, op=1) + InstanceNorm stats.

The generator's up path (ConvTransposeTorch + IN + ReLU, twice —
Model/CycleGan.py:44-52 semantics) costs ~18 ms in-graph of the 512² b=32
forward: XLA materializes the input-dilated buffer and the IN adds full
extra HBM passes.  This kernel computes the transposed conv directly in
**phase form** — from the dilation identity, 1-D:

    out[2q]   = x[q] · K'[1]
    out[2q+1] = x[q] · K'[0] + x[q+1] · K'[2]

(K' = spatially-flipped, channel-swapped kernel; the q+1 term vanishes at
the bottom/right edge where the op-padding is zero).  2-D phases therefore
need 1/2/2/4 taps — 9 (R·W, C)x(C, Cout) MXU matmuls per input row slab,
with NO dilated buffer; the 2R×2W output tile is interleaved in VMEM and
written once.  Per-(sample, channel) sum/sum² of the output accumulate in
the same pass, and the PREVIOUS stage's norm + ReLU folds into the input
read (the ``norm`` stream) — the same chaining contract as
ops/fused_resblock.py.  An XLA-level phase decomposition was measured
first and lost badly (23.0 vs 5.5 ms — the stack/transpose interleave
materializes at 512²); in-kernel the interleave is a VMEM shuffle.

Forward-only (no autodiff rule); used by ``Generator(fused_body=True)``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, *rest, R, T, H, W, prenorm, relu,
            out_dtype):
    if prenorm:
        norm_ref, o_ref, stats_ref, xbuf, sems = rest
    else:
        o_ref, stats_ref, xbuf, sems = rest
        norm_ref = None
    n = pl.program_id(0)
    t = pl.program_id(1)
    lin = n * T + t
    total = pl.num_programs(0) * T
    slot = jax.lax.rem(lin, 2)

    def dma(lin_, slot_, start):
        n_ = lin_ // T
        t_ = lin_ % T
        r0 = t_ * R
        ex = jnp.minimum(r0 + R, H - 1)
        copies = (
            pltpu.make_async_copy(
                x_ref.at[n_, pl.ds(r0, R)], xbuf.at[slot_, pl.ds(0, R)],
                sems.at[slot_, 0],
            ),
            pltpu.make_async_copy(
                x_ref.at[n_, pl.ds(ex, 1)], xbuf.at[slot_, pl.ds(R, 1)],
                sems.at[slot_, 1],
            ),
        )
        for c in copies:
            c.start() if start else c.wait()

    @pl.when(lin == 0)
    def _():
        dma(0, 0, True)

    @pl.when(lin + 1 < total)
    def _():
        dma(lin + 1, jax.lax.rem(lin + 1, 2), True)

    dma(lin, slot, False)

    xs = xbuf[slot]  # (R+1, W, C)
    if prenorm:
        mean = norm_ref[0, 0, :][None, None, :]
        rstd = norm_ref[0, 1, :][None, None, :]
        xn = (xs.astype(jnp.float32) - mean) * rstd
        if relu:
            xn = jnp.maximum(xn, 0.0)
        xs = xn.astype(xbuf.dtype)
    # the q+1 row tap is zero at the bottom edge (output_padding zeros) —
    # in the POST-norm domain: the dilation zeros pad the convT's input,
    # which is the normalized activation
    rows = jax.lax.broadcasted_iota(jnp.int32, (R + 1, 1, 1), 0)
    xs = jnp.where((t == T - 1) & (rows == R), jnp.zeros_like(xs), xs)
    # column q+1 tap: shift left by one, zero at the right edge
    xsh = jnp.concatenate([xs[:, 1:], jnp.zeros_like(xs[:, :1])], axis=1)
    cout = o_ref.shape[-1] // 4  # output block is phase-blocked (4·Cout)

    def mm(a, ty, tx):
        return jnp.dot(a.reshape(R * W, -1), w_ref[ty, tx],
                       preferred_element_type=jnp.float32)

    a0, a1 = xs[:R], xs[1 : R + 1]
    s0, s1 = xsh[:R], xsh[1 : R + 1]
    ph00 = mm(a0, 1, 1)
    ph01 = mm(a0, 1, 0) + mm(s0, 1, 2)
    ph10 = mm(a0, 0, 1) + mm(a1, 2, 1)
    ph11 = mm(a0, 0, 0) + mm(s0, 0, 2) + mm(a1, 2, 0) + mm(s1, 2, 2)
    bias = b_ref[0][None, :].astype(jnp.float32)
    phases = [(p + bias).astype(out_dtype).reshape(R, W, cout)
              for p in (ph00, ph01, ph10, ph11)]
    # PHASE-BLOCKED output: lane-concat the 4 phases —
    # pb[q, r, (2py+px)·Co + co] = out[2q+py, 2r+px, co].  The spatial
    # interleave is not expressible as a Mosaic vector op (stack/expand
    # reshapes are rejected; pltpu.repeat is tile-style), so the deblock
    # is one XLA reshape+transpose outside (``phase_deblock``).
    o_ref[0] = jnp.concatenate(phases, axis=-1)
    # stats over the LOGICAL channel co: sum across the 4 phase slices
    # (of the dtype-rounded stored values, matching the XLA path)
    s = jnp.zeros((cout,), jnp.float32)
    s2 = jnp.zeros((cout,), jnp.float32)
    for p in phases:
        pf = p.astype(jnp.float32)
        s += jnp.sum(pf, axis=(0, 1))
        s2 += jnp.sum(pf * pf, axis=(0, 1))

    @pl.when(t == 0)
    def _():
        stats_ref[0, 0, :] = s
        stats_ref[0, 1, :] = s2

    @pl.when(t != 0)
    def _():
        stats_ref[0, 0, :] += s
        stats_ref[0, 1, :] += s2


def phase_deblock(pb, cout: int):
    """(N, H, W, 4·Cout) phase-blocked -> (N, 2H, 2W, Cout) spatial: one
    XLA reshape+transpose (out[n, 2q+py, 2r+px, co] = pb[n, q, r,
    (2py+px)·Cout + co])."""
    n, h, w, _ = pb.shape
    y = pb.reshape(n, h, w, 2, 2, cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, cout)


def convt2x_stats(x, kernel_t, bias, norm=None, relu: bool = False,
                  block_rows: int = 8, interpret=None):
    """2× transposed conv (k3 s2 p1 op1) + output statistics.

    x: (N, H, W, C); kernel_t: (3, 3, Cout, C) — the flax
    ``ConvTranspose(transpose_kernel=True)`` layout that
    ``ConvTransposeTorch`` stores; bias: (Cout,).  ``norm``/``relu``:
    previous-stage InstanceNorm (N, 2, C) [mean, rstd] + activation fused
    into the input read.  Returns the PHASE-BLOCKED result
    ((N, H, W, 4·Cout) in x.dtype — run ``phase_deblock`` for the spatial
    (N, 2H, 2W, Cout) layout) and stats (N, 2, Cout) f32 [sum, sum²].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = x.shape
    cout = kernel_t.shape[2]
    assert w % 128 == 0 and c % 128 == 0, (w, c)
    R = block_rows
    while h % R:
        R //= 2
    T = h // R
    dt = x.dtype
    # K'[ty, tx, c_in, co] = kernel_t[2-ty, 2-tx, co, c_in]
    kp = jnp.flip(jnp.flip(kernel_t, 0), 1).transpose(0, 1, 3, 2).astype(dt)
    kernel = functools.partial(
        _kernel, R=R, T=T, H=h, W=w, prenorm=norm is not None, relu=relu,
        out_dtype=dt,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((3, 3, c, cout), lambda ni, ti: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda ni, ti: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, kp, bias.reshape(1, cout)]
    if norm is not None:
        in_specs.append(
            pl.BlockSpec((1, 2, c), lambda ni, ti: (ni, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(norm.astype(jnp.float32))
    out, stats = pl.pallas_call(
        kernel,
        grid=(n, T),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, R, w, 4 * cout),
                         lambda ni, ti: (ni, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, cout), lambda ni, ti: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, w, 4 * cout), dt),
            jax.ShapeDtypeStruct((n, 2, cout), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, R + 1, w, c), dt),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(*args)
    return out, stats
