"""Fused stride-2 3×3 conv (zero pad 1) + InstanceNorm stats — the
generator's downsampling stages (Model/CycleGan.py:33-41 semantics).

The stride-2 conv becomes a stride-1 problem through a FREE reshape: NHWC
row-major means (H, W, C) -> (H/2, 2, W/2, 2C) costs nothing, and the 3×3
taps of output (i, j) map to

    rows  2i+kh-1  ->  packed (i + (kh+1)//2 - 1, (kh+1) % 2)
    cols  2j+kw-1  ->  the low/high C-halves of packed cols j-1, j

so each kh is again ONE (R·W/2, 3C)x(3C, Cout) MXU matmul over a
[left-hi | lo | hi] channel concat (exactly the body kernel's cat3 form).
Zero padding applies in the POST-norm domain (the conv's input is the
normalized activation), handled by masking after the fused prenorm.  The
previous stage's InstanceNorm + ReLU folds into the input read; per-channel
sum/sum² of the raw output accumulate in the same pass and feed the next
consumer (the second down stage, then the residual chain's ``in_norm``).

Forward-only; used by ``Generator(fused_body=True)``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(*refs, R, T, H2, W2, prenorm, relu, out_dtype):
    if prenorm:
        x_ref, w_ref, b_ref, norm_ref, o_ref, stats_ref, xbuf, sems = refs
    else:
        x_ref, w_ref, b_ref, o_ref, stats_ref, xbuf, sems = refs
        norm_ref = None
    n = pl.program_id(0)
    t = pl.program_id(1)
    lin = n * T + t
    total = pl.num_programs(0) * T
    slot = jax.lax.rem(lin, 2)

    def dma(lin_, slot_, start):
        n_ = lin_ // T
        t_ = lin_ % T
        i0 = t_ * R
        top = jnp.maximum(i0 - 1, 0)  # packed halo row (zeroed at t==0)
        copies = (
            pltpu.make_async_copy(
                x_ref.at[n_, pl.ds(i0, R)], xbuf.at[slot_, pl.ds(1, R)],
                sems.at[slot_, 0],
            ),
            pltpu.make_async_copy(
                x_ref.at[n_, pl.ds(top, 1)], xbuf.at[slot_, pl.ds(0, 1)],
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

    xs = xbuf[slot]  # (R+1, 2, W2, 2C): packed rows i0-1 .. i0+R-1
    if prenorm:
        # norm vectors arrive pre-tiled to the packed 2C layout (the C=64
        # case would otherwise need 64-lane slices, which Mosaic rejects)
        mean = norm_ref[0, 0, :][None, None, None, :]
        rstd = norm_ref[0, 1, :][None, None, None, :]
        xn = (xs.astype(jnp.float32) - mean) * rstd
        if relu:
            xn = jnp.maximum(xn, 0.0)
        xs = xn.astype(xbuf.dtype)
    # zero padding (post-norm domain): original row -1 lives at packed slab
    # position (0, 1) of the first tile
    rows = jax.lax.broadcasted_iota(jnp.int32, xs.shape, 0)
    sub = jax.lax.broadcasted_iota(jnp.int32, xs.shape, 1)
    xs = jnp.where((t == 0) & (rows == 0) & (sub == 1),
                   jnp.zeros_like(xs), xs)
    # keep full 2C lane groups (no C-halving slices): the tap matrix is
    # [prev packed col | current packed col] = 4C channels, matched by
    # weights whose first C block is zero (col 2j-2 never contributes)
    prev = jnp.concatenate(
        [jnp.zeros_like(xs[:, :, :1]), xs[:, :, : W2 - 1]], axis=2
    )
    cat2 = jnp.concatenate([prev, xs], axis=-1)  # (R+1, 2, W2, 4C)
    cout = o_ref.shape[-1]
    acc = jnp.zeros((R * W2, cout), jnp.float32)
    # row tap kh: original row 2i+kh-1 -> packed (i + (kh+1)//2 - 1,
    # (kh+1) % 2); slab position = packed row - (i0 - 1)
    for kh in range(3):
        p_off = (kh + 1) // 2  # 0, 1, 1
        s_idx = (kh + 1) % 2   # 1, 0, 1
        a = cat2[p_off : p_off + R, s_idx].reshape(R * W2, -1)
        acc += jnp.dot(a, w_ref[kh], preferred_element_type=jnp.float32)
    out = acc + b_ref[0][None, :].astype(jnp.float32)
    outc = out.astype(out_dtype)
    o_ref[0] = outc.reshape(R, W2, cout)
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


def conv3x3_s2_zero_stats(x, w, b, norm=None, relu: bool = False,
                          block_rows: int = 8, interpret=None):
    """Stride-2 3×3 conv (zero pad 1) + per-(sample, channel) output stats.

    x: (N, H, W, C) with H, W even; w: (3, 3, C, Cout); b: (Cout,).
    ``norm``: optional (N, 2, C) f32 [mean, rstd] (+``relu``) fused into
    the input read.  Returns ((N, H/2, W/2, Cout) in x.dtype, (N, 2, Cout)
    f32 [sum, sum²]).  Requires (W/2) % 128 == 0 and 2C % 128 == 0.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, wdim, c = x.shape
    cout = w.shape[-1]
    h2, w2 = h // 2, wdim // 2
    assert h % 2 == 0 and wdim % 2 == 0
    assert w2 % 128 == 0 and (2 * c) % 128 == 0 and cout % 128 == 0
    R = block_rows
    while h2 % R:
        R //= 2
    T = h2 // R
    dt = x.dtype
    xp = x.reshape(n, h2, 2, w2, 2 * c)  # free view, row-major
    kernel = functools.partial(
        _kernel, R=R, T=T, H2=h2, W2=w2, prenorm=norm is not None,
        relu=relu, out_dtype=dt,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((3, 4 * c, cout), lambda ni, ti: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda ni, ti: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    # weight rows per kh: [zero (col 2j-2) | kw0 | kw1 | kw2] — the 4C tap
    # matrix built in-kernel from two full packed columns
    wz = jnp.concatenate(
        [jnp.zeros((3, 1) + w.shape[2:], w.dtype), w], axis=1
    )
    args = [xp, wz.astype(dt).reshape(3, 4 * c, cout), b.reshape(1, cout)]
    if norm is not None:
        # tile the per-channel stats to the packed (parity, c) 2C layout
        norm2 = jnp.concatenate([norm, norm], axis=-1).astype(jnp.float32)
        in_specs.append(
            pl.BlockSpec((1, 2, 2 * c), lambda ni, ti: (ni, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(norm2)
    out, stats = pl.pallas_call(
        kernel,
        grid=(n, T),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, R, w2, cout), lambda ni, ti: (ni, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, cout), lambda ni, ti: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h2, w2, cout), dt),
            jax.ShapeDtypeStruct((n, 2, cout), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, R + 1, 2, w2, 2 * c), dt),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(*args)
    return out, stats
