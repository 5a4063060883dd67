"""Fused residual-block Pallas kernel: conv3x3(reflect) + InstanceNorm in one
HBM pass (inference path).

The generator's residual body (Model/CycleGan.py:6-21 semantics; see
models/layers.py::ResidualBlock) is, per block,

    x + IN(conv2(relu(IN(conv1(reflect_pad(x))))))

Executed op-by-op through XLA, every InstanceNorm costs extra full-image HBM
passes (a stats read + a normalize read/write around each conv) — measured
~42 ms of the 512² b=32 bf16 generator forward.  A previous Pallas attempt
that fused ONLY the norm was slower than XLA (kernel boundaries broke XLA's
own fusion, see ops/pallas_kernels.py docstring).  This kernel therefore
fuses the *conv itself* with the norm plumbing so the norm costs no extra
memory traffic at all:

- ``conv3x3_reflect_stats``: one Pallas kernel computes the reflect-padded
  3×3 conv (as 9 (R·W, C)x(C, Cout) MXU matmuls over column-shifted views of
  a row slab) and, in the same pass, the per-(sample, channel) sum / sum² of
  its OWN output.  Optionally it first applies the *previous* norm's
  (mean, rstd) + ReLU to the input rows as they stream through VMEM — so the
  normalize of layer k is fused into the conv of layer k+1.
- The input image stays in HBM (``pl.ANY``); row slabs of R rows plus the
  2 reflect halo rows are streamed in with double-buffered async DMAs
  (3 DMAs per tile: body rows + top/bottom halo rows whose source index
  folds the edge reflection, so no in-kernel fixups are needed).
- Per block the only remaining XLA op is the elementwise
  ``x + (h2 - mean2) * rstd2`` epilogue, which XLA fuses into a single pass.

HBM traffic per block per image drops from ~11 full-image passes (conv r/w
×2 + one-pass-stats reads + normalize r/w ×2 + epilogue) to ~7, and the
stats/normalize arithmetic rides in VPU cycles that overlap the MXU matmuls.

Forward-only: ``pl.pallas_call`` has no autodiff rule, so this path is used
by inference/eval/serving (``Generator(fused_body=True)``) — training keeps
the XLA path.  Parity with the unfused block is locked by
tests/test_fused_resblock.py (interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _issue_or_wait(x_ref, xbuf, sems, lin, slot, *, R, T, H, start: bool):
    """Start (or wait for) the 3 DMAs bringing tile ``lin``'s rows into
    ``xbuf[slot]``: R body rows at positions 2..R+1 and one halo row on each
    side (positions 1 and R+2).  The halo source indices fold the reflect
    boundary (row -1 -> 1, row H -> H-2), so edge tiles need no special
    casing.  Rows 0 and R+3 are dummies: the flattened-slab tap slices (see
    ``_kernel``) graze exactly one element of each, which the kernel zeroes
    before use."""
    n = lin // T
    t = lin % T
    r0 = t * R
    top = jnp.where(t == 0, 1, r0 - 1)
    bot = jnp.where(t == T - 1, H - 2, r0 + R)
    copies = (
        pltpu.make_async_copy(
            x_ref.at[n, pl.ds(r0, R)], xbuf.at[slot, pl.ds(2, R)],
            sems.at[slot, 0],
        ),
        pltpu.make_async_copy(
            x_ref.at[n, pl.ds(top, 1)], xbuf.at[slot, pl.ds(1, 1)],
            sems.at[slot, 1],
        ),
        pltpu.make_async_copy(
            x_ref.at[n, pl.ds(bot, 1)], xbuf.at[slot, pl.ds(R + 2, 1)],
            sems.at[slot, 2],
        ),
    )
    for c in copies:
        c.start() if start else c.wait()


def _kernel(*refs, R, T, H, W, prenorm, relu, skip, emit, out_dtype):
    it = iter(refs)
    x_ref = next(it)
    skip_ref = next(it) if skip else None
    w_ref, b_ref = next(it), next(it)
    norm_ref = next(it) if prenorm else None
    o_ref, stats_ref = next(it), next(it)
    xnew_ref = next(it) if (skip or emit) else None
    xbuf = next(it)
    skipbuf = next(it) if skip else None
    sems = next(it)
    skipsems = next(it) if skip else None
    n = pl.program_id(0)
    t = pl.program_id(1)
    lin = n * T + t
    total = pl.num_programs(0) * T
    slot = jax.lax.rem(lin, 2)

    def dma(lin_, slot_, start):
        _issue_or_wait(x_ref, xbuf, sems, lin_, slot_, R=R, T=T, H=H,
                       start=start)
        if skip:
            _issue_or_wait(skip_ref, skipbuf, skipsems, lin_, slot_,
                           R=R, T=T, H=H, start=start)

    @pl.when(lin == 0)
    def _():
        dma(0, 0, True)

    @pl.when(lin + 1 < total)
    def _():
        dma(lin + 1, jax.lax.rem(lin + 1, 2), True)

    dma(lin, slot, False)

    xs = xbuf[slot]  # (R+4, W, C): dummy, top halo, R body rows, bottom halo
    if prenorm:
        mean = norm_ref[0, 0, :][None, None, :]
        rstd = norm_ref[0, 1, :][None, None, :]
        xn = (xs.astype(jnp.float32) - mean) * rstd
        if relu:
            xn = jnp.maximum(xn, 0.0)
        xs = xn.astype(xbuf.dtype)
        if skip:
            # residual epilogue of the PREVIOUS block fused in: the conv
            # input IS the next block's input x_new = skip + norm(h2) —
            # same rounding order as the unfused epilogue (cast, then add)
            xs = skipbuf[slot] + xs
        if skip or emit:
            # emit the materialized conv input (the block input x_i): the
            # skip stream of the NEXT block's epilogue
            xnew_ref[0] = xs[2 : R + 2]
    # column reflect: col -1 -> 1, col W -> W-2; the three kw taps are
    # stacked along channels so each kh is ONE (R·W, 3C)x(3C, Cout) matmul.
    # A/B'd against a copy-free tap-slice variant (every (kh, kw) tap as a
    # contiguous slice of the row-major-flattened slab + edge corrections):
    # the K=3C matmul wins (4.29 vs 5.16 ms per conv at b=32 on v5e) — the
    # MXU prefers the deeper contraction over saving the VPU concat copies.
    body = xs[1 : R + 3]  # (R+2, W, C): halo + body rows (dummies dropped)
    left = jnp.concatenate([body[:, 1:2], body[:, : W - 1]], axis=1)
    right = jnp.concatenate([body[:, 1:], body[:, W - 2 : W - 1]], axis=1)
    cat3 = jnp.concatenate([left, body, right], axis=-1)  # (R+2, W, 3C)
    cout = o_ref.shape[-1]
    acc = jnp.zeros((R * W, cout), jnp.float32)
    for kh in range(3):
        a = cat3[kh : kh + R].reshape(R * W, -1)
        acc += jnp.dot(a, w_ref[kh], preferred_element_type=jnp.float32)
    out = acc + b_ref[0][None, :].astype(jnp.float32)
    outc = out.astype(out_dtype)
    o_ref[0] = outc.reshape(R, W, cout)
    # stats of the (dtype-rounded) conv output, f32 — matches the XLA path
    # which reduces the stored activations
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


# default row-slab height; tunable (A/B'd on hardware, see
# docs/evidence/bench_fused_body_r1c.log)
BLOCK_ROWS = 8


def conv3x3_reflect_stats(
    x, w, b, norm=None, relu: bool = False, skip=None,
    emit_input: bool = False, block_rows=None, interpret=None,
):
    """Reflect-padded 3×3 conv + per-(sample, channel) output statistics.

    x: (N, H, W, C); w: (3, 3, C, Cout); b: (Cout,).  ``norm``: optional
    (N, 2, C) f32 [mean, rstd] applied (with optional ReLU) to the input as
    it streams through VMEM.  ``skip``: optional (N, H, W, C) residual
    stream (requires ``norm``): the kernel computes x_new = skip + norm(x)
    per row slab — the previous block's epilogue — convolves x_new, and
    returns it as a third output.  ``emit_input`` (requires ``norm``, no
    skip): return the normalized(+activated) conv input as the third
    output instead (materializes the block input when the chain starts
    from a raw upstream tensor).  Returns (raw conv output (N, H, W, Cout)
    in x.dtype, stats (N, 2, Cout) f32 [sum, sum²][, x_new]).  Requires
    W % 128 == 0, H % block_rows == 0, H >= 2 and C/Cout % 128 == 0.
    """
    if interpret is None:  # compiled Mosaic path needs a real TPU backend
        interpret = jax.default_backend() != "tpu"
    if block_rows is None:
        block_rows = BLOCK_ROWS
    n, h, wdim, c = x.shape
    cout = w.shape[-1]
    assert wdim % 128 == 0 and h >= 2, (h, wdim)
    assert c % 128 == 0 and cout % 128 == 0, (c, cout)
    assert skip is None or norm is not None, "skip requires norm"
    assert not emit_input or (norm is not None and skip is None)
    R = block_rows
    while h % R:
        R //= 2
    T = h // R
    dt = x.dtype
    kernel = functools.partial(
        _kernel, R=R, T=T, H=h, W=wdim, prenorm=norm is not None,
        relu=relu, skip=skip is not None, emit=emit_input, out_dtype=dt,
    )
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]  # x in HBM, DMA'd in
    args = [x]
    if skip is not None:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(skip.astype(dt))
    in_specs += [
        pl.BlockSpec((3, 3 * c, cout), lambda ni, ti: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda ni, ti: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    # (3, 3, C, Cout) -> (3, 3C, Cout): rows of each kh slab are ordered
    # (kw, c) — exactly the kernel's [left | center | right] channel stacking
    args += [w.astype(dt).reshape(3, 3 * c, cout), b.reshape(1, cout)]
    if norm is not None:
        in_specs.append(
            pl.BlockSpec((1, 2, c), lambda ni, ti: (ni, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(norm.astype(jnp.float32))
    out_specs = [
        pl.BlockSpec((1, R, wdim, cout), lambda ni, ti: (ni, ti, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, cout), lambda ni, ti: (ni, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n, h, wdim, cout), dt),
        jax.ShapeDtypeStruct((n, 2, cout), jnp.float32),
    ]
    scratch = [pltpu.VMEM((2, R + 4, wdim, c), dt)]
    if skip is not None or emit_input:
        out_specs.append(
            pl.BlockSpec((1, R, wdim, c), lambda ni, ti: (ni, ti, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((n, h, wdim, c), dt))
    if skip is not None:
        scratch.append(pltpu.VMEM((2, R + 4, wdim, c), dt))
    scratch.append(pltpu.SemaphoreType.DMA((2, 3)))
    if skip is not None:
        scratch.append(pltpu.SemaphoreType.DMA((2, 3)))
    res = pl.pallas_call(
        kernel,
        grid=(n, T),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return res


def _stats_to_norm(stats, count: float, eps: float):
    """(N, 2, C) [sum, sum²] -> (N, 2, C) [mean, rstd]; same clamped one-pass
    variance as models.layers.instance_norm."""
    mean = stats[:, 0] / count
    var = jnp.maximum(stats[:, 1] / count - mean * mean, 0.0)
    return jnp.stack([mean, jax.lax.rsqrt(var + eps)], axis=1)


def fused_residual_block(x, k1, b1, k2, b2, eps: float = 1e-5,
                         interpret=None):
    """x + IN(conv2(relu(IN(conv1(x))))) with both convs+norms fused; only
    the final skip-add epilogue runs in XLA (one fused elementwise pass)."""
    n, h, wdim, c = x.shape
    hw = float(h * wdim)
    h1, s1 = conv3x3_reflect_stats(x, k1, b1, interpret=interpret)
    n1 = _stats_to_norm(s1, hw, eps)
    h2, s2 = conv3x3_reflect_stats(
        h1, k2, b2, norm=n1, relu=True, interpret=interpret
    )
    n2 = _stats_to_norm(s2, hw, eps)
    mean = n2[:, 0][:, None, None, :]
    rstd = n2[:, 1][:, None, None, :]
    return x + ((h2.astype(jnp.float32) - mean) * rstd).astype(x.dtype)


def fused_residual_chain(x, block_params, eps: float = 1e-5,
                         in_norm=None, in_relu: bool = False,
                         interpret=None):
    """The generator's whole residual body as a fused-kernel chain.

    ``block_params``: list of (k1, b1, k2, b2) per block.  Block i's
    skip-add epilogue x_{i+1} = x_i + norm(h2_i) is folded into block
    i+1's first conv kernel (the ``skip`` stream), which emits x_{i+1} as
    a by-product — so between kernels NOTHING runs in XLA except the tiny
    (N,2,C) stats→(mean,rstd) conversions, and x_{i+1} is never re-read.
    Only the last block's epilogue is an XLA elementwise pass.

    ``in_norm``/``in_relu``: when the upstream stage hands over its RAW
    output + stats (e.g. the fused down path), the chain folds that final
    norm+activation into block 0's first kernel, which emits the
    materialized block input x_0 (the first skip) as a by-product.
    """
    if not block_params:  # n_residual_blocks=0: nothing to fuse
        return x
    n, h, wdim, c = x.shape
    hw = float(h * wdim)
    h2 = s2 = None
    for i, (k1, b1, k2, b2) in enumerate(block_params):
        if i == 0:
            if in_norm is not None:
                h1, s1, x = conv3x3_reflect_stats(
                    x, k1, b1, norm=in_norm, relu=in_relu,
                    emit_input=True, interpret=interpret,
                )
            else:
                h1, s1 = conv3x3_reflect_stats(
                    x, k1, b1, interpret=interpret
                )
        else:
            n2 = _stats_to_norm(s2, hw, eps)
            h1, s1, x = conv3x3_reflect_stats(
                h2, k1, b1, norm=n2, skip=x, interpret=interpret
            )
        n1 = _stats_to_norm(s1, hw, eps)
        h2, s2 = conv3x3_reflect_stats(
            h1, k2, b2, norm=n1, relu=True, interpret=interpret
        )
    n2 = _stats_to_norm(s2, hw, eps)
    mean = n2[:, 0][:, None, None, :]
    rstd = n2[:, 1][:, None, None, :]
    return x + ((h2.astype(jnp.float32) - mean) * rstd).astype(x.dtype)


def can_fuse(shape) -> bool:
    """Trace-time gate used by the model layer: (N, H, W, C) supported?"""
    if len(shape) != 4:
        return False
    _, h, wdim, c = shape
    return wdim % 128 == 0 and h % 2 == 0 and h >= 4 and c % 128 == 0
