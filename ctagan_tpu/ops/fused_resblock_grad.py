"""Custom-VJP backward kernels for the fused residual body (training path).

Round-1 shipped the fused conv+IN forward (ops/fused_resblock.py) for
inference only — ``pl.pallas_call`` has no autodiff rule, so TRAINING kept
the op-by-op XLA body, and the generator backward was ~26 ms of the 97 ms
HD train step (TODO_r2 sizing; reference hot loop HdTrainer.py:204-228).
This module supplies the backward:

- ``conv3x3_input_grad``: dL/dx of the reflect-padded 3×3 conv.  The
  interior is a zero-padded CORRELATION with the flipped kernel — the same
  9-matmul row-slab Pallas kernel as the forward (halo rows zeroed at the
  image edges instead of reflected); the reflect-pad adjoint then FOLDS the
  four padded border lines back into rows/cols 1 and H-2/W-2 — four thin
  line terms computed in XLA (one (W, C) matmul each, negligible).
- ``conv3x3_weight_grad``: dW as 3 transpose-matmuls per row slab,
  (3C, R·W) x (R·W, Cout), accumulated across the grid in f32 — with the
  forward kernel's streaming norm+ReLU recompute, so conv2's input
  activation a1 = relu(IN1(h1)) is NEVER materialized in HBM; the kernel
  rebuilds it row-slab-by-row-slab from the saved raw conv output + stats.
- ``residual_block_grad`` / ``chain_grad``: the per-block reverse
  (IN backward in XLA — two (N,C) reductions + one fused elementwise pass —
  then the two Pallas conv backward kernels), and
- ``fused_residual_chain_vjp``: a ``jax.custom_vjp`` wrapper over the
  round-1 forward chain that saves (x_i, h1, s1, h2, s2) per block as
  residuals (all by-products the forward already computes).

Numerics: matmuls accumulate f32 (``preferred_element_type``); parity with
``jax.vjp`` of the unfused XLA body is locked by tests/test_fused_grad.py
(interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ctagan_tpu.ops.fused_resblock import (
    BLOCK_ROWS,
    _issue_or_wait,
    _stats_to_norm,
    conv3x3_reflect_stats,
)


# ---------------------------------------------------------------------------
# input gradient: zero-padded correlation kernel + XLA reflect folds
# ---------------------------------------------------------------------------

def _corr_kernel(*refs, R, T, H, W, out_dtype):
    """Row-slab 3×3 conv with ZERO halos (the interior of the reflect-pad
    adjoint). Same DMA/tap structure as the forward kernel."""
    g_ref, w_ref, o_ref, gbuf, sems = refs
    n = pl.program_id(0)
    t = pl.program_id(1)
    lin = n * T + t
    total = pl.num_programs(0) * T
    slot = jax.lax.rem(lin, 2)

    @pl.when(lin == 0)
    def _():
        _issue_or_wait(g_ref, gbuf, sems, 0, 0, R=R, T=T, H=H, start=True)

    @pl.when(lin + 1 < total)
    def _():
        _issue_or_wait(g_ref, gbuf, sems, lin + 1, jax.lax.rem(lin + 1, 2),
                       R=R, T=T, H=H, start=True)

    _issue_or_wait(g_ref, gbuf, sems, lin, slot, R=R, T=T, H=H, start=False)

    gs = gbuf[slot]  # (R+4, W, C)
    # zero the edge halos (the forward DMA reflected them; the adjoint's
    # interior is a zero-padded correlation)
    zrow = jnp.zeros_like(gs[0:1])

    @pl.when(t == 0)
    def _():
        gbuf[slot, 1:2] = zrow

    @pl.when(t == T - 1)
    def _():
        gbuf[slot, R + 2 : R + 3] = zrow

    gs = gbuf[slot]
    body = gs[1 : R + 3]  # (R+2, W, C)
    zcol = jnp.zeros_like(body[:, :1])
    left = jnp.concatenate([zcol, body[:, : W - 1]], axis=1)
    right = jnp.concatenate([body[:, 1:], zcol], axis=1)
    cat3 = jnp.concatenate([left, body, right], axis=-1)  # (R+2, W, 3C)
    cout = o_ref.shape[-1]
    acc = jnp.zeros((R * W, cout), jnp.float32)
    for kh in range(3):
        a = cat3[kh : kh + R].reshape(R * W, -1)
        acc += jnp.dot(a, w_ref[kh], preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(out_dtype).reshape(R, W, cout)


def _corr3x3_zero(g, v, block_rows=None, interpret=None):
    """Zero-padded 3×3 'conv' of g with packed weights v (3, 3C, Cout)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_rows is None:
        block_rows = BLOCK_ROWS
    n, h, wdim, c = g.shape
    cout = v.shape[-1]
    R = block_rows
    while h % R:
        R //= 2
    T = h // R
    dt = g.dtype
    kernel = functools.partial(_corr_kernel, R=R, T=T, H=h, W=wdim,
                               out_dtype=dt)
    return pl.pallas_call(
        kernel,
        grid=(n, T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 3 * c, cout), lambda ni, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, wdim, cout),
                               lambda ni, ti: (ni, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wdim, cout), dt),
        scratch_shapes=[
            pltpu.VMEM((2, R + 4, wdim, c), dt),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(g, v.astype(dt))


def _flip_pack(w):
    """(3, 3, C, Cout) conv kernel -> packed adjoint weights
    (3, 3*Cout, C): flip kh/kw, swap in/out, rows ordered (kw, cout)."""
    v = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)  # (kh, kw, Cout, C)
    return v.reshape(3, 3 * w.shape[3], w.shape[2])


def conv3x3_input_grad(g, w, interpret=None):
    """dL/dx of y = conv3x3(reflect_pad(x), w) given dL/dy = g.

    Interior: Pallas zero-pad correlation with the flipped kernel.  The
    reflect-pad adjoint folds the four padded border lines back inside:
    row -1 of the padded grad belongs to row 1, row H to row H-2, col -1 to
    col 1, col W to col W-2 — each is one (W or H, C) tap-matmul in XLA.
    Sequential row-then-column folding composes the corner terms exactly.
    """
    n, h, wdim, c = g.shape
    cout = w.shape[2]  # input channels of the forward conv
    v = _flip_pack(w)
    dx = _corr3x3_zero(g, v, interpret=interpret).astype(jnp.float32)

    wf = w.astype(jnp.float32)
    gf = g.astype(jnp.float32)

    # --- row folds: padded rows -1 and H ---
    # dxp[-1, c'] = sum_kw W[0, kw]^T g[0, c'+1-kw]  (only kh=0 reaches -1)
    def corr_row(grow, wrow):
        # grow: (N, W, Co); wrow: (3, C, Co) for a fixed kh (already in
        # forward orientation); returns (N, W, C) zero-padded 1-D corr
        z = jnp.zeros_like(grow[:, :1])
        gp = jnp.concatenate([z, grow, z], axis=1)  # (N, W+2, Co)
        out = jnp.zeros((grow.shape[0], grow.shape[1], wrow.shape[1]),
                        jnp.float32)
        for kw in range(3):
            # dx[., j] += W[kw]^T g[., j + 1 - kw]
            seg = gp[:, 2 - kw : 2 - kw + grow.shape[1]]
            out = out + jnp.einsum("nwo,co->nwc", seg, wrow[kw])
        return out

    top = corr_row(gf[:, 0], wf[0])       # padded row -1 -> folds to row 1
    bot = corr_row(gf[:, h - 1], wf[2])   # padded row H  -> folds to row H-2
    dx = dx.at[:, 1].add(top)
    dx = dx.at[:, h - 2].add(bot)

    # --- column folds on the row-folded field ---
    # padded col -1: only kw=0 reaches it; value = sum_kh W[kh,0]^T g[r+1-kh, 0]
    def corr_col(gcol, wcol):
        # gcol: (N, H, Co); wcol: (3, C, Co) indexed by kh
        z = jnp.zeros_like(gcol[:, :1])
        gp = jnp.concatenate([z, gcol, z], axis=1)
        out = jnp.zeros((gcol.shape[0], gcol.shape[1], wcol.shape[1]),
                        jnp.float32)
        for kh in range(3):
            seg = gp[:, 2 - kh : 2 - kh + gcol.shape[1]]
            out = out + jnp.einsum("nho,co->nhc", seg, wcol[kh])
        return out

    lcol = corr_col(gf[:, :, 0], wf[:, 0])
    rcol = corr_col(gf[:, :, wdim - 1], wf[:, 2])
    # corner contributions: padded (-1, -1) etc. come from g[0, 0] through
    # W[0, 0] and must land on (1, 1) — added explicitly (the row/col line
    # folds above cover only interior positions of the padded border lines):
    for (gr, gc), (kh, kw), (tr, tc) in (
        ((0, 0), (0, 0), (1, 1)),
        ((0, wdim - 1), (0, 2), (1, wdim - 2)),
        ((h - 1, 0), (2, 0), (h - 2, 1)),
        ((h - 1, wdim - 1), (2, 2), (h - 2, wdim - 2)),
    ):
        corner = jnp.einsum("no,co->nc", gf[:, gr, gc], wf[kh, kw])
        dx = dx.at[:, tr, tc].add(corner)
    dx = dx.at[:, :, 1].add(lcol)
    dx = dx.at[:, :, wdim - 2].add(rcol)
    return dx.astype(g.dtype)


# ---------------------------------------------------------------------------
# weight gradient kernel (with streaming norm/relu/skip recompute)
# ---------------------------------------------------------------------------

def _wgrad_kernel(*refs, R, T, H, W, prenorm, relu, skip):
    it = iter(refs)
    x_ref = next(it)
    skip_ref = next(it) if skip else None
    g_ref = next(it)
    norm_ref = next(it) if prenorm else None
    dw_ref = next(it)
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

    xs = xbuf[slot]  # (R+4, W, C)
    if prenorm:
        mean = norm_ref[0, 0, :][None, None, :]
        rstd = norm_ref[0, 1, :][None, None, :]
        xn = (xs.astype(jnp.float32) - mean) * rstd
        if relu:
            xn = jnp.maximum(xn, 0.0)
        xs = xn.astype(xbuf.dtype)
        if skip:
            xs = skipbuf[slot] + xs
    body = xs[1 : R + 3]
    left = jnp.concatenate([body[:, 1:2], body[:, : W - 1]], axis=1)
    right = jnp.concatenate([body[:, 1:], body[:, W - 2 : W - 1]], axis=1)
    cat3 = jnp.concatenate([left, body, right], axis=-1)  # (R+2, W, 3C)
    gs = g_ref[0]  # (R, W, Cout)
    cout = gs.shape[-1]
    gflat = gs.reshape(R * W, cout)
    for kh in range(3):
        a = cat3[kh : kh + R].reshape(R * W, -1)
        d = jax.lax.dot_general(
            a, gflat,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (3C, Cout)

        @pl.when(lin == 0)
        def _(kh=kh, d=d):
            dw_ref[kh] = d

        @pl.when(lin != 0)
        def _(kh=kh, d=d):
            dw_ref[kh] += d


def conv3x3_weight_grad(
    x, g, norm=None, relu: bool = False, skip=None,
    block_rows=None, interpret=None,
):
    """dL/dW of y = conv3x3(reflect_pad(f(x)), W) given g = dL/dy, where
    f is the optional streaming (norm, relu, +skip) recompute — so conv2's
    weight grad never materializes relu(IN1(h1)).  Returns (3, 3, C, Cout)
    f32.  Bias grad is a plain XLA sum (``g.sum((0,1,2))``)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_rows is None:
        block_rows = BLOCK_ROWS
    n, h, wdim, c = x.shape
    cout = g.shape[-1]
    R = block_rows
    while h % R:
        R //= 2
    T = h // R
    dt = x.dtype
    kernel = functools.partial(
        _wgrad_kernel, R=R, T=T, H=h, W=wdim,
        prenorm=norm is not None, relu=relu, skip=skip is not None,
    )
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    args = [x]
    if skip is not None:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(skip.astype(dt))
    in_specs.append(
        pl.BlockSpec((1, R, wdim, cout), lambda ni, ti: (ni, ti, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    args.append(g.astype(dt))
    if norm is not None:
        in_specs.append(
            pl.BlockSpec((1, 2, c), lambda ni, ti: (ni, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(norm.astype(jnp.float32))
    scratch = [pltpu.VMEM((2, R + 4, wdim, c), dt)]
    if skip is not None:
        scratch.append(pltpu.VMEM((2, R + 4, wdim, c), dt))
    scratch.append(pltpu.SemaphoreType.DMA((2, 3)))
    if skip is not None:
        scratch.append(pltpu.SemaphoreType.DMA((2, 3)))
    dw = pl.pallas_call(
        kernel,
        grid=(n, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, 3 * c, cout), lambda ni, ti: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 3 * c, cout), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return dw.reshape(3, 3, c, cout)


# ---------------------------------------------------------------------------
# instance-norm backward (XLA: two reductions + one fused elementwise pass)
# ---------------------------------------------------------------------------

def _in_bwd(g, h, norm):
    """dL/dh of y = (h - mean) * rstd given g = dL/dy and the forward
    (mean, rstd) ``norm`` (N, 2, C).  Standard IN backward:
    dh = rstd * (g - mean(g) - xhat * mean(g * xhat))."""
    mean = norm[:, 0][:, None, None, :]
    rstd = norm[:, 1][:, None, None, :]
    gf = g.astype(jnp.float32)
    xhat = (h.astype(jnp.float32) - mean) * rstd
    gm = jnp.mean(gf, axis=(1, 2), keepdims=True)
    gxm = jnp.mean(gf * xhat, axis=(1, 2), keepdims=True)
    return rstd * (gf - gm - xhat * gxm)


# ---------------------------------------------------------------------------
# the chain VJP
# ---------------------------------------------------------------------------

def _chain_fwd_collect(x, block_params, eps, interpret=None):
    """Forward chain (same fusion layout as fused_residual_chain) that also
    returns the per-block residuals (x_i, h1, n1, h2, n2)."""
    n, h, wdim, c = x.shape
    hw = float(h * wdim)
    res = []
    h2 = s2 = None
    for i, (k1, b1, k2, b2) in enumerate(block_params):
        if i == 0:
            h1, s1 = conv3x3_reflect_stats(x, k1, b1, interpret=interpret)
        else:
            n2 = _stats_to_norm(s2, hw, eps)
            res[-1] = res[-1] + (n2,)
            h1, s1, x = conv3x3_reflect_stats(
                h2, k1, b1, norm=n2, skip=x, interpret=interpret
            )
        n1 = _stats_to_norm(s1, hw, eps)
        h2, s2 = conv3x3_reflect_stats(
            h1, k2, b2, norm=n1, relu=True, interpret=interpret
        )
        res.append((x, h1, n1, h2))
    n2 = _stats_to_norm(s2, hw, eps)
    mean = n2[:, 0][:, None, None, :]
    rstd = n2[:, 1][:, None, None, :]
    out = x + ((h2.astype(jnp.float32) - mean) * rstd).astype(x.dtype)
    res[-1] = res[-1] + (n2,)
    return out, res


def _block_bwd(g_out, x, h1, n1, h2, n2, k1, k2, interpret=None):
    """Reverse one residual block.  g_out: grad wrt the block output
    x + IN2(conv2(relu(IN1(conv1(x))))).  Returns (dx, dk1, db1, dk2, db2).
    """
    gf = g_out
    # IN2 backward (natural norm: mean/rstd derived from h2's own stats, so
    # the full three-term formula applies)
    dh2 = _in_bwd(gf, h2, n2)
    dh2c = dh2.astype(h2.dtype)
    db2 = jnp.sum(dh2, axis=(0, 1, 2))
    # conv2 backward: input grad + weight grad (a1 recomputed in-kernel)
    da1 = conv3x3_input_grad(dh2c, k2, interpret=interpret)
    dk2 = conv3x3_weight_grad(h1, dh2c, norm=n1, relu=True,
                              interpret=interpret)
    # relu backward: a1 > 0 <=> h1 > mean1 (rstd > 0)
    mean1 = n1[:, 0][:, None, None, :]
    dh1n = jnp.where(h1.astype(jnp.float32) > mean1, da1.astype(jnp.float32),
                     0.0)
    # IN1 backward
    dh1 = _in_bwd(dh1n, h1, n1)
    dh1c = dh1.astype(h1.dtype)
    db1 = jnp.sum(dh1, axis=(0, 1, 2))
    # conv1 backward
    dx = conv3x3_input_grad(dh1c, k1, interpret=interpret)
    dk1 = conv3x3_weight_grad(x, dh1c, interpret=interpret)
    return gf + dx.astype(jnp.float32), dk1, db1, dk2, db2


def fused_chain_vjp_make(eps: float = 1e-5, interpret=None):
    """Build a custom-VJP fused_residual_chain (plain form: no in_norm) for
    the training path.  block_params is a pytree argument, so one jitted
    function serves any block count."""

    @jax.custom_vjp
    def chain(x, block_params):
        out, _ = _chain_fwd_collect(x, block_params, eps, interpret)
        return out

    def fwd(x, block_params):
        out, res = _chain_fwd_collect(x, block_params, eps, interpret)
        return out, (res, block_params, x.shape)

    def bwd(saved, g):
        res, block_params, xshape = saved
        gf = g.astype(jnp.float32)
        grads = []
        n_blocks = len(block_params)
        for i in range(n_blocks - 1, -1, -1):
            x_i, h1, n1, h2, n2 = res[i]
            k1, b1, k2, b2 = block_params[i]
            gf, dk1, db1, dk2, db2 = _block_bwd(
                gf, x_i, h1, n1, h2, n2, k1, k2, interpret
            )
            grads.append(
                (
                    dk1.astype(k1.dtype),
                    db1.astype(b1.dtype),
                    dk2.astype(k2.dtype),
                    db2.astype(b2.dtype),
                )
            )
        grads.reverse()
        return gf.astype(res[0][0].dtype), grads

    chain.defvjp(fwd, bwd)
    return chain
