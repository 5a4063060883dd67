"""Dense 2-D deformation warp (differentiable grid sample), NHWC.

TPU-native equivalent of the reference's spatial transformer
(trainer/transformer.py:7-31): the reference builds a pixel mesh-grid, adds
the flow, normalizes to [-1,1] and calls ``F.grid_sample(align_corners=True,
padding_mode='border')``. With align_corners=True the normalize/denormalize
round-trips exactly, and border padding on a bilinear sample is equivalent to
clamping the sample coordinate to [0, S-1] — so the TPU formulation works
directly in pixel space: sample ``src`` at ``(y + flow_y, x + flow_x)``
clamped, with bilinear interpolation, implemented as 4 batched gathers
(XLA lowers these well on TPU; the backward pass is the induced scatter-add).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_border(src, coords_y, coords_x):
    """Bilinear sample of ``src`` (N,H,W,C) at absolute pixel coordinates.

    ``coords_y``/``coords_x``: (N, Ho, Wo) float sample locations in pixel
    units; out-of-range coordinates are clamped (== grid_sample border
    padding with align_corners=True). Returns (N, Ho, Wo, C).
    """
    n, h, w, c = src.shape
    cy = jnp.clip(coords_y, 0.0, h - 1.0)
    cx = jnp.clip(coords_x, 0.0, w - 1.0)

    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    wy = cy - y0
    wx = cx - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)

    flat = src.reshape(n, h * w, c)

    def gather(yi, xi):
        idx = (yi * w + xi).reshape(n, -1, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(
            n, cy.shape[1], cy.shape[2], c
        )

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)

    wy = wy[..., None]
    wx = wx[..., None]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def warp2d(src, flow):
    """Warp ``src`` (N,H,W,C) by a dense flow field (N,H,W,2).

    ``flow[..., 0]`` displaces along axis H (rows / y) and ``flow[..., 1]``
    along axis W (cols / x) — the same channel convention as the reference's
    (N,2,H,W) flow (transformer.py:13-29) transposed to NHWC. Differentiable
    in both ``src`` and ``flow``.
    """
    n, h, w, _ = flow.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 2)
    return grid_sample_border(src, yy + flow[..., 0], xx + flow[..., 1])


def warp2d_local(src, flow, max_displacement: int = 4):
    """Gather-free dense warp for locally-bounded flows (TPU fast path).

    TPUs have no hardware gather: the general ``warp2d`` costs ~11 ms fwd /
    ~18 ms bwd at 512² (XLA lowers arbitrary gathers/scatters serially).
    Registration flows are near-identity by construction (zero-init head +
    smoothness loss), so the warp can be rewritten as a dense sum of
    **shifted** images with elementwise masks:

        out = sum_{o in [-R, R+1]^2}  W_o * shift_o(src)

    where ``W_o`` selects, per pixel, the bilinear taps whose integer offset
    equals ``o``. Shifts are static slices of an edge-padded buffer — pure
    VPU work, trivially differentiable (the backward is the transposed
    stack of shifts — no scatter). Exact equivalence with ``warp2d`` for
    ``|flow| <= max_displacement``; larger displacements saturate at R
    (clamped), which the smoothness prior keeps rare.

    Cost grows as (2R+2)^2 masked FMAs — R=4 ≈ 100 terms (~1 ms at 512²).
    """
    n, h, w, _ = flow.shape
    r = int(max_displacement)
    fy = jnp.clip(flow[..., 0], -r, r)
    fx = jnp.clip(flow[..., 1], -r, r)
    yy = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 2)
    # border clamp keeps |effective displacement| <= |flow| <= R
    dy = jnp.clip(yy + fy, 0.0, h - 1.0) - yy
    dx = jnp.clip(xx + fx, 0.0, w - 1.0) - xx
    y0 = jnp.floor(dy)
    x0 = jnp.floor(dx)
    wy = (dy - y0)[..., None]
    wx = (dx - x0)[..., None]

    padded = jnp.pad(
        src, ((0, 0), (r + 1, r + 1), (r + 1, r + 1), (0, 0)), mode="edge"
    )
    out = jnp.zeros_like(src)
    for oy in range(-r, r + 2):
        sel_y = ((y0 == oy) * (1.0 - wy[..., 0]) + (y0 == oy - 1) * wy[..., 0])[
            ..., None
        ]
        for ox in range(-r, r + 2):
            sel_x = (
                (x0 == ox) * (1.0 - wx[..., 0]) + (x0 == ox - 1) * wx[..., 0]
            )[..., None]
            shifted = jax.lax.dynamic_slice(
                padded,
                (0, r + 1 + oy, r + 1 + ox, 0),
                (n, h, w, src.shape[-1]),
            )
            out = out + sel_y * sel_x * shifted
    return out


def warp2d_adaptive(src, flow, max_local_disp: int = 4):
    """Exact warp with a data-adaptive fast path (the TPU default).

    A device-computed predicate ``max|flow| <= R`` picks, per call, between

    - ``warp2d_local(src, flow, R)``: gather-free masked static shifts.
      With the raw flow bounded by R its internal clip is a no-op, so the
      result (and its autodiff, including the border-clamp flow gradient)
      is EXACTLY the bilinear border-padded sample — no saturation ever
      applies on this branch;
    - ``warp2d``: the general gather formulation, for the rare call whose
      flow exceeds R anywhere.

    Registration flows are near-identity by construction (zero-init head +
    smoothness prior), so training takes the shift branch essentially
    always — replacing XLA's serial gather (fwd) and scatter-add (bwd)
    with dense VPU work — while pathological flows silently keep exact
    gather semantics. Differentiable through ``lax.cond`` (each branch
    uses its own autodiff; no custom VJP needed).

    Measured on v5e 512² b=1 (fwd+bwd, isolated): gather 15.8 ms; a
    dynamic-offset ring variant (``warp2d_dense``) 97 ms (dynamic rolls
    lower as unaligned dynamic slices — kept only as a documented negative
    result); this adaptive form rides the warp_max_disp fast path
    (HD step 130.6 -> 113.4 ms in the perf ladder) at exact semantics.

    The predicate is batch-GLOBAL: one outlier pixel (or any NaN, which
    compares false) routes the entire batch through the slow gather branch.
    Semantics stay exact either way — it is a perf cliff only, acceptable
    because trained flows stay well inside the radius (see the perf ladder
    measurements).
    """
    r = int(max_local_disp)
    small = jnp.max(jnp.abs(flow)) <= r
    return jax.lax.cond(
        small,
        lambda args: warp2d_local(args[0], args[1], r),
        lambda args: warp2d(args[0], args[1]),
        (src, flow),
    )


def _corner_fields(h, w, flow):
    """Per-pixel bilinear corner data for the dense ring formulation.

    Returns integer corner offsets (ay0, ay1, ax0, ax1 = corner index minus
    pixel index), fractional weights (wy, wx) and clip-gradient masks
    (inb_y, inb_x), all (N, H, W)."""
    n = flow.shape[0]
    yy = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 2)
    cy_raw = yy.astype(jnp.float32) + flow[..., 0].astype(jnp.float32)
    cx_raw = xx.astype(jnp.float32) + flow[..., 1].astype(jnp.float32)
    cy = jnp.clip(cy_raw, 0.0, h - 1.0)
    cx = jnp.clip(cx_raw, 0.0, w - 1.0)
    y0f = jnp.floor(cy)
    x0f = jnp.floor(cx)
    wy = cy - y0f
    wx = cx - x0f
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    inb_y = (cy_raw >= 0.0) & (cy_raw <= h - 1.0)
    inb_x = (cx_raw >= 0.0) & (cx_raw <= w - 1.0)
    return (y0 - yy, y1 - yy, x0 - xx, x1 - xx, wy, wx, inb_y, inb_x)


def _roll2(x, sy, sx):
    """Circular shift of (N, H, W, C) by dynamic (sy, sx). Wrapped-in values
    are always multiplied by a zero mask at the call sites (the ring masks
    vanish wherever the true shift would leave the image)."""
    return jnp.roll(x, (sy, sx), axis=(1, 2))


def _ring_bounds(ay0, ay1, ax0, ax1):
    dymin = jnp.min(ay0)
    dymax = jnp.max(ay1)
    dxmin = jnp.min(ax0)
    dxmax = jnp.max(ax1)
    ny = dymax - dymin + 1
    nx = dxmax - dxmin + 1
    return dymin, dxmin, ny, nx


@jax.custom_vjp
def warp2d_dense(src, flow):
    """Exact dense warp — same math as ``warp2d`` but gather/scatter-free.

    TPUs lower arbitrary gathers (and especially the backward scatter-add)
    serially: ``warp2d`` costs ~11 ms fwd + ~25 ms bwd at 512². This
    formulation decomposes the bilinear sample by **integer displacement**:

        out(q) = sum_o  m_o(q) * src[q + o],
        m_o(q) = [(1-wy)·1{ay0=oy} + wy·1{ay1=oy}] ·
                 [(1-wx)·1{ax0=ox} + wx·1{ax1=ox}]

    where (ay*, ax*) are the per-pixel integer corner offsets. The offset
    rectangle is computed **from the data on device** (a `fori_loop` with a
    traced trip count), so the cost adapts to the actual flow magnitude:
    registration flows are near-identity (zero-init head + smoothness
    prior), giving a handful of shifted-image FMAs (~0.1 ms) instead of
    gathers. Semantics are exact for ANY flow (unlike ``warp2d_local``,
    which saturates at its radius): each term's shift is a masked roll, and
    pathological flows whose offset rectangle exceeds ``_DENSE_MAX_TERMS``
    fall back to the gather/scatter path inside a ``lax.cond``.

    The custom VJP computes d/dsrc with the transposed ring (rolls of the
    masked cotangent — no scatter) and d/dflow with the derivative masks in
    the same loop, replacing both hot autodiff paths of ``warp2d``.

    MEASURED NEGATIVE RESULT (v5e, 512² b=1 fwd+bwd isolated): 97.2 ms vs
    gather's 15.8 ms — the dynamic (traced-shift) rolls lower to unaligned
    dynamic slices that cost far more than the gathers they replace, and
    the data-dependent trip count defeats XLA's scheduler. Kept as a
    correct, tested formulation for reference; production routing uses
    ``warp2d_adaptive`` (static-shift fast path behind a cond), which
    achieves the intended win. CPU grad is ~2x slower than gather too.
    """
    out, _ = _dense_fwd_impl(src, flow)
    return out


_DENSE_MAX_TERMS = 4096


def _dense_fwd_impl(src, flow):
    n, h, w, c = src.shape
    ay0, ay1, ax0, ax1, wy, wx, _, _ = _corner_fields(h, w, flow)
    dymin, dxmin, ny, nx = _ring_bounds(ay0, ay1, ax0, ax1)
    total = ny * nx

    def ring(_):
        def body(i, acc):
            oy = dymin + i // nx
            ox = dxmin + jax.lax.rem(i, nx)
            my = (1.0 - wy) * (ay0 == oy) + wy * (ay1 == oy)
            mx = (1.0 - wx) * (ax0 == ox) + wx * (ax1 == ox)
            s = _roll2(src, -oy, -ox).astype(jnp.float32)
            return acc + (my * mx)[..., None] * s

        acc = jax.lax.fori_loop(
            0, total, body, jnp.zeros(src.shape, jnp.float32)
        )
        return acc.astype(src.dtype)

    out = jax.lax.cond(
        total <= _DENSE_MAX_TERMS,
        ring,
        lambda _: warp2d(src, flow).astype(src.dtype),
        None,
    )
    return out, (src, flow)


def _dense_fwd(src, flow):
    return _dense_fwd_impl(src, flow)


def _dense_bwd(res, g):
    src, flow = res
    n, h, w, c = src.shape
    ay0, ay1, ax0, ax1, wy, wx, inb_y, inb_x = _corner_fields(h, w, flow)
    dymin, dxmin, ny, nx = _ring_bounds(ay0, ay1, ax0, ax1)
    total = ny * nx
    gf = g.astype(jnp.float32)

    def ring(_):
        def body(i, carry):
            dsrc, ty, tx_ = carry
            oy = dymin + i // nx
            ox = dxmin + jax.lax.rem(i, nx)
            sy0, sy1 = (ay0 == oy).astype(jnp.float32), (ay1 == oy).astype(
                jnp.float32
            )
            sx0, sx1 = (ax0 == ox).astype(jnp.float32), (ax1 == ox).astype(
                jnp.float32
            )
            my = (1.0 - wy) * sy0 + wy * sy1
            mx = (1.0 - wx) * sx0 + wx * sx1
            # d/dsrc: transposed ring — masked cotangent rolled forward
            dsrc = dsrc + _roll2((my * mx)[..., None] * gf, oy, ox)
            # d/dflow: derivative masks against src[q + o]
            sc = jnp.sum(
                gf * _roll2(src, -oy, -ox).astype(jnp.float32), axis=-1
            )
            ty = ty + (sy1 - sy0) * mx * sc
            tx_ = tx_ + my * (sx1 - sx0) * sc
            return dsrc, ty, tx_

        z = jnp.zeros((n, h, w), jnp.float32)
        dsrc, ty, tx_ = jax.lax.fori_loop(
            0, total, body, (jnp.zeros(src.shape, jnp.float32), z, z)
        )
        # clip gradient: zero where the raw coordinate left the image
        return dsrc, ty * inb_y, tx_ * inb_x

    def fallback(_):
        # match the primal's dtype (bf16 src promotes to f32 inside warp2d;
        # the fwd casts back, so the cotangent arrives in src.dtype)
        _, vjp = jax.vjp(
            lambda s, f: warp2d(s, f).astype(src.dtype), src, flow
        )
        ds, df = vjp(g)
        return (
            ds.astype(jnp.float32),
            df[..., 0].astype(jnp.float32),
            df[..., 1].astype(jnp.float32),
        )

    dsrc, ty, tx_ = jax.lax.cond(
        total <= _DENSE_MAX_TERMS, ring, fallback, None
    )
    dflow = jnp.stack([ty, tx_], axis=-1)
    return dsrc.astype(src.dtype), dflow.astype(flow.dtype)


warp2d_dense.defvjp(_dense_fwd, _dense_bwd)


def smoothing_loss(flow):
    """Mean squared forward-difference of the flow field (utils.py:165-173).

    ``flow``: (N, H, W, 2). Matches the reference: mean(dx^2) + mean(dy^2)
    where dy/dx are absolute first differences along H and W.
    """
    dy = flow[:, 1:, :, :] - flow[:, :-1, :, :]
    dx = flow[:, :, 1:, :] - flow[:, :, :-1, :]
    return jnp.mean(dx * dx) + jnp.mean(dy * dy)
