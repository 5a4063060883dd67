"""Reflect-'same' convolution without the materialized padded copy.

The reference pads with ``nn.ReflectionPad2d`` before every 7x7 head/tail
conv and every residual-block conv (Model/CycleGan.py:26-28,33-38,48-50).
A literal translation (``jnp.pad(mode='reflect')`` then conv) makes XLA
materialize a full (H+2p, W+2p) copy of the activation in HBM per conv —
pure bandwidth tax: at 512^2 b=32 the pad_mode=zero ablation runs 99.4 ms
vs 116.6 ms full-fused (docs/evidence/bench_probes_r3.log), but zero
padding changes the math.

``conv_same_borderfix`` keeps reflect semantics with no padded copy: the
bulk of the output comes from a zero-padded conv (XLA fuses the zero
padding into the conv window — nothing is materialized), and only the
p-pixel border — whose receptive field actually touches the padding — is
recomputed from thin (k-1)-row/col strips that ARE reflect-padded, then
patched over the zero-pad result in place. The decomposition is EXACT in
real arithmetic (interior receptive fields never see the padding; border
windows are recomputed with the true reflect neighborhood in the same
dtype). In floats the only deviation is reduction-order: XLA may lower the
fused-padding conv with a different accumulation association than the
VALID conv over a padded copy (measured ≤ ~2 ulp of the k²·C-term window
sum on CPU; tests/test_border_conv.py locks tight tolerances + exact-mean
agreement).

Cost: strips are (k-1) x W and H x (k-1) — for the generator's 7x7 head at
512^2 that is ~1% of the pixels; the dynamic-update-slices are in-place
patches. Everything is plain XLA and differentiable, so the training path
can use it as well.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _conv(x, kernel, pad_h: int, pad_w: int):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((pad_h, pad_h), (pad_w, pad_w)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_same_borderfix(x, kernel, bias=None, dtype=None):
    """k x k stride-1 'same' conv with exact reflect-padding semantics.

    x: (N, H, W, C_in); kernel: (kh, kw, C_in, C_out); bias: (C_out,).
    Equals ``conv(reflect_pad(x, k//2)) [+ bias]`` exactly in real
    arithmetic (float deviation: reduction-order only, see module doc),
    without materializing the padded copy. Requires odd kh/kw >= 3 and
    H >= kh, W >= kw (the reflect source rows/cols 1..p must lie inside
    the (k-1)-wide strips, true for any odd k >= 3).
    """
    kh, kw = kernel.shape[:2]
    ph, pw = kh // 2, kw // 2
    # dtype promotion mirrors flax.linen.Conv: explicit dtype wins, else the
    # common result type of (x, kernel, bias) — so swapping this in for
    # ConvTorch(reflect_pad(x)) changes no numerics
    if dtype is None:
        dtype = jnp.result_type(
            x, kernel, *(() if bias is None else (bias,))
        )
    x = x.astype(dtype)
    kernel = kernel.astype(dtype)
    if bias is not None:
        bias = bias.astype(dtype)
    n, h, w, _ = x.shape
    if h < kh or w < kw:  # degenerate: fall back to the padded-copy form
        xp = jnp.pad(
            x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="reflect"
        )
        y = _conv(xp, kernel, 0, 0)
        return y if bias is None else y + bias

    def patch(y, x_strip, pad_spec, at):
        s = jnp.pad(x_strip, ((0, 0),) + pad_spec + ((0, 0),),
                    mode="reflect")
        t = _conv(s, kernel, 0, 0)
        if bias is not None:
            t = t + bias
        return jax.lax.dynamic_update_slice(y, t, (0,) + at + (0,))

    y = _conv(x, kernel, ph, pw)  # zero pad, fused into the conv window
    if bias is not None:
        y = y + bias
    # top/bottom strips: full-width rows [0, ph) and [h-ph, h) — reflect in
    # H on the outer side only (VALID in H yields exactly ph rows), full
    # reflect in W so the corners come out right in the same pass
    y = patch(y, x[:, : kh - 1], ((ph, 0), (pw, pw)), (0, 0))
    y = patch(y, x[:, h - kh + 1 :], ((0, ph), (pw, pw)), (h - ph, 0))
    # left/right strips: full-height cols [0, pw) and [w-pw, w) — corners
    # get rewritten with bit-identical values (same window, same op)
    y = patch(y, x[:, :, : kw - 1], ((ph, ph), (pw, 0)), (0, 0))
    y = patch(y, x[:, :, w - kw + 1 :], ((ph, ph), (0, pw)), (0, w - pw))
    return y
