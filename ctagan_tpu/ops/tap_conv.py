"""Tap-decomposed convolutions for MXU-degenerate channel counts.

The generator's head (7×7, 1→64) and tail (7×7, 64→1) convs
(Model/CycleGan.py:26-28, 48-50) are pathological on the MXU: the
contraction (head, K=49) or the output (tail, N=1) fills a tiny fraction of
the 128-lane systolic array, and XLA's direct conv lowering pays the full
padded cost — measured 18.2 ms (head) / 43.7 ms (tail) of the 512² b=32
bf16 forward, ~10-30× off roofline. The RegNet's 512²-level input conv
(3×3, 2→32, trainer/reg.py:64) and flow head (3×3, 32→2, :128) share the
same degeneracy, so the decompositions are kernel-size-generic
(``conv_head_taps`` / ``conv_tail_taps``; the ``conv7_*`` names are
back-compat wrappers).

Both decompose exactly in real arithmetic into dense pieces the hardware
likes; in low precision the only deviation from the direct conv is one
extra rounding of the tap image to ``x.dtype`` between the matmul and the
shifted-add accumulation (~1 ulp per tap in bf16 — keeping the tap image
f32 would double its HBM traffic, which is what the decomposition exists
to avoid). The head path has no such rounding (single matmul, f32
accumulate):

- head  (small C_in): im2col by 49 static slices of the reflect-padded
  input → ONE (H·W, 49·C_in) x (49·C_in, C_out) matmul.
- tail  (small C_out): pointwise matmul x @ K_taps → a 49·C_out tap image,
  reflect-pad, then 49 static shifted adds (reflect-pad commutes with the
  pointwise matmul, so padding the tap image equals padding the input).

Everything is plain XLA (slices + matmul) — differentiable, so the
training path uses it too. The routing lives in models/generator.py
(``tap_heads``, default on TPU).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _pad2d(x, p, mode):
    return _pad2d2(x, p, p, mode)


def _pad2d2(x, py, px, mode):
    if mode == "zero":
        return jnp.pad(x, ((0, 0), (py, py), (px, px), (0, 0)))
    return jnp.pad(x, ((0, 0), (py, py), (px, px), (0, 0)), mode=mode)


def conv_head_taps(x, kernel, bias, pad_mode: str = "reflect"):
    """k×k 'same' conv for small C_in: im2col slices + one matmul.

    x: (N, H, W, C_in); kernel: (kh, kw, C_in, C_out); bias: (C_out,).
    Used for the generator's 7×7 head (1→64) and the RegNet's 3×3 input
    conv (2→32, trainer/reg.py:64) — any conv whose direct lowering wastes
    the MXU contraction dimension on a tiny C_in.
    """
    n, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    xp = _pad2d2(x, kh // 2, kw // 2, pad_mode)
    taps = [
        xp[:, dy : dy + h, dx : dx + w, :]
        for dy in range(kh)
        for dx in range(kw)
    ]
    s = jnp.concatenate(taps, axis=-1)  # (N, H, W, kh*kw*C_in), tap-major
    k = kernel.astype(s.dtype).reshape(kh * kw * cin, cout)
    out = jax.lax.dot_general(
        s.reshape(n * h * w, kh * kw * cin), k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = out + bias.astype(jnp.float32)
    return out.reshape(n, h, w, cout).astype(x.dtype)


def conv7_head_taps(x, kernel, bias, pad_mode: str = "reflect"):
    """7×7 'same' conv for small C_in (back-compat wrapper)."""
    return conv_head_taps(x, kernel, bias, pad_mode)


def conv3d_head_taps(x, kernel, bias):
    """(kd, kh, kw) 'same'(zero) 3-D conv for small C_in: im2col slices +
    one matmul — the volumetric generator's head ((3,7,7), 1→32,
    models/volumetric.py) wastes the MXU contraction dim through the
    direct lowering exactly like the 2-D head. The tap image is
    kd·kh·kw·C_in channels wide, so this is for C_in ~ 1-2 only.

    x: (N, D, H, W, C_in); kernel: (kd, kh, kw, C_in, C_out); b: (C_out,).
    """
    n, d, h, w, cin = x.shape
    kd, kh, kw = kernel.shape[:3]
    cout = kernel.shape[-1]
    taps = kd * kh * kw
    pz, py, px = kd // 2, kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (pz, pz), (py, py), (px, px), (0, 0)))
    cols = [
        xp[:, dz : dz + d, dy : dy + h, dx : dx + w, :]
        for dz in range(kd)
        for dy in range(kh)
        for dx in range(kw)
    ]
    s = jnp.concatenate(cols, axis=-1)  # (N, D, H, W, taps*C_in), tap-major
    k = kernel.astype(s.dtype).reshape(taps * cin, cout)
    out = jax.lax.dot_general(
        s.reshape(-1, taps * cin), k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = out + bias.astype(jnp.float32)
    return out.reshape(n, d, h, w, cout).astype(x.dtype)


def conv3d_tail_taps(x, kernel, bias):
    """(3, 7, 7) 'same'(zero) 3-D conv for small C_out — the volumetric
    generator's tail (models/volumetric.py): matmul into a 147-tap image +
    147 static shifted adds. Same trick as ``conv7_tail_taps`` one
    dimension up; the direct lowering wastes 127/128 MXU lanes on C_out=1.

    x: (N, D, H, W, C_in); kernel: (3, 7, 7, C_in, C_out); bias: (C_out,).
    """
    n, d, h, w, cin = x.shape
    kd, kh, kw = kernel.shape[:3]
    cout = kernel.shape[-1]
    taps = kd * kh * kw
    k = kernel.astype(x.dtype).transpose(3, 0, 1, 2, 4).reshape(
        cin, taps * cout
    )
    y = jax.lax.dot_general(
        x.reshape(-1, cin), k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(n, d, h, w, taps * cout).astype(x.dtype)
    pz, py, px = kd // 2, kh // 2, kw // 2
    yp = jnp.pad(
        y, ((0, 0), (pz, pz), (py, py), (px, px), (0, 0))
    )
    out = jnp.zeros((n, d, h, w, cout), jnp.float32)
    for dz in range(kd):
        for dy in range(kh):
            for dx in range(kw):
                t = (dz * kh + dy) * kw + dx
                out = out + yp[
                    :, dz : dz + d, dy : dy + h, dx : dx + w,
                    t * cout : (t + 1) * cout,
                ]
    return (out + bias.astype(jnp.float32)).astype(x.dtype)


def conv_tail_taps(x, kernel, bias, pad_mode: str = "reflect"):
    """k×k 'same' conv for small C_out: matmul to tap space + kh·kw shifted
    adds.  Padding the tap image equals padding the input for both reflect
    (pointwise-commuting) and zero (linear map of 0 is 0) modes.

    x: (N, H, W, C_in); kernel: (kh, kw, C_in, C_out); bias: (C_out,).
    Used for the generator's 7×7 tail (64→1) and the RegNet's 3×3 flow
    head (32→2, trainer/reg.py:128) — any conv whose direct lowering
    wastes the MXU output lanes on a tiny C_out.
    """
    n, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    taps = kh * kw
    # (C_in, taps*C_out), tap-major to match the shift loop below
    k = kernel.astype(x.dtype).transpose(2, 0, 1, 3).reshape(cin, taps * cout)
    y = jax.lax.dot_general(
        x.reshape(n * h * w, cin), k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(n, h, w, taps * cout).astype(x.dtype)
    yp = _pad2d2(y, kh // 2, kw // 2, pad_mode)
    out = jnp.zeros((n, h, w, cout), jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            t = dy * kw + dx
            out = out + yp[
                :, dy : dy + h, dx : dx + w, t * cout : (t + 1) * cout
            ]
    out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def conv7_tail_taps(x, kernel, bias, pad_mode: str = "reflect"):
    """7×7 'same' conv for small C_out (back-compat wrapper)."""
    return conv_tail_taps(x, kernel, bias, pad_mode)
