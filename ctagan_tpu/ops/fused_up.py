"""Fused (bilinear-2× upsample → concat → 3×3 conv) for the ResUNet up path.

The reference up stage (trainer/reg.py:92-97) is
``conv3x3(concat(bilinear_up(x), skip))``. Executed literally that chain is
bandwidth-bound on TPU: the 2× upsampled buffer and the concatenated buffer
both materialize in HBM at full resolution before the conv reads them
(~49 ms of the measured HD train step lives in the ResUNet, largely here).

This module removes both intermediates with a **phase decomposition**: for an
exact 2× half-pixel bilinear upsample, every output pixel of
``conv3x3(up2x(x))`` with output parity (py, px) ∈ {0,1}² is a 3×3 conv of
the LOW-res ``x`` with a kernel composed from the learned kernel and the
bilinear tap weights. So the whole stage becomes

    depth_to_space( conv3x3(x, K_phases) )  +  conv3x3(skip, K_skip)

— one conv at low res with 4× output channels (flop-neutral with the
original) plus the skip half of the split kernel at high res. No upsampled
or concatenated tensor ever exists; both convs run straight on the MXU.

1-D bilinear 2× (align_corners=False):  u[2j] = 0.75·x[j] + 0.25·x[j-1],
u[2j+1] = 0.75·x[j] + 0.25·x[j+1] (edges clamped).

Border semantics: interior output (everything ≥2 px from the frame) is exact
to float tolerance. On the 1-px frame the reference zero-pads the conv on the
*high-res* grid while this fusion edge-replicates on the low-res grid — an
opt-in perf mode (config ``reg_fuse_up``), default off to keep reference
semantics bit-for-bit.

MEASURED RESULT (v5e, 512² b=1 bf16, via XLA): fwd 10.2→9.8 ms (-4%) but
grad 38.7→43.9 ms (+13%; the dilated conv's kernel-gradient outweighs the
saved intermediates), HD step 130.4→135.5 ms. A phase-decomposition variant
(depth-to-space interleave) was worse still (grad 48.2 ms) — the interleave
transpose costs more than the resize+concat it removes. Conclusion: XLA
already overlaps the up-path intermediates well; the stage is NOT the
bandwidth bottleneck the step-breakdown suggested. Kept default-off as a
documented experiment (same negative-result precedent as the Pallas
InstanceNorm, models/layers.py).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")

# _B[m+1, d+1] = coefficient of x[j+d] in up2x(x)[2j+m]  (m ∈ {-1..2}, d ∈ {-1..1})
_B = np.array(
    [
        [0.75, 0.25, 0.0],  # m=-1: u[2j-1] = 0.75 x[j-1] + 0.25 x[j]
        [0.25, 0.75, 0.0],  # m= 0: u[2j]   = 0.25 x[j-1] + 0.75 x[j]
        [0.0, 0.75, 0.25],  # m= 1: u[2j+1] = 0.75 x[j]   + 0.25 x[j+1]
        [0.0, 0.25, 0.75],  # m= 2: u[2j+2] = 0.25 x[j]   + 0.75 x[j+1]
    ],
    np.float32,
)


def compose_phase_kernels(kernel):
    """Compose the learned high-res kernel with the bilinear tap weights.

    kernel: (3, 3, Cin, Cout) acting on the upsampled grid. Returns
    (3, 3, Cin, 4·Cout) acting on the low-res grid, phases ordered
    (py, px) row-major in the output-channel blocks.
    """
    B = jnp.asarray(_B, kernel.dtype)
    # W[py,px,dy,dx] = Σ_{ty,tx} kernel[ty,tx] · B[py+ty, dy] · B[px+tx, dx]
    # (ty, tx ∈ {0,1,2} encode taps {-1,0,1}; index py+ty spans 0..3)
    cin, cout = kernel.shape[2], kernel.shape[3]
    phases = []
    for py in range(2):
        for px in range(2):
            acc = jnp.zeros((3, 3, cin, cout), kernel.dtype)
            for ty in range(3):
                by = B[py + ty]  # (3,) over dy
                for tx in range(3):
                    bx = B[px + tx]  # (3,) over dx
                    acc = acc + kernel[ty, tx] * (
                        by[:, None, None, None] * bx[None, :, None, None]
                    )
            phases.append(acc)
    return jnp.concatenate(phases, axis=-1)  # (3,3,Cin,4*Cout)


def compose_dilated_kernel(kernel):
    """Compose the learned 3×3 kernel with the separable bilinear-2× tap
    kernel [0.25, 0.75, 0.75, 0.25] into one 6×6 kernel for an input-dilated
    conv: conv3x3(up2x(x)) == conv6x6(dilate2(edge_pad(x,1)), pad=(1,1)).

    kernel: (3, 3, Cin, Cout) -> (6, 6, Cin, Cout).
    """
    k4 = jnp.asarray([0.25, 0.75, 0.75, 0.25], kernel.dtype)
    # full 2-D convolution of the 3x3 learned kernel with outer(k4, k4):
    # C[ry, rx] = Σ_{sy,sx} kernel[sy, sx] · k4[ry-sy] · k4[rx-sx]
    cin, cout = kernel.shape[2], kernel.shape[3]
    out = jnp.zeros((6, 6, cin, cout), kernel.dtype)
    for sy in range(3):
        for sx in range(3):
            patch = kernel[sy, sx] * (k4[:, None, None, None] * k4[None, :, None, None])
            out = out.at[sy : sy + 4, sx : sx + 4].add(patch)
    return out


def fused_up_concat_conv(x_low, skip, kernel, bias, dtype=None):
    """``conv3x3(concat(up2x(x_low), skip)) + bias`` without materializing
    either intermediate.

    x_low: (N, h, w, Cu); skip: (N, 2h, 2w, Cs);
    kernel: (3, 3, Cu+Cs, Cout) — the learned kernel of the unfused stage
    (up channels first, matching the concat order); bias: (Cout,).
    ``dtype``: compute dtype for the convs (phase composition stays in the
    kernel's own dtype, normally f32, for accuracy).
    """
    n, h, w, cu = x_low.shape
    cout = kernel.shape[-1]
    k_up, k_skip = kernel[:, :, :cu, :], kernel[:, :, cu:, :]
    k6 = compose_dilated_kernel(k_up)
    if dtype is not None:
        x_low = x_low.astype(dtype)
        skip = skip.astype(dtype)
        k6 = k6.astype(dtype)
        k_skip = k_skip.astype(dtype)
        bias = bias.astype(dtype)
    xp = jnp.pad(x_low, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    # input-dilated conv == the upsample+conv in one MXU pass, no transposes
    y = lax.conv_general_dilated(
        xp, k6, (1, 1), [(1, 1), (1, 1)], lhs_dilation=(2, 2),
        dimension_numbers=_DN,
    )
    y = y + lax.conv_general_dilated(
        skip, k_skip, (1, 1), [(1, 1), (1, 1)], dimension_numbers=_DN
    )
    return y + bias
