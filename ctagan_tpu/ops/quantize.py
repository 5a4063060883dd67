"""Int8 serving path for the ResNet generator.

Post-training quantization for inference: per-output-channel symmetric int8
weights + per-tensor dynamic int8 activations, convolutions accumulating in
int32. The first (7×7 head) and last (7×7 tanh) convs stay in float32: they
carry the HU dynamic range and are <2% of the FLOPs.

Measured on v5e (512², pipelined): int8 is 0.58-0.64× the bf16 throughput
through XLA's s8 lowering; the r2 Pallas fused-s8 body (ops/fused_s8.py,
engaged automatically when shapes allow) lifts that to 0.75× (207.7 vs
278.3 sl/s at b=32, docs/evidence/bench_s8_eval_r2.log) — better, but s8
matmul + in-kernel (de)quant still doesn't beat the bf16 chain at these
shapes. Use this mode for its 3.7× weight-memory reduction (many models
resident per chip / HBM-constrained serving), not for speed.

The reference has no quantized/serving story at all (inference = rerunning
train.py's test(), HdTrainer.py:428-564); this is a new TPU-native serving
capability. Architecture parity with the generator it quantizes:
Model/CycleGan.py:23-71.

Quality note: every int8 conv here is followed by InstanceNorm, which is
invariant to the per-channel affine (scale·x + bias) — so per-channel weight
scales introduce no cascading error; the only quantization noise is the
per-tensor activation rounding. Measured on random-init generators the int8
output tracks the f32 output at ~38 dB PSNR over the [-1,1] range
(tests/test_quantize.py); gate any production rollout on the window-space
metric suite (train/evaluation.py) for the actual trained checkpoint.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from ctagan_tpu.models.layers import instance_norm, reflect_pad

_DN = ("NHWC", "HWIO", "NHWC")

# route the residual body through the fused s8 Pallas chain (A/B switch;
# the XLA s8 loop stays as the fallback and the parity oracle)
FUSED_S8_BODY = True


# ---------------------------------------------------------------------------
# Quantizers
# ---------------------------------------------------------------------------

def quantize_weight_per_channel(w, out_axis: int = 3):
    """Symmetric per-output-channel int8 quantization of a conv kernel.

    Returns (q_int8, scale_f32[out]) with w ≈ q * scale.
    """
    w = jnp.asarray(w, jnp.float32)
    reduce_axes = tuple(a for a in range(w.ndim) if a != out_axis)
    amax = jnp.max(jnp.abs(w), axis=reduce_axes)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    shape = [1] * w.ndim
    shape[out_axis] = -1
    q = jnp.clip(jnp.round(w / scale.reshape(shape)), -127, 127).astype(jnp.int8)
    return q, scale


def _quantize_act(x):
    """Per-tensor dynamic symmetric int8 activation quantization."""
    amax = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8)
    inv = 127.0 / amax
    q = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
    return q, inv


# ---------------------------------------------------------------------------
# Parameter-tree transformation
# ---------------------------------------------------------------------------

def _qconv(kernel, bias, exact=False):
    if exact:  # keep f32 weights, scale 1 — plumbing-check mode for tests
        w = jnp.asarray(kernel, jnp.float32)
        return {"q": w, "scale": jnp.ones((w.shape[3],), jnp.float32),
                "bias": jnp.asarray(bias, jnp.float32)}
    q, scale = quantize_weight_per_channel(kernel, out_axis=3)
    return {"q": q, "scale": scale, "bias": jnp.asarray(bias, jnp.float32)}


def _transpose_to_regular(kernel):
    """Convert flax ConvTranspose(transpose_kernel=True) weights — layout
    (kh, kw, O, I), applied spatially flipped — into the equivalent regular
    HWIO kernel for an input-dilated conv."""
    return jnp.flip(jnp.asarray(kernel, jnp.float32), (0, 1)).transpose(0, 1, 3, 2)


def quantize_generator(params, exact: bool = False) -> Dict[str, Any]:
    """Build the int8 inference pytree from a trained Generator param tree
    (models/generator.py). Head/tail convs stay f32. ``exact=True`` skips
    the rounding (f32 weights in the same structure) — used by tests to
    check the forward graph against Generator.apply bit-for-bit."""
    p = params["params"] if "params" in params else params
    n_res = sum(1 for k in p if k.startswith("ResidualBlock_"))

    def conv_p(name, sub="Conv_0"):
        c = p[name][sub]
        return c["kernel"], c["bias"]

    head_k, head_b = conv_p("ConvTorch_0")
    tail_k, tail_b = conv_p("ConvTorch_3")
    res = []
    for i in range(n_res):
        blk = []
        for j in (0, 1):
            c = p[f"ResidualBlock_{i}"][f"ConvTorch_{j}"]["Conv_0"]
            blk.append(_qconv(c["kernel"], c["bias"], exact=exact))
        res.append(blk)
    qp = {
        "head": {"kernel": jnp.asarray(head_k, jnp.float32),
                 "bias": jnp.asarray(head_b, jnp.float32)},
        "down": [
            _qconv(*conv_p(f"ConvTorch_{i}"), exact=exact) for i in (1, 2)
        ],
        "res": res,
        "up": [
            _qconv(
                _transpose_to_regular(
                    p[f"ConvTransposeTorch_{i}"]["ConvTranspose_0"]["kernel"]),
                p[f"ConvTransposeTorch_{i}"]["ConvTranspose_0"]["bias"],
                exact=exact,
            )
            for i in (0, 1)
        ],
        "tail": {"kernel": jnp.asarray(tail_k, jnp.float32),
                 "bias": jnp.asarray(tail_b, jnp.float32)},
    }
    return qp


def quantized_size_bytes(qp) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(qp))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _conv_f32(x, kernel, bias, stride=1):
    y = lax.conv_general_dilated(
        x, kernel, (stride, stride), [(0, 0), (0, 0)], dimension_numbers=_DN)
    return y + bias


def _conv_i8(x, c, stride=1, padding=(0, 0), lhs_dilation=None):
    """Dynamic-int8 conv: quantize x per-tensor, s8×s8→s32 on the MXU,
    dequantize with the combined activation/weight scales, add bias."""
    xq, x_inv = _quantize_act(x)
    y = lax.conv_general_dilated(
        xq, c["q"], (stride, stride), [padding, padding],
        lhs_dilation=lhs_dilation, dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (c["scale"] / x_inv) + c["bias"]


def generator_int8_forward(qp, x):
    """Int8 counterpart of models.generator.Generator.__call__ (NHWC in
    [-1,1] → tanh output). Numerically: head/tail f32, body int8."""
    x = jnp.asarray(x, jnp.float32)
    # head: c7s1-64, f32
    h = _conv_f32(reflect_pad(x, 3), qp["head"]["kernel"], qp["head"]["bias"])
    h = jax.nn.relu(instance_norm(h))
    # downsampling
    for c in qp["down"]:
        h = _conv_i8(h, c, stride=2, padding=(1, 1))
        h = jax.nn.relu(instance_norm(h))
    # residual body: fused s8 Pallas chain when shapes allow (2x MXU peak;
    # see ops/fused_s8.py), else the XLA s8 loop
    from ctagan_tpu.ops.fused_s8 import fused_residual_chain_s8, s8_chain_ok

    if (
        FUSED_S8_BODY
        and qp["res"]
        and s8_chain_ok(h.shape)
        and qp["res"][0][0]["q"].dtype == jnp.int8  # not exact-mode f32
    ):
        qb = [
            (c1["q"], c1["scale"], jnp.ravel(c1["bias"]),
             c2["q"], c2["scale"], jnp.ravel(c2["bias"]))
            for c1, c2 in qp["res"]
        ]
        h = fused_residual_chain_s8(h, qb)
    else:
        for c1, c2 in qp["res"]:
            r = _conv_i8(reflect_pad(h, 1), c1)
            r = jax.nn.relu(instance_norm(r))
            r = _conv_i8(reflect_pad(r, 1), c2)
            h = h + instance_norm(r)
    # upsampling: ConvTranspose(k3,s2,p1,op1) == input-dilated conv with
    # asymmetric padding (1, 2) and the flipped/transposed kernel
    for c in qp["up"]:
        h = _conv_i8(h, c, stride=1, padding=(1, 2), lhs_dilation=(2, 2))
        h = jax.nn.relu(instance_norm(h))
    # tail, f32
    h = _conv_f32(reflect_pad(h, 3), qp["tail"]["kernel"], qp["tail"]["bias"])
    return jnp.tanh(h)


def generator_dequant_forward(qp, x):
    """Same graph with dequantized f32 weights — the plumbing check used by
    tests (must match Generator.apply to float tolerance)."""

    def deq(c):
        return {"q": (c["q"].astype(jnp.float32) * c["scale"]).astype(jnp.float32),
                "scale": jnp.ones_like(c["scale"]), "bias": c["bias"]}

    x = jnp.asarray(x, jnp.float32)
    h = _conv_f32(reflect_pad(x, 3), qp["head"]["kernel"], qp["head"]["bias"])
    h = jax.nn.relu(instance_norm(h))
    for c in qp["down"]:
        c = deq(c)
        h = lax.conv_general_dilated(
            h, c["q"], (2, 2), [(1, 1), (1, 1)], dimension_numbers=_DN
        ) + c["bias"]
        h = jax.nn.relu(instance_norm(h))
    for c1, c2 in qp["res"]:
        c1, c2 = deq(c1), deq(c2)
        r = lax.conv_general_dilated(
            reflect_pad(h, 1), c1["q"], (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=_DN) + c1["bias"]
        r = jax.nn.relu(instance_norm(r))
        r = lax.conv_general_dilated(
            reflect_pad(r, 1), c2["q"], (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=_DN) + c2["bias"]
        h = h + instance_norm(r)
    for c in qp["up"]:
        c = deq(c)
        h = lax.conv_general_dilated(
            h, c["q"], (1, 1), [(1, 2), (1, 2)], lhs_dilation=(2, 2),
            dimension_numbers=_DN) + c["bias"]
        h = jax.nn.relu(instance_norm(h))
    h = _conv_f32(reflect_pad(h, 3), qp["tail"]["kernel"], qp["tail"]["bias"])
    return jnp.tanh(h)
