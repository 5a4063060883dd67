"""Pipeline parallelism: the residual body staged over a ``pp`` mesh axis.

Fourth parallelism axis (after DP batch, spatial halo, channel TP): GPipe-
style microbatched pipelining. The generator's residual body is a chain of
identical blocks (reference Model/CycleGan.py:40-44), so it stages
naturally: device ``s`` of an S-stage pipeline holds blocks
``[s*k, (s+1)*k)`` (k = n_blocks / S), activations flow stage-to-stage over
ICI via ``lax.ppermute``, and M microbatches keep every stage busy after an
S-1 tick fill. The schedule runs as a ``lax.scan`` over M + S - 1 ticks
inside one ``shard_map`` — a single compiled SPMD program, no host
involvement between ticks.

Deliberate scope: only the body is staged. Head/down/up/tail are <17% of
the FLOPs, heterogeneous (they would unbalance the stages), and here run
replicated on every device — each stage redundantly computes them, which
costs compute but no communication and keeps the pipeline homogeneous.
InstanceNorm is per-(sample, channel), so microbatching is exact: stats
over a microbatch equal stats over the full batch for each sample.

The pipelined forward equals the sequential generator forward to float
tolerance (locked by tests/test_parallel_pipeline.py). The reference has
no analogue (single GPU). Useful regime: deep-body variants
(n_residual_blocks >> 9) whose weights or activation working set exceed
one chip, with microbatches amortizing the fill/drain bubble.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

try:  # jax >= 0.4.35 promotes shard_map out of experimental
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ctagan_tpu.models.layers import instance_norm, reflect_pad

PP_AXIS = "pp"


def make_pp_mesh(n_stages: int, devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if len(devices) < n_stages:
        raise ValueError(f"need {n_stages} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_stages]), (PP_AXIS,))


def _conv(x, k, b, stride: int = 1, pad: int = 0):
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(pad, pad)] * 2, dimension_numbers=dn
    )
    return y + b


def _convt2x(x, k, b):
    """ConvTranspose2d(3, s=2, p=1, output_padding=1) — matches
    ConvTransposeTorch (models/layers.py): transpose-kernel layout
    (kh, kw, O, I), asymmetric padding (lo=1, hi=2)."""
    y = jax.lax.conv_transpose(
        x, k, (2, 2), [(1, 2), (1, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
    )
    return y + b


def _resblock(h, bp, zero: bool):
    """Functional ResidualBlock (models/layers.py:248-307 semantics)."""
    k1 = bp["ConvTorch_0"]["Conv_0"]["kernel"]
    b1 = bp["ConvTorch_0"]["Conv_0"]["bias"]
    k2 = bp["ConvTorch_1"]["Conv_0"]["kernel"]
    b2 = bp["ConvTorch_1"]["Conv_0"]["bias"]
    pad = (lambda a: a) if zero else (lambda a: reflect_pad(a, 1))
    p = 1 if zero else 0
    y = jax.nn.relu(instance_norm(_conv(pad(h), k1, b1, pad=p)))
    return h + instance_norm(_conv(pad(y), k2, b2, pad=p))


def _head_down(x, pr, zero: bool):
    p3 = 3 if zero else 0
    pad7 = (lambda a: a) if zero else (lambda a: reflect_pad(a, 3))
    h = _conv(pad7(x), pr["ConvTorch_0"]["Conv_0"]["kernel"],
              pr["ConvTorch_0"]["Conv_0"]["bias"], pad=p3)
    h = jax.nn.relu(instance_norm(h))
    for i in (1, 2):
        h = _conv(h, pr[f"ConvTorch_{i}"]["Conv_0"]["kernel"],
                  pr[f"ConvTorch_{i}"]["Conv_0"]["bias"], stride=2, pad=1)
        h = jax.nn.relu(instance_norm(h))
    return h


def _up_tail(h, pr, zero: bool):
    for i in (0, 1):
        ct = pr[f"ConvTransposeTorch_{i}"]["ConvTranspose_0"]
        h = _convt2x(h, ct["kernel"], ct["bias"])
        h = jax.nn.relu(instance_norm(h))
    p3 = 3 if zero else 0
    pad7 = (lambda a: a) if zero else (lambda a: reflect_pad(a, 3))
    h = _conv(pad7(h), pr["ConvTorch_3"]["Conv_0"]["kernel"],
              pr["ConvTorch_3"]["Conv_0"]["bias"], pad=p3)
    return jnp.tanh(h)


def _stack_body_params(params, n_blocks: int, n_stages: int):
    """(S, k)-stacked per-stage block params from a Generator param tree."""
    if n_blocks % n_stages:
        raise ValueError(
            f"n_residual_blocks={n_blocks} must divide into {n_stages} stages"
        )
    blocks = [params["params"][f"ResidualBlock_{i}"] for i in range(n_blocks)]
    k = n_blocks // n_stages
    stages = [
        jax.tree.map(lambda *xs: jnp.stack(xs), *blocks[s * k : (s + 1) * k])
        for s in range(n_stages)
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stages)  # (S, k, ...)


def pipeline_generator_forward(
    generator,
    params,
    x,
    mesh: Optional[Mesh] = None,
    microbatches: int = 2,
):
    """Generator forward with the residual body pipelined over ``mesh``.

    ``x``: (B, H, W, C) with B divisible by ``microbatches``. Returns the
    full-batch output, equal to ``generator.apply(params, x)`` up to float
    reordering.
    """
    mesh = mesh or make_pp_mesh(len(jax.devices()))
    n_stages = len(mesh.devices.ravel())
    n_blocks = generator.n_residual_blocks
    zero = generator.pad_mode == "zero"
    stacked = _stack_body_params(params, n_blocks, n_stages)
    pr = params["params"]
    rest = {k: v for k, v in pr.items() if not k.startswith("ResidualBlock_")}
    xs = jnp.asarray(x)
    B = xs.shape[0]
    if B % microbatches:
        raise ValueError(f"batch {B} must divide into {microbatches} microbatches")
    M = microbatches

    def fn(stage_params, rest_p, xin):
        # stage_params leaves: (1, k, ...) local shard — squeeze the stage dim
        sp = jax.tree.map(lambda a: a[0], stage_params)
        s = jax.lax.axis_index(PP_AXIS)
        h0 = _head_down(xin, rest_p, zero)  # replicated prologue
        mb = h0.shape[0] // M
        h_mb = h0.reshape(M, mb, *h0.shape[1:])

        def blocks(a):
            k = sp["ConvTorch_0"]["Conv_0"]["kernel"].shape[0]
            for i in range(k):
                a = _resblock(a, jax.tree.map(lambda t: t[i], sp), zero)
            return a

        carry = jnp.zeros_like(h_mb[0])
        out = jnp.zeros_like(h_mb)

        def tick(state, t):
            carry, out = state
            feed = jax.lax.dynamic_index_in_dim(
                h_mb, jnp.minimum(t, M - 1), 0, keepdims=False
            )
            a = jnp.where(s == 0, feed, carry)
            y = blocks(a)
            idx = t - (n_stages - 1)
            write = jnp.where(
                (s == n_stages - 1) & (idx >= 0),
                y,
                jax.lax.dynamic_index_in_dim(
                    out, jnp.maximum(idx, 0), 0, keepdims=False
                ),
            )
            out = jax.lax.dynamic_update_index_in_dim(
                out, write, jnp.maximum(idx, 0), 0
            )
            carry = jax.lax.ppermute(
                y, PP_AXIS, [(i, i + 1) for i in range(n_stages - 1)]
            )
            return (carry, out), None

        (carry, out), _ = jax.lax.scan(
            tick, (carry, out), jnp.arange(M + n_stages - 1)
        )
        # only the last stage holds real outputs; psum broadcasts them
        out = jax.lax.psum(
            jnp.where(s == n_stages - 1, out, jnp.zeros_like(out)), PP_AXIS
        )
        body = out.reshape(h0.shape)
        return _up_tail(body, rest_p, zero)  # replicated epilogue

    fwd = jax.jit(
        shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(PP_AXIS), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
    )
    return fwd(stacked, rest, xs)
