"""FSDP (ZeRO-3-style) parameter + optimizer-state sharding.

The other parallel axes scale batch (mesh.py), field-of-view (halo.py),
model width (tensor.py) and model depth (pipeline.py); this module scales
**state memory**: every parameter leaf and its Adam moments live sharded
across the mesh, so per-chip state memory falls ~1/n while the training
math stays bit-for-bit the data-parallel step. For the reference-sized
generator this is comfort, not necessity — but a production variant
(512/1024-wide body, 3-D volumetric family, EMA shadow + two Adam moments
= 5x params in HBM) is exactly where fully-sharded state pays.

TPU-native recipe (the GSPMD version of ZeRO-3): shard each leaf along one
dimension over the ``fsdp`` mesh axis and shard the batch over the SAME
axis. XLA's SPMD partitioner then inserts the collectives FSDP is made of
— all-gather each layer's params right before use (forward and again in
backward), reduce-scatter the grads, and keep the Adam update shard-local
— from the placement alone; there is no hand-written communication or
wrapper module here, and the train step function is the plain
single-device one from train/steps.py.

Leaf layout rule (``fsdp_param_specs``): shard the trailing-most dimension
divisible by the mesh extent — for HWIO conv kernels that is the output-
channel dim (so the backward's reduce-scatter rides the same layout), for
biases dim 0; indivisible leaves (e.g. the 1-channel tail output dim — a
few hundred bytes) stay replicated.

The reference has no analogue (single GPU, per-net ``torch.save`` state).
Sharded-vs-replicated step equality is locked by tests/test_parallel_fsdp.py.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FSDP_AXIS = "fsdp"


def make_fsdp_mesh(
    devices: Optional[Sequence] = None, n: Optional[int] = None
) -> Mesh:
    """1-D fully-sharded mesh: batch AND state shard over the same axis."""
    if devices is None:
        devices = jax.devices()
    if n is not None:
        devices = devices[:n]
    return Mesh(np.array(devices), (FSDP_AXIS,))


def make_dp_fsdp_mesh(
    dp: int, fsdp: int, devices: Optional[Sequence] = None
) -> Mesh:
    """2-D (data, fsdp) hybrid: state shards 1/fsdp and replicates across
    ``dp`` groups, batch shards over BOTH axes (dp*fsdp-way data
    parallelism). The standard large-scale layout when full ZeRO-3 over
    every chip would make the per-layer all-gathers span slow links: put
    ``fsdp`` on the innermost ICI axis, ``dp`` across slices/DCN — param
    all-gathers stay intra-slice while the gradient all-reduce (once per
    step) crosses."""
    from ctagan_tpu.parallel.mesh import DATA_AXIS

    if devices is None:
        devices = jax.devices()
    if len(devices) < dp * fsdp:
        raise ValueError(f"need {dp * fsdp} devices, have {len(devices)}")
    arr = np.array(devices[: dp * fsdp]).reshape(dp, fsdp)
    return Mesh(arr, (DATA_AXIS, FSDP_AXIS))


def _spec_for(leaf, n: int) -> P:
    """Shard the trailing-most dim divisible by ``n``; replicate otherwise."""
    if not hasattr(leaf, "ndim") or leaf.ndim == 0:
        return P()
    for axis in range(leaf.ndim - 1, -1, -1):
        if leaf.shape[axis] % n == 0 and leaf.shape[axis] >= n:
            spec = [None] * leaf.ndim
            spec[axis] = FSDP_AXIS
            return P(*spec)
    return P()


def fsdp_param_specs(params, mesh: Mesh):
    """PartitionSpec pytree for any param/optimizer tree (layout rule above).

    Works verbatim for Adam moment trees: they mirror the param tree, and
    scalar leaves (``count``) fall through to replicated.
    """
    n = mesh.shape[FSDP_AXIS]
    return jax.tree.map(lambda x: _spec_for(x, n), params)


def shard_tree_fsdp(tree, mesh: Mesh):
    """Place a param/opt pytree on ``mesh`` under the FSDP layout."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        tree,
        fsdp_param_specs(tree, mesh),
    )


def shard_state_fsdp(state, mesh: Mesh, replicate: Sequence[str] = ("rng",)):
    """Place ANY train-state dataclass (``P2pState``/``RegState``/
    ``CycState``/...) fully sharded: every param tree, every Adam moment
    tree, and the EMA shadows live 1/n-per-device; fields named in
    ``replicate`` (the rng key, replay-buffer indices, ...) and indivisible
    leaves replicate. Feed batches sharded over the same ``fsdp`` axis
    (``batch_sharding_fsdp``) and call the family's plain jitted train step
    — GSPMD turns it into per-layer all-gathers + grad reduce-scatters with
    a shard-local optimizer update."""
    import dataclasses

    repl = lambda t: jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), t
    )
    out = {}
    for f in dataclasses.fields(state):
        v = getattr(state, f.name)
        if v is None:
            continue
        out[f.name] = repl(v) if f.name in replicate else shard_tree_fsdp(v, mesh)
    return dataclasses.replace(state, **out)


def shard_p2p_state_fsdp(state, mesh: Mesh):
    """``shard_state_fsdp`` for a ``steps.P2pState`` (kept as the named
    entry the tests/dryrun exercise)."""
    return shard_state_fsdp(state, mesh)


def batch_sharding_fsdp(mesh: Mesh) -> NamedSharding:
    """Batch leading-dim sharding: over the fsdp axis on a 1-D mesh (data
    parallelism and state sharding share the axis, as in standard JAX FSDP
    meshes), over (data, fsdp) jointly on the 2-D hybrid mesh."""
    from ctagan_tpu.parallel.mesh import DATA_AXIS

    if DATA_AXIS in mesh.shape:
        return NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))
    return NamedSharding(mesh, P(FSDP_AXIS))


def fsdp_train_step_fn(g_model, d_model, tx, cfg):
    """A jitted P2p train step for FSDP-placed state: the single-device
    ``steps.p2p_train_step`` verbatim — zero communication code; the
    sharded state + sharded batch placement is the whole implementation.
    Pallas fused paths are single-device programs, so the generator is
    cloned onto its plain XLA path (same rule as tensor.py)."""
    from functools import partial

    from ctagan_tpu.train import steps

    g = g_model.clone(fused_body=False, fused_body_grad=False, tap_heads=False)
    return jax.jit(partial(steps.p2p_train_step, g, d_model, tx, cfg))


def state_bytes_per_device(state) -> int:
    """Max addressable bytes of the train state on any one device — the
    memory-saving claim FSDP exists for, asserted in tests."""
    per_dev: dict = {}
    for leaf in jax.tree.leaves(state):
        if not hasattr(leaf, "addressable_shards"):
            continue
        for sh in leaf.addressable_shards:
            per_dev[sh.device] = per_dev.get(sh.device, 0) + sh.data.nbytes
    return max(per_dev.values()) if per_dev else 0
