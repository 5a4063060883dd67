"""Spatial-parallel TRAINING: activations sharded along H via GSPMD.

``parallel/halo.py`` scales a single huge *inference* field-of-view with
hand-written ``ppermute`` halo exchanges. Training at very large resolution
(2k²+ slabs, or 512² at production batch) is bounded by *activation* memory
— the 256-channel residual body keeps N·H·W·256 live through the backward —
and that axis is what this module shards. It is this domain's sequence
parallelism: H rows are the "sequence", convolutions are local mixing with
a small receptive-field halo, InstanceNorm is the one global reduction.

Unlike halo.py this path writes **zero communication code**: the batch is
``device_put`` with its H dim sharded over a ``spatial`` mesh axis and the
plain single-device train step (train/steps.py) is ``jit``-ed as-is. XLA's
SPMD partitioner spatially partitions every conv (inserting the halo
exchanges), turns the InstanceNorm/loss reductions into all-reduces over
the axis, and derives the whole backward — the "annotate shardings, let
XLA insert collectives" recipe applied to the *spatial* dim instead of
batch/channels/params. Semantics are preserved by construction (GSPMD
partitioning is semantics-preserving), so the sharded step equals the
single-device step to float tolerance — locked by
tests/test_parallel_spatial.py, including the 2-D (data, spatial) hybrid.

Composes with DP: ``make_dp_sp_mesh`` puts batch on ``data`` and rows on
``spatial`` (map ``spatial`` to the innermost ICI axis — conv halos talk
every layer, the gradient all-reduce only once per step).

The reference has no analogue (single GPU, 512² fixed); this is the
training-side completion of SURVEY §5's spatial scale axis.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ctagan_tpu.parallel.mesh import DATA_AXIS

SPATIAL_AXIS = "spatial"


def make_sp_mesh(
    devices: Optional[Sequence] = None, n: Optional[int] = None
) -> Mesh:
    """1-D spatial mesh: every device holds a strip of rows of every sample."""
    if devices is None:
        devices = jax.devices()
    if n is not None:
        devices = devices[:n]
    return Mesh(np.array(devices), (SPATIAL_AXIS,))


def make_dp_sp_mesh(
    dp: int, sp: int, devices: Optional[Sequence] = None
) -> Mesh:
    """2-D (data, spatial) mesh: batch scales on ``data``, per-sample
    activation memory drops 1/sp on ``spatial``."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < dp * sp:
        raise ValueError(f"need {dp * sp} devices, have {len(devices)}")
    arr = np.array(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))


def sp_batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch placement: H on ``spatial`` (+ N on ``data`` when the mesh
    has both axes). H must divide by the ``spatial`` extent."""
    data = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    return NamedSharding(mesh, P(data, SPATIAL_AXIS, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _check_h_divisible(batch, mesh: Mesh) -> None:
    """Fail early with a clear message when H does not divide the spatial
    extent (otherwise GSPMD surfaces it as an opaque device_put error)."""
    sp = mesh.shape[SPATIAL_AXIS]
    for k, v in batch.items():
        if k.endswith("_path"):
            continue
        arr = np.asarray(v)
        if arr.ndim >= 2 and arr.shape[1] % sp != 0:
            raise ValueError(
                f"spatial parallelism needs H divisible by the spatial mesh "
                f"extent: batch[{k!r}] has H={arr.shape[1]} but "
                f"mesh['{SPATIAL_AXIS}']={sp}"
            )


def shard_batch_sp(batch, mesh: Mesh):
    """Place a host NHWC batch dict with H sharded (and N data-sharded on a
    2-D mesh); ``*_path`` string leaves pass through.

    Multi-process (DCN scale-out) mirrors ``mesh.shard_batch``: each host
    passes its *local* shard and the global array is assembled with
    ``jax.make_array_from_process_local_data``.
    """
    _check_h_divisible(batch, mesh)
    sh = sp_batch_sharding(mesh)
    if jax.process_count() > 1:
        return {
            k: v
            if k.endswith("_path")
            else jax.make_array_from_process_local_data(sh, np.asarray(v))
            for k, v in batch.items()
        }
    return {
        k: v if k.endswith("_path") else jax.device_put(np.asarray(v), sh)
        for k, v in batch.items()
    }


def sp_train_step_fn(g_model, d_model, tx, cfg):
    """A jitted P2p train step that runs with activations H-sharded.

    Returns ``step(state, batch, lr) -> (state, losses)``; call with a
    replicated state (params/opt/rng as initialized — ``device_put`` them
    with ``replicated(mesh)``) and a batch placed by ``shard_batch_sp``.
    The generator is cloned onto its plain XLA path: the Pallas fused
    kernels are single-device programs and don't partition (same rule as
    tensor.py).
    """
    from ctagan_tpu.train import steps

    g = g_model.clone(fused_body=False, fused_body_grad=False, tap_heads=False)
    return jax.jit(partial(steps.p2p_train_step, g, d_model, tx, cfg))


def shard_p2p_state_sp(state, mesh: Mesh):
    """Replicate a ``steps.P2pState`` on ``mesh`` (spatial parallelism
    shards activations, not state — compose with parallel/fsdp.py when the
    state itself must shard too)."""
    import dataclasses

    rep = replicated(mesh)

    def put(tree):
        return jax.tree.map(lambda x: jax.device_put(x, rep), tree)

    return dataclasses.replace(
        state,
        g_params=put(state.g_params),
        d_params=put(state.d_params),
        g_opt=put(state.g_opt),
        d_opt=put(state.d_opt),
        rng=jax.device_put(state.rng, rep),
        g_ema=None if state.g_ema is None else put(state.g_ema),
    )
