"""Device mesh + sharding helpers: the framework's data-parallel backbone.

The reference is strictly single-device (train.py:14 pins GPU 0; no
torch.distributed anywhere), so DP over ICI is a new, first-class axis here:
a 1-D ``jax.sharding.Mesh`` over all local devices, batches sharded on the
``data`` axis, parameters replicated. Train steps are plain ``jax.jit``
functions with sharding annotations — XLA's SPMD partitioner inserts the
gradient all-reduce over ICI automatically (the loss is a global-batch mean,
so gradient averaging falls out of differentiating the sharded mean; no
hand-written psum needed).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, n: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over ``devices`` (default: all local)."""
    if devices is None:
        devices = jax.devices()
    if n is not None:
        devices = devices[:n]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dimension sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host numpy batch onto the mesh, sharded on the batch axis.

    Array leaves only (path strings stay host-side). Single-process:
    ``jax.device_put`` with a NamedSharding splits across local devices and
    overlaps with compute. Multi-process (DCN scale-out): each host passes
    its *local* shard and the global array is assembled via
    ``jax.make_array_from_process_local_data``.
    """
    sharding = batch_sharding(mesh)
    arrs = {k: v for k, v in batch.items() if not k.endswith("_path")}
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(sharding, v)
            for k, v in arrs.items()
        }
    return jax.tree.map(lambda x: jax.device_put(x, sharding), arrs)


def pad_batch_to(batch, target: int):
    """Pad the leading axis up to ``target`` (repeat last element) so a
    ragged final batch still shards evenly; returns (padded, valid_count)."""
    import numpy as np

    out = {}
    n = None
    for k, v in batch.items():
        if k.endswith("_path"):
            out[k] = v
            continue
        n = v.shape[0]
        if n < target:
            reps = np.concatenate([v] + [v[-1:]] * (target - n), axis=0)
            out[k] = reps
        else:
            out[k] = v
    return out, (n if n is not None else target)
