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


class MeshPlan:
    """A trainer-facing parallelism plan built from ``config.mesh``.

    ``kind`` names the (single) model axis in play — 'dp' (none), 'fsdp',
    'tp' or 'sp'; ``batch_scale`` is how many ways the batch shards (the
    data×fsdp extent product — tp/sp replicate the batch across their
    axis); ``mesh`` carries the named axes the sharding helpers expect.
    The reference has no analogue (single pinned GPU, train.py:14); this
    is the config/CLI surface over parallel/{mesh,fsdp,tensor,spatial}.py.
    """

    def __init__(self, mesh: Mesh, kind: str, batch_scale: int):
        self.mesh = mesh
        self.kind = kind
        self.batch_scale = batch_scale

    @property
    def model_sharded(self) -> bool:
        """True when params/activations shard (Pallas fused kernels are
        single-device programs and must be gated off the train path)."""
        return self.kind != "dp"

    def batch_sharding(self) -> NamedSharding:
        if self.kind == "fsdp":
            from ctagan_tpu.parallel.fsdp import batch_sharding_fsdp

            return batch_sharding_fsdp(self.mesh)
        if self.kind == "sp":
            from ctagan_tpu.parallel.spatial import sp_batch_sharding

            return sp_batch_sharding(self.mesh)
        if self.kind == "depth":
            from ctagan_tpu.parallel.volume import depth_batch_sharding

            return depth_batch_sharding(self.mesh)
        # dp / tp: leading dim over the data axis when present, replicated
        # otherwise (pure-tp mesh)
        if DATA_AXIS in self.mesh.axis_names:
            return NamedSharding(self.mesh, P(DATA_AXIS))
        return NamedSharding(self.mesh, P())

    def shard_batch(self, batch):
        """Place a host batch dict per the plan (multi-process aware).
        Array leaves only — ``*_path`` string leaves are dropped, matching
        ``shard_batch`` (the jitted steps take arrays only)."""
        arrs = {k: v for k, v in batch.items() if not k.endswith("_path")}
        if self.kind == "sp":
            from ctagan_tpu.parallel.spatial import shard_batch_sp

            return shard_batch_sp(arrs, self.mesh)
        if self.kind == "depth":
            from ctagan_tpu.parallel.volume import shard_batch_depth

            return shard_batch_depth(arrs, self.mesh)
        sh = self.batch_sharding()
        if jax.process_count() > 1:
            return {
                k: jax.make_array_from_process_local_data(sh, np.asarray(v))
                for k, v in arrs.items()
            }
        return {
            k: jax.device_put(np.asarray(v), sh) for k, v in arrs.items()
        }

    def shard_state(self, state, generator=None):
        """Place a train-state dataclass per the plan: fsdp = ZeRO-3 layout,
        tp = Megatron generator layout, pp = stage-packed generator layout
        (needs the ``generator`` module to map param subtrees to stages),
        sp/dp = replicated."""
        if self.kind == "fsdp":
            from ctagan_tpu.parallel.fsdp import shard_state_fsdp

            return shard_state_fsdp(state, self.mesh)
        if self.kind == "tp":
            from ctagan_tpu.parallel.tensor import shard_state_tp

            return shard_state_tp(state, self.mesh)
        if self.kind == "pp":
            from ctagan_tpu.parallel.pipeline import shard_p2p_state_pp

            if generator is None:
                raise ValueError(
                    "mesh kind 'pp' needs the generator module to pack the "
                    "stage params (pass generator=)"
                )
            return shard_p2p_state_pp(state, generator, self.mesh)
        import dataclasses

        rep = NamedSharding(self.mesh, P())
        put = lambda t: jax.tree.map(lambda x: jax.device_put(x, rep), t)
        out = {
            f.name: put(getattr(state, f.name))
            for f in dataclasses.fields(state)
            if getattr(state, f.name) is not None
        }
        return dataclasses.replace(state, **out)


_MODEL_AXES = ("fsdp", "tp", "sp", "depth", "pp")


def plan_from_spec(spec, devices: Optional[Sequence] = None) -> MeshPlan:
    """Build a MeshPlan from a ``config.mesh`` dict — keys dp/fsdp/tp/sp/
    depth/pp, each an axis extent (default 1). At most one model axis
    (fsdp/tp/sp/depth/pp) may exceed 1; dp composes with any single one
    (``{dp: 2, pp: 4}`` = 2 data-parallel pipeline groups of 4 stages).
    ``{}`` or ``{dp: N}`` is a plain data-parallel mesh. ``depth`` shards
    the 3-D family's volume D axis (parallel/volume.py); ``pp`` stages the
    generator's residual body GPipe- or 1F1B-style
    (parallel/pipeline.py)."""
    spec = dict(spec or {})
    unknown = set(spec) - {"dp", *_MODEL_AXES}
    if unknown:
        raise ValueError(f"unknown mesh axes {sorted(unknown)} "
                         "(have dp, fsdp, tp, sp, depth, pp)")
    sizes = {k: int(spec.get(k, 1)) for k in ("dp", *_MODEL_AXES)}
    if any(v < 1 for v in sizes.values()):
        raise ValueError(f"mesh axis extents must be >= 1, got {spec}")
    model_axes = [k for k in _MODEL_AXES if sizes[k] > 1]
    if len(model_axes) > 1:
        raise ValueError(
            f"at most one of fsdp/tp/sp/depth/pp may exceed 1, got {spec} "
            "(dp composes with any single one)"
        )
    if devices is None:
        devices = jax.devices()
    total = 1
    for v in sizes.values():
        total *= v
    if total > len(devices):
        raise ValueError(
            f"mesh {spec} needs {total} devices, have {len(devices)}"
        )
    dp = sizes["dp"]
    if not model_axes:
        return MeshPlan(make_mesh(devices, n=dp), "dp", dp)
    kind = model_axes[0]
    n = sizes[kind]
    if dp == 1:
        # 1-D model mesh; for fsdp the batch still shards over the axis
        if kind == "fsdp":
            from ctagan_tpu.parallel.fsdp import make_fsdp_mesh

            return MeshPlan(make_fsdp_mesh(devices, n=n), "fsdp", n)
        if kind == "tp":
            from ctagan_tpu.parallel.tensor import make_tp_mesh

            return MeshPlan(make_tp_mesh(devices, n=n), "tp", 1)
        if kind == "depth":
            from ctagan_tpu.parallel.volume import make_depth_mesh

            return MeshPlan(make_depth_mesh(devices, n=n), "depth", 1)
        if kind == "pp":
            from ctagan_tpu.parallel.pipeline import make_pp_mesh

            return MeshPlan(make_pp_mesh(n, devices), "pp", 1)
        from ctagan_tpu.parallel.spatial import make_sp_mesh

        return MeshPlan(make_sp_mesh(devices, n=n), "sp", 1)
    if kind == "fsdp":
        from ctagan_tpu.parallel.fsdp import make_dp_fsdp_mesh

        return MeshPlan(make_dp_fsdp_mesh(dp, n, devices), "fsdp", dp * n)
    if kind == "tp":
        from ctagan_tpu.parallel.tensor import make_dp_tp_mesh

        return MeshPlan(make_dp_tp_mesh(dp, n, devices), "tp", dp)
    if kind == "depth":
        from ctagan_tpu.parallel.volume import make_dp_depth_mesh

        return MeshPlan(make_dp_depth_mesh(dp, n, devices), "depth", dp)
    if kind == "pp":
        from ctagan_tpu.parallel.pipeline import make_dp_pp_mesh

        return MeshPlan(make_dp_pp_mesh(dp, n, devices), "pp", dp)
    from ctagan_tpu.parallel.spatial import make_dp_sp_mesh

    return MeshPlan(make_dp_sp_mesh(dp, n, devices), "sp", dp)


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
