"""Halo-exchanged spatially-sharded inference: one huge slice across the mesh.

The DP mesh scales throughput, but a single very large field of view (e.g. a
stitched whole-body slab or >2k² reconstruction) can exceed one chip's
activation memory at 256 channels. This module shards the **H axis** of one
image across the mesh and runs the generator as a single SPMD program:

- each device holds an equal strip plus ``halo`` ghost rows exchanged with
  its neighbours over ICI via ``lax.ppermute`` (one exchange, up + down);
- convolutions run locally on the strip+halo; with ``halo`` ≥ the network's
  receptive-field radius every interior output row equals the unsharded
  result — seams included;
- InstanceNorm is the one *global* op in the generator: its statistics are
  combined across devices with ``lax.psum`` over the mesh axis, each ghost
  row counted exactly once — see models.layers.instance_norm
  (spatial_axis=...). This is what makes the sharded forward *match* the
  reference computation rather than approximate it;
- at the true image top/bottom there is no neighbour, so the outer ghost
  rows are a **symmetric border extension** of the image. The sharded
  program is therefore defined to equal, to float tolerance, the unsharded
  generator applied to ``np.pad(image, halo, mode='symmetric')`` cropped
  back — exact everywhere including seams (locked by test); versus the
  plain unsharded forward only rows within the receptive field of the true
  border differ (inherent to any tiling of a border-padding network).

The reference has no analogue (strictly 512² single-GPU); this is the
SURVEY §5 "halo-exchanged volume inference" subsystem, the scale axis this
domain has instead of sequence length.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
try:  # jax >= 0.4.35 promotes shard_map out of experimental
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ctagan_tpu.parallel.mesh import DATA_AXIS, make_mesh


def infer_spatial_sharded(
    generator,
    params,
    image,
    mesh: Optional[Mesh] = None,
    halo: int = 96,
):
    """Run ``generator`` over ``image`` (H, W) with H sharded over the mesh.

    ``generator``: an unsharded models.Generator (it is cloned with
    ``spatial_axis``/``halo`` set). ``halo`` must be a multiple of 4 (the
    generator's total stride) and at most H / n_devices. Returns the (H, W)
    synthesized slice as a numpy array.
    """
    mesh = mesh or make_mesh()
    n = len(mesh.devices.ravel())
    h, w = image.shape
    if halo % 4 != 0:
        raise ValueError("halo must be divisible by 4 (generator stride)")
    if h % (4 * n) != 0:
        raise ValueError(f"H={h} must divide into {n} stride-aligned strips")
    strip = h // n
    if halo > strip:
        raise ValueError(f"halo {halo} exceeds strip height {strip}")
    g = generator.clone(spatial_axis=DATA_AXIS, halo=halo)

    def fn(p, x_local):
        # x_local: (strip, W) this device's rows
        x = x_local[None, :, :, None]
        idx = jax.lax.axis_index(DATA_AXIS)
        # neighbour halos over ICI (one hop each way); devices at the mesh
        # ends receive zeros and substitute a reflect fill of their own rows
        from_above = jax.lax.ppermute(
            x[:, -halo:], DATA_AXIS, [(i, i + 1) for i in range(n - 1)]
        )
        from_below = jax.lax.ppermute(
            x[:, :halo], DATA_AXIS, [(i, i - 1) for i in range(1, n)]
        )
        # symmetric extension at the true image borders — matches
        # np.pad(..., 'symmetric'), the reference semantics (see module doc)
        top_fill = x[:, :halo][:, ::-1]
        bot_fill = x[:, -halo:][:, ::-1]
        top = jnp.where(idx == 0, top_fill, from_above)
        bot = jnp.where(idx == n - 1, bot_fill, from_below)
        xg = jnp.concatenate([top, x, bot], axis=1)
        out = g.apply(p, xg)
        return out[0, halo : halo + strip, :, 0]

    sharded = jax.jit(
        shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS, None)),
            out_specs=P(DATA_AXIS, None),
        )
    )
    img = jnp.asarray(np.ascontiguousarray(image, np.float32))
    return np.asarray(sharded(params, img))
