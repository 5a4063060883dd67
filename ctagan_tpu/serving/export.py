"""Serialized model artifacts: deploy the generator without model code.

Production-serving counterpart of the reference's ``torch.save`` +
source-checkout deployment (its test() re-imports Model/*.py to rebuild
the net before loading weights — HdTrainer.py:428-429): here the traced,
lowered generator (StableHLO via ``jax.export``) and its parameters ship
as ONE file. The loader needs only jax — no flax, no ctagan_tpu model
definitions, no config — and the artifact pins the input shape/dtype and
records target platforms, so a serving fleet can't silently drift from
the trained graph.

Format: a msgpack-framed pair (serialized Exported blob, param pytree)
with a small JSON header. The batch dimension is exported symbolically so
one artifact serves any batch size.
"""
from __future__ import annotations

import json
import struct
from typing import Optional

HEADER_MAGIC = b"CTAX1\n"


def export_generator(
    model,
    params,
    path: str,
    size: int = 512,
    channels: int = 1,
    batch: Optional[int] = None,
    platforms: Optional[tuple] = None,
):
    """Trace + lower ``model.apply(params, x)`` and write the artifact.

    ``batch=None`` exports a symbolic batch dimension (artifact serves any
    batch size); an int pins it. ``platforms`` defaults to the current
    backend — pass e.g. ``("tpu", "cpu")`` to build one artifact that runs
    on both.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jex

    # Portable artifact: clone off the batch-gated Pallas/tap fast paths —
    # they are single-platform kernels and their auto-gates compare the
    # batch dim, which is symbolic here. The plain XLA graph serializes for
    # any platform; XLA re-fuses it at deserialization-compile time.
    if hasattr(model, "clone"):
        safe = {
            k: False
            for k in ("fused_body", "fused_body_grad", "tap_heads")
            if hasattr(model, k)
        }
        if safe:
            model = model.clone(**safe)

    def fwd(p, x):
        return model.apply(p, x)

    if batch is None:
        (b,) = jex.symbolic_shape("b")
        x_spec = jax.ShapeDtypeStruct((b, size, size, channels), jnp.float32)
    else:
        x_spec = jax.ShapeDtypeStruct(
            (batch, size, size, channels), jnp.float32
        )
    p_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), a.dtype), params
    )
    kw = {}
    if platforms is not None:
        kw["platforms"] = list(platforms)
    exp = jex.export(jax.jit(fwd), **kw)(p_spec, x_spec)
    blob = exp.serialize()

    from flax.serialization import to_bytes

    pbytes = to_bytes(params)
    header = json.dumps(
        {
            "size": size,
            "channels": channels,
            "batch": batch,
            "platforms": list(exp.platforms),
            "fingerprint": model.__class__.__name__,
        }
    ).encode()
    with open(path, "wb") as f:
        f.write(HEADER_MAGIC)
        for part in (header, blob, pbytes):
            f.write(struct.pack("<Q", len(part)))
            f.write(part)
    return path


def load_exported(path: str, params_template=None):
    """Load an artifact -> (callable(x) -> y, header dict).

    Needs only jax (+flax for the param decode). ``params_template``: an
    optional pytree with the original structure; when omitted the params
    are decoded as the raw nested-dict state (sufficient for calling)."""
    import jax
    from jax import export as jex
    from flax.serialization import from_bytes, msgpack_restore

    with open(path, "rb") as f:
        assert f.read(len(HEADER_MAGIC)) == HEADER_MAGIC, "not a CTAX artifact"
        parts = []
        for _ in range(3):
            (n,) = struct.unpack("<Q", f.read(8))
            parts.append(f.read(n))
    header = json.loads(parts[0].decode())
    exp = jex.deserialize(parts[1])
    if params_template is not None:
        params = from_bytes(params_template, parts[2])
    else:
        params = msgpack_restore(parts[2])

    def fn(x):
        return exp.call(params, x)

    return fn, header
