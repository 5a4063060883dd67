"""Persistent XLA compilation cache wiring (config ``compilation_cache``).

The tunneled TPU pays its big jit compiles once per PROCESS — the first
eval call was measured at 160-340 s (CLAUDE.md r2), and every
``--supervise`` restart or stage-2 relaunch pays it again. JAX's
persistent compilation cache removes that: r5 probe on the axon backend,
same program across fresh processes, >110 s cold -> **0.63 s** warm
(docs/evidence: /tmp cache probe, REPORT_r5.md).

Enabled for accelerator backends only: the CPU backend's big SPMD
executables don't serialize (measured r4 — the dryrun's persistent-cache
A/B halved leg 1 only), and the test suite's virtual-device mesh would
just churn cache files.
"""
from __future__ import annotations

import os
from typing import Optional

_DEFAULT_DIR = "~/.cache/ctagan_tpu/jaxcache"


def maybe_enable_compilation_cache(
    spec: Optional[str], backend: Optional[str] = None
) -> Optional[str]:
    """Point jax at a persistent compile cache per the config ``spec``.

    ``spec``: 'auto' (default dir), a directory path, or ''/'off'/None to
    disable. Returns the directory enabled, or None. No-op on the 'cpu'
    backend (``backend`` defaults to the live ``jax.default_backend()`` —
    NOTE this initializes the backend, which trainer __init__ does anyway
    moments later).
    """
    if not spec or spec in ("off", "none", "false"):
        return None
    import jax

    if backend is None:
        backend = jax.default_backend()
    if backend == "cpu":
        return None
    path = _DEFAULT_DIR if spec == "auto" else spec
    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    return path
