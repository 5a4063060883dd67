"""Test harness config: force a virtual 8-device CPU platform.

Multi-chip sharding paths are exercised on a host-CPU mesh (the real TPU has
a single chip in this environment). The container's site hook imports jax and
registers the TPU plugin before conftest runs, so plain env vars are too
late — but backends are created lazily, so overriding ``jax_platforms`` and
XLA_FLAGS here (before the first computation) still takes effect.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the trainer e2e tests are compile-dominated
# (~17 min cold); repeat runs drop to a few minutes
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass
