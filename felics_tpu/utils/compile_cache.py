"""Persistent XLA compilation cache.

The fused Mosaic kernels take ~30-90 s to compile on a TPU backend; a CLI
invocation (one process per image) would pay that on every run without a
persistent cache. ``enable()`` points JAX's compilation cache at a durable
directory so the second process reuses the first one's binaries. Called by
the CLI entry points and the benchmark driver; library users embedding
felics_tpu in a long-lived process don't need it (in-process caching
suffices) but may call it too — it is idempotent and never raises.
"""

from __future__ import annotations

import os

_enabled = False


def enable(directory: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    try:
        import jax

        d = directory or os.environ.get(
            "FELICS_TPU_JAX_CACHE",
            os.path.join(
                os.path.expanduser("~"), ".cache", "felics_tpu", "jax"
            ),
        )
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:
        pass  # cacheless operation is always correct, just slower
