"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective code is
validated on host-platform virtual devices exactly as the driver's
``dryrun_multichip`` does.

Note: this environment's sitecustomize registers a remote-TPU ("axon")
platform with priority, so setting ``JAX_PLATFORMS=cpu`` in the environment
is not enough — we must update jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# The persistent compilation cache segfaults while serializing
# interpret-mode Pallas executables (host callbacks) on this jax build —
# observed writing _fused_encode_chain_images from test_stream. The CPU
# suite recompiles cheaply; only the TPU bench benefits from the cache.
try:
    jax.config.update("jax_enable_compilation_cache", False)
except Exception:
    pass

import numpy as np
import pytest

# Modules that compile interpret-mode Pallas chains. Compiling those on
# XLA:CPU late in a long-lived process (hundreds of accumulated
# executables) segfaults sporadically inside backend_compile (observed in
# test_stream and test_robustness at different call sites; docs/DESIGN.md
# 7.3). Dropping the accumulated executables at each such module's
# boundary avoids the crash at the cost of a few recompiles.
_CLEAR_CACHES_BEFORE = {
    "test_batch",
    "test_differential",  # ~50 random-geometry interpret-Pallas compiles
    "test_isolation",
    "test_mesh",
    "test_more_coverage",
    "test_pallas_codec",
    "test_robustness",
    "test_stream",
    "test_tiled",
}
_last_module = [None]


@pytest.fixture(autouse=True)
def _clear_caches_between_heavy_modules(request):
    mod = getattr(request.module, "__name__", "")
    if mod != _last_module[0]:
        _last_module[0] = mod
        if mod in _CLEAR_CACHES_BEFORE:
            jax.clear_caches()
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
