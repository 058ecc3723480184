"""On-hardware Mosaic parity (VERDICT r3 item 9).

The rest of the suite runs the Pallas kernels in interpret mode on CPU
(conftest pins jax to the host platform); actual Mosaic lowering was
previously exercised only by bench.py's asserts. This test spawns a clean
subprocess WITHOUT the CPU pin: when a real TPU is attached it runs one
non-interpret encode+decode byte-parity case against the XLA engine and the
scalar oracle; when no TPU is present it skips.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import sys
import numpy as np
import jax

if jax.devices()[0].platform not in ("tpu", "axon"):
    print("NO_TPU")
    sys.exit(42)

import os
cache = os.path.join(os.getcwd(), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from felics_tpu.config import TileConfig
from felics_tpu.ops import pallas_codec as pc
from felics_tpu.parallel import tiling

assert pc.on_tpu(), "pallas_codec does not see the TPU"

rng = np.random.default_rng(11)
img = np.clip(
    np.cumsum(np.cumsum(rng.integers(-6, 7, (128, 128)), 0), 1) + 128, 0, 255
).astype(np.uint8)
tc = TileConfig(tile_h=32, tile_w=32)
# engine="pallas" raises on any Mosaic failure instead of falling back.
blob_pallas = tiling.compress_tiled_bytes(img, tc, engine="pallas")
blob_xla = tiling.compress_tiled_bytes(img, tc, engine="xla")
assert blob_pallas == blob_xla, "Mosaic encode bytes diverge from XLA"
out = tiling.decompress_tiled_bytes(blob_pallas, engine="pallas")
assert np.array_equal(out, img), "Mosaic decode mismatch"

# 16-bit too (taller k-table, different kernel plan).
img16 = np.clip(
    np.cumsum(np.cumsum(rng.integers(-700, 701, (64, 64)), 0), 1) + 32768,
    0, 65535,
).astype(np.uint16)
b16p = tiling.compress_tiled_bytes(img16, tc, engine="pallas")
b16x = tiling.compress_tiled_bytes(img16, tc, engine="xla")
assert b16p == b16x, "Mosaic 16-bit encode bytes diverge from XLA"
assert np.array_equal(
    tiling.decompress_tiled_bytes(b16p, engine="pallas"), img16
)
print("TPU_PARITY_OK")
"""


def test_mosaic_parity_on_tpu():
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    r = subprocess.run(
        [sys.executable, "-c", _WORKER],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
        env=env,
    )
    if r.returncode == 42 and "NO_TPU" in r.stdout:
        pytest.skip("no TPU attached")
    assert r.returncode == 0, f"worker failed:\n{r.stdout}\n{r.stderr}"
    assert "TPU_PARITY_OK" in r.stdout
