"""Quick end-to-end timing of the batched FLCT container path on the real
chip (same operating point as bench.py's container_bench)."""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

cache = os.path.join(REPO, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from felics_tpu.config import TileConfig
from felics_tpu.io.images import load_image
from felics_tpu.parallel.batch import compress_tiled_batch, decompress_tiled_batch

SUITE = "/root/reference/image-suite/grayscale/8bit"
images = []
for name in sorted(os.listdir(SUITE)):
    if name.endswith(".tiff"):
        img = load_image(os.path.join(SUITE, name))
        if img.shape == (512, 512) and img.dtype == np.uint8:
            images.append(img)
    if len(images) >= 12:
        break

tc = TileConfig(tile_h=32, tile_w=32)
pixels = sum(im.size for im in images)
decompress_tiled_batch(compress_tiled_batch(images, tc, "pallas"), "pallas")
best_enc = best_dec = float("inf")
for it in range(1, 5):
    vs = []
    for im in images:
        v = im.copy()
        v[0, 2] = (int(v[0, 2]) + it) % 255
        vs.append(v)
    t0 = time.perf_counter()
    blobs = compress_tiled_batch(vs, tc, "pallas")
    t1 = time.perf_counter()
    outs = decompress_tiled_batch(blobs, "pallas")
    t2 = time.perf_counter()
    for v, o in zip(vs, outs):
        assert np.array_equal(v, o)
    print(f"iter {it}: enc {1e3*(t1-t0):6.1f} ms  dec {1e3*(t2-t1):6.1f} ms")
    best_enc = min(best_enc, t1 - t0)
    best_dec = min(best_dec, t2 - t1)
mpxs = 2 * pixels / (best_enc + best_dec) / 1e6
print(
    f"container-level: {mpxs:.1f} Mpx/s "
    f"(enc {best_enc*1e3:.0f} ms, dec {best_dec*1e3:.0f} ms)"
)
