#!/usr/bin/env python
"""Decompose the fused container chain's finish_sync for one class:
device-compute (two-rep slope inside ONE dispatch), result-fetch
(device_get of the already-computed outputs), and dispatch RTT.

Usage: python scripts/chain_probe.py [rgb8|gray8|gray16]
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
TILE = 32


def main():
    cls = sys.argv[1] if len(sys.argv) > 1 else "rgb8"
    import jax
    import jax.numpy as jnp

    cache = os.path.join(REPO, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import bench
    from felics_tpu.config import TileConfig
    from felics_tpu.parallel import batch, tiling

    if cls == "rgb8":
        images = bench.load_suite("rgb/8bit", (512, 512, 3), np.uint8, 8)
    elif cls == "gray16":
        images = bench.load_suite(
            "grayscale/16bit", (512, 512), np.uint16, 4
        )
    else:
        images = bench.load_suite("grayscale/8bit", (512, 512), np.uint8, 12)
    tc = TileConfig(TILE, TILE)

    # Warm the images fast path end to end.
    blobs = batch.compress_tiled_batch(images, tc)
    outs = batch.decompress_tiled_batch(blobs)
    print("paths:", batch.LAST_PATH, flush=True)

    # ---- ENCODE: dispatch and leave the outputs on device ----
    def enc_pending(it):
        vs = []
        for im in images:
            v = im.copy()
            if v.ndim == 3:
                v[0, 2, 0] = (int(v[0, 2, 0]) + it) % 255
            else:
                v[0, 2] = (int(v[0, 2]) + it) % 255
            vs.append(v)
        return batch._encode_dispatch_images(vs, tc, "auto")

    # Dispatch+compute+block (no fetch): block_until_ready on device arrays.
    for it in (1, 2, 3):
        prep, p = enc_pending(it)
        dev_arrays = [v for v in p.values() if hasattr(v, "block_until_ready")]
        t0 = time.perf_counter()
        for a in dev_arrays:
            a.block_until_ready()
        t_block = time.perf_counter() - t0
        # Fetch the same outputs (device -> host).
        t0 = time.perf_counter()
        np_out = jax.device_get(dev_arrays)
        t_fetch = time.perf_counter() - t0
        sizes = [getattr(a, "nbytes", 0) for a in dev_arrays]
        print(
            f"enc it{it}: block(dispatch+compute)={t_block:.3f}s "
            f"fetch={t_fetch:.3f}s sizes={sizes}",
            flush=True,
        )

    # ---- DECODE: same decomposition ----
    prep = batch._prep_decode_batch(blobs)
    for it in (1, 2, 3):
        p = batch._decode_dispatch_images(prep, "auto")
        dev_arrays = [v for v in p.values() if hasattr(v, "block_until_ready")]
        t0 = time.perf_counter()
        for a in dev_arrays:
            a.block_until_ready()
        t_block = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(dev_arrays)
        t_fetch = time.perf_counter() - t0
        sizes = [getattr(a, "nbytes", 0) for a in dev_arrays]
        print(
            f"dec it{it}: block(dispatch+compute)={t_block:.3f}s "
            f"fetch={t_fetch:.3f}s sizes={sizes}",
            flush=True,
        )


if __name__ == "__main__":
    main()
