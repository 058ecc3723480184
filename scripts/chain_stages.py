#!/usr/bin/env python
"""Per-STAGE device-compute slope timing of the fused images encode chain:
(a) device tiler (pad/YCoCg/reshape), (b) exact k0+prior, (c) Pallas encode
kernel, (d) payload compaction. Identifies which stage owns the chain time
measured by chain_slope.py.

Usage: python scripts/chain_stages.py [rgb8|gray8|gray16]
"""

import os
import sys
import time
from functools import partial

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
    from felics_tpu.config import TileConfig, tiled_config_for_depth
    from felics_tpu.format import PixelDepth
    from felics_tpu.ops import pallas_codec as pc
    from felics_tpu.ops.kscan_tiled import num_buckets
    from felics_tpu.parallel import batch, tiling

    if cls == "rgb8":
        images = bench.load_suite("rgb/8bit", (512, 512, 3), np.uint8, 8)
        pd = PixelDepth.EIGHT
    elif cls == "gray16":
        images = bench.load_suite("grayscale/16bit", (512, 512), np.uint16, 4)
        pd = PixelDepth.SIXTEEN
    else:
        images = bench.load_suite("grayscale/8bit", (512, 512), np.uint8, 12)
        pd = PixelDepth.EIGHT

    tc = TileConfig(TILE, TILE)
    blobs = batch.compress_tiled_batch(images, tc)  # warm + hints

    cfg = tiled_config_for_depth(pd)
    nb = num_buckets(cfg)
    th = tw = TILE
    t = th * tw
    rgb = images[0].ndim == 3
    c = 3 if rgb else 1
    n = len(images)
    h, w = images[0].shape[:2]
    ty, tx = -(-h // th), -(-w // tw)
    nt = n * ty * tx
    W = pc.width_hint(cfg, t, c)
    cap = tiling.payload_cap_hint(cfg, nt, t, c)
    imgs_dev = jnp.asarray(np.stack(images))
    pixels = n * h * w
    img_of_tile = jnp.repeat(jnp.arange(n, dtype=jnp.int32), ty * tx)
    meta = [jnp.asarray(m) for m in pc._meta_arrays(th, tw, c, cfg.depth_bits)]

    from felics_tpu.format import ColorType

    color = ColorType.RGB if rgb else ColorType.GRAY
    nd = tiling.narrow_tile_dtype(cfg.depth_bits, c)
    tiles_host = np.concatenate(
        [tiling._prepare_tiles(im, color, th, tw)[0] for im in images]
    ).astype(nd)
    tiles_dev = jnp.asarray(tiles_host)

    # Reference prior for the kernel-only stage.
    k0_np = tiling.compute_k0_batch(
        tiles_host.astype(np.int32), [ty * tx] * n, th, tw, cfg, nb
    )
    prior_np = tiling.prior_from_k0(k0_np, cfg, c)[img_of_tile]
    prior_dev = jnp.asarray(prior_np)

    words0, bits0 = pc._encode_tiles_pallas(
        tiles_dev.reshape(nt, c * t), *meta, prior_dev, th, tw, c, W, cfg,
        False,
    )
    words0.block_until_ready()

    def make_rep(body, probe):
        @partial(jax.jit, static_argnames=("rep",))
        def f(seeds, rep):
            outs = []
            for r in range(rep):
                outs.append(probe(body(seeds[r])))
            return jnp.stack(outs)
        return f

    def slope(f, label):
        R1, R2, iters = 1, 3, 3
        seed = 0
        walls = {}
        for rep in (R1, R2):
            sets = []
            for _ in range(iters + 1):
                sets.append(
                    (jnp.arange(seed, seed + rep, dtype=jnp.int32), rep)
                )
                seed += rep
            f(*sets[0]).block_until_ready()
            best = float("inf")
            for a in sets[1:]:
                t0 = time.perf_counter()
                f(*a).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            walls[rep] = best
        tt = (walls[R2] - walls[R1]) / (R2 - R1)
        print(
            f"{cls} {label}: {tt*1e3:.1f} ms ({pixels/max(tt,1e-9)/1e6:.0f} "
            f"Mpx/s)",
            flush=True,
        )
        return tt

    # (a) device tiler
    def tiler(s):
        v = imgs_dev.at[0, 0, 2].add(s.astype(imgs_dev.dtype) % 3)
        return tiling._image_tiles_device(v, th, tw, rgb)
    slope(make_rep(tiler, lambda o: o[0, 0, 0]), "tiler")

    # (b) exact k0 + prior
    def k0s(s):
        v = tiles_dev.at[0, 0, 2].add(s.astype(tiles_dev.dtype) % 3)
        k0, prior = tiling.compute_k0_prior_jax(
            v, img_of_tile, th, tw, cfg, nb, n
        )
        return k0[0, 0, 0] + prior[0, 0, 0, 0]
    slope(make_rep(k0s, lambda o: o), "k0+prior")

    # (c) Pallas encode kernel (prior precomputed)
    def kern(s):
        v = tiles_dev.at[0, 0, 2].add(s.astype(tiles_dev.dtype) % 3)
        words, bits = pc._encode_tiles_pallas(
            v.reshape(nt, c * t), *meta, prior_dev, th, tw, c, W, cfg, False
        )
        return words[0, 0].astype(jnp.int32) + bits[0]
    slope(make_rep(kern, lambda o: o), "pallas-encode")

    # (d) compaction (seed varies word CONTENT only — sizes unchanged, so
    # each rep is a distinct computation that cannot be CSE'd away)
    def compact(s):
        wv = words0.at[0, 0].add(s.astype(jnp.uint32))
        payload, tb, total = tiling._compact_payload_jit(wv, bits0, cap)
        return payload[0].astype(jnp.int32) + total
    slope(make_rep(compact, lambda o: o), "compact")


if __name__ == "__main__":
    main()
