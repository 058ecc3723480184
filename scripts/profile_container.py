"""Profile where container-level (batch) encode/decode wall time goes.

Breaks compress_tiled_batch / decompress_tiled_batch into stages and times
each on the real backend. Run:  python scripts/profile_container.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

cache = os.path.join(REPO, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import load_batch, TILE
from felics_tpu.config import TileConfig, tiled_config_for_depth
from felics_tpu.format import ColorType, PixelDepth
from felics_tpu.ops.kscan_tiled import num_buckets
from felics_tpu.parallel import tiling
from felics_tpu.parallel.batch import compress_tiled_batch, decompress_tiled_batch


def t(label, fn, n=3):
    best = float("inf")
    r = None
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:45s} {best*1e3:8.1f} ms")
    return r


def main():
    images = load_batch()
    tc = TileConfig(tile_h=TILE, tile_w=TILE)
    cfg = tiled_config_for_depth(PixelDepth.EIGHT)
    nb = num_buckets(cfg)
    th = tw = TILE

    # warm everything
    blobs = compress_tiled_batch(images, tc, "pallas")
    decompress_tiled_batch(blobs, "pallas")

    # RTT probe
    x = jnp.zeros((1,), jnp.int32)
    jax.block_until_ready(x + 1)
    t("RTT (tiny dispatch+sync)", lambda: jax.block_until_ready(x + 1), n=5)

    # upload bandwidth probe
    big = np.zeros((3 * 1024 * 1024,), np.uint8)
    t("upload 3MB uint8", lambda: jax.block_until_ready(jnp.asarray(big)), n=3)
    bigw = np.zeros((3 * 1024 * 1024 // 4,), np.uint32)
    dev = jax.block_until_ready(jnp.asarray(bigw))
    t("download 3MB", lambda: np.asarray(dev), n=3)

    # Stage: host tile prep
    parts = t(
        "host _prepare_tiles x12",
        lambda: [tiling._prepare_tiles(im, ColorType.GRAY, th, tw) for im in images],
    )
    counts = [p[0].shape[0] for p in parts]
    tiles_np = np.concatenate([p[0] for p in parts])
    c = tiles_np.shape[1]
    nt, _, tt = tiles_np.shape
    tile_group = np.repeat(np.arange(len(images)), counts)
    print(f"  tiles: {tiles_np.shape} = {tiles_np.nbytes/1e6:.1f} MB int32")

    nd = tiling.narrow_tile_dtype(cfg.depth_bits, c)
    narrow = tiles_np.astype(nd)
    print(f"  narrow dtype {nd}: {narrow.nbytes/1e6:.1f} MB")
    t("upload tiles (narrow)", lambda: jax.block_until_ready(jnp.asarray(narrow)))
    tiles_dev = jnp.asarray(narrow)
    tg = jnp.asarray(tile_group, jnp.int32)

    def k0p():
        r = tiling.compute_k0_prior_jax(tiles_dev, tg, th, tw, cfg, nb, len(images))
        return jax.block_until_ready(r)

    k0_dev, prior_dev = t("compute_k0_prior_jax (dispatch+sync)", k0p)

    def enc():
        r = tiling.encode_tiles_payload(
            tiles_dev, prior_dev, cfg, th, tw, "pallas", extra=k0_dev
        )
        return r

    lengths, payload, k0s = t("encode_tiles_payload (incl fetch)", enc)
    print(f"  payload: {len(payload)/1e6:.2f} MB, lengths dtype fetch")

    t("pack containers (host)", lambda: [
        tiling.pack_tiled_container(
            ColorType.GRAY, PixelDepth.EIGHT, 512, 512, tw, th, counts[i],
            np.asarray(lengths)[sum(counts[:i]): sum(counts[:i+1])],
            b"x", np.asarray(k0s)[i],
        )
        for i in range(len(images))
    ])

    t("FULL compress_tiled_batch", lambda: compress_tiled_batch(images, tc, "pallas"))
    blobs = compress_tiled_batch(images, tc, "pallas")

    # ---- decode side ----
    headers = [tiling.read_tiled_header(d) for d in blobs]
    t("read headers x12", lambda: [tiling.read_tiled_header(d) for d in blobs])
    h0 = headers[0]
    payload = b"".join(
        d[h.payload_off : h.payload_off + int(h.tile_lengths.sum())]
        for d, h in zip(blobs, headers)
    )
    lens = np.concatenate([h.tile_lengths for h in headers])
    priors = np.stack([tiling.prior_from_k0(h.k0, cfg, c) for h in headers])
    tg2 = np.repeat(np.arange(len(headers)), [h.n_tiles for h in headers])

    def dec():
        r = tiling.decode_tiles_bufs(
            payload, lens, th, tw, c, cfg, priors, tg2, "pallas"
        )
        return jax.block_until_ready(r)

    bufs = t("decode_tiles_bufs (dispatch+sync)", dec)

    def narrow_fetch():
        small, bad = tiling._narrow_bufs(bufs, 8, nd.name)
        return jax.device_get((small, bad))

    t("narrow+fetch bufs", narrow_fetch)
    small_np, bad_np = narrow_fetch()
    bufs_np = np.asarray(small_np).astype(np.int32)

    t("assemble images (host)", lambda: [
        tiling.assemble_image_np(
            bufs_np[sum(counts[:i]): sum(counts[:i+1])], th, tw, c,
            -(-512 // th), -(-512 // tw), 512, 512, 255,
        )
        for i in range(len(images))
    ])

    t("FULL decompress_tiled_batch", lambda: decompress_tiled_batch(blobs, "pallas"))


main()
