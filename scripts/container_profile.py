"""Stage-level wall-clock breakdown of the batched FLCT container path on
the real chip (tunneled). Run: python scripts/container_profile.py"""

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

from felics_tpu.config import TileConfig, tiled_config_for_depth
from felics_tpu.format import ColorType, PixelDepth
from felics_tpu.ops.kscan_tiled import num_buckets
from felics_tpu.parallel import tiling
from felics_tpu.parallel.batch import compress_tiled_batch, decompress_tiled_batch
from felics_tpu.io.images import load_image

SUITE = "/root/reference/image-suite/grayscale/8bit"
TILE = 32

images = []
for name in sorted(os.listdir(SUITE)):
    if name.endswith(".tiff"):
        img = load_image(os.path.join(SUITE, name))
        if img.shape == (512, 512) and img.dtype == np.uint8:
            images.append(img)
    if len(images) >= 12:
        break

tc = TileConfig(tile_h=TILE, tile_w=TILE)
cfg = tiled_config_for_depth(PixelDepth.EIGHT)
nb = num_buckets(cfg)
th = tw = TILE

# warm
blobs = compress_tiled_batch(images, tc, "pallas")
decompress_tiled_batch(blobs, "pallas")

def stamp(label, t0):
    t1 = time.perf_counter()
    print(f"  {label:34s} {1e3*(t1-t0):8.1f} ms")
    return t1

for it in range(2):
    print(f"--- encode iter {it}")
    vs = [im.copy() for im in images]
    for v in vs:
        v[0, 2] = (int(v[0, 2]) + it + 1) % 255
    t0 = time.perf_counter()
    parts = [tiling._prepare_tiles(im, ColorType.GRAY, th, tw) for im in vs]
    counts = [p[0].shape[0] for p in parts]
    tiles_np = np.concatenate([p[0] for p in parts])
    tile_group = np.repeat(np.arange(len(vs)), counts)
    t0 = stamp("prepare_tiles (host)", t0)
    tiles_small = tiles_np.astype(tiling.narrow_tile_dtype(cfg.depth_bits, 1))
    tiles_dev = jax.device_put(jnp.asarray(tiles_small))
    tiles_dev.block_until_ready()
    t0 = stamp(f"upload tiles {tiles_small.dtype} {tiles_small.nbytes/1e6:.1f}MB", t0)
    k0_dev, prior_dev = tiling.compute_k0_prior_jax(
        tiles_dev, jnp.asarray(tile_group, jnp.int32), th, tw, cfg, nb, len(vs)
    )
    jax.block_until_ready((k0_dev, prior_dev))
    t0 = stamp("k0+prior dispatch", t0)
    from felics_tpu.ops import pallas_codec as pc
    t = th * tw
    wtry = pc.width_hint(cfg, t, 1)
    words, bits = pc.encode_tiles(tiles_dev, cfg, th, tw, wtry, prior_dev)
    jax.block_until_ready(bits)
    t0 = stamp(f"encode dispatch (W={wtry})", t0)
    bits_np, k0s = jax.device_get((bits, k0_dev))
    t0 = stamp("fetch bits+k0", t0)
    words_np = np.asarray(words)
    t0 = stamp(f"fetch words {words_np.nbytes/1e6:.1f}MB", t0)
    tile_bytes_np = ((np.asarray(bits_np).astype(np.int64) + 7) // 8)
    payload_b = tiling._columns_to_payload(words_np, tile_bytes_np)
    t0 = stamp("columns_to_payload (host)", t0)

    print(f"--- decode iter {it}")
    blobs = compress_tiled_batch(vs, tc, "pallas")
    headers = [tiling.read_tiled_header(d) for d in blobs]
    t0 = time.perf_counter()
    payload = b"".join(
        d[h.payload_off : h.payload_off + int(h.tile_lengths.sum())]
        for d, h in zip(blobs, headers)
    )
    lens = np.concatenate([h.tile_lengths for h in headers])
    priors = np.stack([tiling.prior_from_k0(h.k0, cfg, 1) for h in headers])
    tg = np.repeat(np.arange(len(headers)), [h.n_tiles for h in headers])
    t0 = stamp("header parse + concat (host)", t0)
    bufs = tiling.decode_tiles_bufs(payload, lens, th, tw, 1, cfg, priors, tg, "pallas")
    jax.block_until_ready(bufs)
    t0 = stamp("decode_tiles_bufs (all)", t0)
    small, badf = tiling._narrow_bufs(bufs, cfg.depth_bits, "uint8")
    bufs_np, _ = jax.device_get((small, badf))
    t0 = stamp(f"narrow + fetch bufs {bufs_np.nbytes/1e6:.1f}MB", t0)
