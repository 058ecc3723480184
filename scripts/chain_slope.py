#!/usr/bin/env python
"""Device-compute-only timing of the fused images encode/decode chains via
the rep-slope method (rep executions inside ONE dispatch; the slope between
two rep counts cancels upload, RTT, and fetch exactly — DESIGN.md §7).

Usage: python scripts/chain_slope.py [rgb8|gray8|gray16]
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
    blobs = batch.compress_tiled_batch(images, tc)  # warm + width hints
    outs = batch.decompress_tiled_batch(blobs)

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

    @partial(jax.jit, static_argnames=("rep",))
    def rep_enc(imgs, seeds, rep):
        probes = []
        for r in range(rep):
            v = imgs.at[0, 0, (2,) if not rgb else (2, 0)].add(
                seeds[r].astype(imgs.dtype) % 3
            )
            pay, bits, k0, total = tiling._fused_encode_chain_images(
                v, th, tw, cfg, nb, n, W, cap, False, rgb
            )
            probes.append(
                total + bits[0] + pay[0].astype(jnp.int32) + k0[0, 0, 0]
            )
        return jnp.stack(probes)

    def timed(fn, arg_sets):
        fn(*arg_sets[0]).block_until_ready()
        best = float("inf")
        for a in arg_sets[1:]:
            t0 = time.perf_counter()
            fn(*a).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    R1, R2, iters = 1, 3, 3
    seed = 0
    walls = {}
    for rep in (R1, R2):
        sets = []
        for _ in range(iters + 1):
            sets.append(
                (imgs_dev, jnp.arange(seed, seed + rep, dtype=jnp.int32), rep)
            )
            seed += rep
        walls[rep] = timed(rep_enc, sets)
    t_enc = (walls[R2] - walls[R1]) / (R2 - R1)
    print(
        f"{cls} ENC chain: wall@1={walls[R1]:.3f}s wall@3={walls[R2]:.3f}s "
        f"-> device compute {t_enc*1e3:.0f} ms "
        f"({pixels/t_enc/1e6:.0f} Mpx/s); fixed overhead "
        f"(upload+RTT+fetch) = {walls[R1]-t_enc:.3f}s",
        flush=True,
    )

    # ---- decode chain ----
    prep = batch._prep_decode_batch(blobs)
    lens = np.asarray(prep["lens"], np.int64)
    expected = int(lens.sum())
    wd = pc.bucket_words(int(-(-lens.max(initial=1) // 4)))
    starts_b = np.concatenate([[0], np.cumsum(lens)[:-1]])
    pr = prep["priors"][np.asarray(prep["tile_group"])]
    pad = tiling._bucket_bytes(expected)
    buf = np.frombuffer(
        prep["payload"][:expected].ljust(pad, b"\0"), dtype=np.uint8
    )
    depth_max = (1 << cfg.depth_bits) - 1
    buf_dev = jnp.asarray(buf)
    starts_dev = jnp.asarray(starts_b, jnp.int32)
    lens_dev = jnp.asarray(lens, jnp.int32)
    pr_dev = jnp.asarray(pr)

    @partial(jax.jit, static_argnames=("rep",))
    def rep_dec(payload_u8, starts, lens_, prior, seeds, rep):
        probes = []
        for r in range(rep):
            pl = payload_u8.at[-1].set(seeds[r].astype(jnp.uint8))
            out, valid = tiling._fused_decode_images_chain(
                pl, starts, lens_, prior, th, tw, c, cfg, wd, n, ty, tx,
                h, w, depth_max, False,
            )
            probes.append(
                out.reshape(-1)[0].astype(jnp.int32) + valid[0].astype(jnp.int32)
            )
        return jnp.stack(probes)

    walls = {}
    for rep in (R1, R2):
        sets = []
        for _ in range(iters + 1):
            sets.append(
                (buf_dev, starts_dev, lens_dev, pr_dev,
                 jnp.arange(seed, seed + rep, dtype=jnp.int32), rep)
            )
            seed += rep
        walls[rep] = timed(rep_dec, sets)
    t_dec = (walls[R2] - walls[R1]) / (R2 - R1)
    print(
        f"{cls} DEC chain: wall@1={walls[R1]:.3f}s wall@3={walls[R2]:.3f}s "
        f"-> device compute {t_dec*1e3:.0f} ms "
        f"({pixels/t_dec/1e6:.0f} Mpx/s); fixed overhead "
        f"(upload+RTT+fetch) = {walls[R1]-t_dec:.3f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
