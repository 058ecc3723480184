#!/usr/bin/env python
"""Ratio lab: decompose FLCT's size overhead vs FLCS and prototype fixes.

Simulates per-tile FLCT coding costs in pure numpy (code LENGTHS only — no
bit packing), so k-prior / table-encoding candidates can be swept over the
corpus in seconds. Components measured per image:

  - FLCS single-stream payload size (the budget denominator);
  - FLCT payload bits (per-tile preambles + symbol lengths);
  - per-tile byte-alignment waste;
  - tile length table size (u32 vs LEB128 varint);
  - k-prior variants: none / static / per-image per-(channel,bucket) k0 at
    several prior weights C (table seeded with C * |k - k0|).

Usage: JAX_PLATFORMS=cpu python scripts/ratio_lab.py [n_images] [tile]
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from felics_tpu.core.context import neighbour_indices
from felics_tpu.core.color import rgb_to_ycocg
from felics_tpu.config import tiled_config_for_depth
from felics_tpu.format import ColorType, PixelDepth
from felics_tpu.parallel.tiling import _prepare_tiles

SUITE = "/root/reference/image-suite/grayscale/8bit"
SUITE_RGB = "/root/reference/image-suite/rgb/8bit"


def analyze(tiles, th, tw):
    """tiles: (nt, c, t) int32 -> context, low, class masks, residual."""
    a_idx, b_idx = neighbour_indices(th, tw, xp=np)
    v1 = tiles[..., a_idx]
    v2 = tiles[..., b_idx]
    high = np.maximum(v1, v2)
    low = np.minimum(v1, v2)
    ctx = high - low
    t = th * tw
    pix = np.arange(t)
    first_two = pix < 2
    p = tiles
    in_range = (p >= low) & (p <= high) & ~first_two
    below = (p < low) & ~first_two
    above = (p > high) & ~first_two
    oor = below | above
    residual = np.where(below, low - p - 1, np.where(above, p - high - 1, 0))
    return ctx, low, in_range, oor, residual


def phase_len(ctx, val):
    """phase-in code length of val over n = ctx+1 (matches stage2)."""
    nn = ctx + 1
    m = np.int64(np.floor(np.log2(np.maximum(nn, 1)))).astype(np.int64)
    left_p = nn - (1 << m)
    right_p = (1 << (m + 1)) - nn
    x = val + nn - left_p
    r = x - np.where(x >= nn, nn, 0)
    return np.where(r < right_p, m, m + 1) + 0


def bitlen(x):
    out = np.zeros_like(x)
    nz = x > 0
    out[nz] = np.floor(np.log2(x[nz])).astype(out.dtype) + 1
    return out


def k_with_prior(qctx, oor, residual, k_values, nb, prior):
    """k per pixel. qctx/oor/residual: (D, T). prior: (D, nb, K) or None."""
    K = len(k_values)
    rows = (residual[..., None] >> k_values) + 1 + k_values  # (D,T,K)
    rows = np.where(oor[..., None], rows, 0)
    k = np.full(qctx.shape, k_values[-1], np.int64)
    for b in range(nb):
        mask = (qctx == b) & oor
        contrib = np.where(mask[..., None], rows, 0)
        table = np.cumsum(contrib, axis=1) - contrib
        if prior is not None:
            table = table + prior[:, b, :][:, None, :]
        best = (K - 1) - np.argmin(table[..., ::-1], axis=-1)
        k = np.where(mask, k_values[best], k)
    return k


def best_k0(qctx, oor, residual, k_values, nb, c, nt):
    """Per-(channel, bucket) k minimizing total Rice length over the image.
    qctx etc: (nt, c, t). Returns (c, nb) int."""
    K = len(k_values)
    rows = (residual[..., None] >> k_values) + 1 + k_values  # (nt,c,t,K)
    rows = np.where(oor[..., None], rows, 0)
    k0 = np.zeros((c, nb), np.int64)
    for ch in range(c):
        for b in range(nb):
            mask = (qctx[:, ch] == b) & oor[:, ch]
            tot = np.where(mask[..., None], rows[:, ch], 0).sum(axis=(0, 1))
            # ties -> largest k (estimator convention)
            k0[ch, b] = k_values[(K - 1) - np.argmin(tot[::-1])]
    return k0


def leb128_len(n):
    n = np.maximum(np.asarray(n, np.int64), 0)
    return np.maximum(1, (bitlen(n) + 6) // 7)


def tile_bits_for(tiles, th, tw, cfg, nb, prior_spec):
    """Total payload bits + per-tile bit counts for one prior spec."""
    nt, c, t = tiles.shape
    ctx, low, in_range, oor, residual = analyze(tiles, th, tw)
    qctx = bitlen(ctx)
    k_values = np.asarray(cfg.k_values, np.int64)

    if prior_spec is None:
        prior = None
    else:
        kind, C = prior_spec
        if kind == "image":
            k0 = best_k0(qctx, oor, residual, k_values, nb, c, nt)  # (c,nb)
        elif kind == "static":
            # header-free guess: typical OOR residual scales with the bucket
            k0 = np.maximum(0, np.arange(nb)[None, :] - 3 + np.zeros((c, 1), np.int64))
            k0 = np.minimum(k0, k_values[-1])
        prior = C * np.abs(
            k_values[None, None, :] - k0[..., None]
        )  # (c, nb, K)
        prior = np.broadcast_to(
            prior[None], (nt, c, nb, len(k_values))
        ).reshape(nt * c, nb, len(k_values))

    k = k_with_prior(
        qctx.reshape(nt * c, t),
        oor.reshape(nt * c, t),
        residual.reshape(nt * c, t),
        k_values,
        nb,
        prior,
    ).reshape(nt, c, t)

    lens = np.where(
        in_range,
        1 + phase_len(ctx, tiles - low),
        2 + (residual >> k) + 1 + k,
    )
    pix = np.arange(t)
    pre_w = cfg.depth_bits + (np.arange(c) > 0).astype(np.int64)
    lens = np.where(pix[None, None, :] == 0, pre_w[None, :, None], lens)
    lens = np.where(pix[None, None, :] == 1, pre_w[None, :, None], lens)
    tile_bits = lens.reshape(nt, -1).sum(axis=1)
    return tile_bits


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    use_rgb = len(sys.argv) > 3 and sys.argv[3] == "rgb"
    from felics_tpu.io.images import load_image
    from felics_tpu.api import compress_image_bytes

    suite = SUITE_RGB if use_rgb else SUITE
    color = ColorType.RGB if use_rgb else ColorType.GRAY
    images = []
    for name in sorted(os.listdir(suite)):
        if not name.endswith(".tiff"):
            continue
        img = load_image(os.path.join(suite, name))
        images.append(img)
        if len(images) >= n_images:
            break

    cfg = tiled_config_for_depth(PixelDepth.EIGHT)
    from felics_tpu.ops.kscan_tiled import num_buckets as _nbf
    nb = _nbf(cfg)

    specs = {
        "none": None,
        "static C=8": ("static", 8),
        "img C=2": ("image", 2),
        "img C=4": ("image", 4),
        "img C=8": ("image", 8),
        "img C=16": ("image", 16),
        "img C=32": ("image", 32),
        "img C=64": ("image", 64),
    }

    tot_flcs = 0
    tot = {name: 0 for name in specs}
    tot_align = 0
    tot_table_u32 = 0
    tot_table_varint = 0
    n_tiles_total = 0
    for img in images:
        flcs = len(compress_image_bytes(img, backend="native")) - 14
        tot_flcs += flcs
        tiles, ty, tx = _prepare_tiles(img, color, tile, tile)
        nt = tiles.shape[0]
        n_tiles_total += nt
        for name, spec in specs.items():
            tb = tile_bits_for(tiles, tile, tile, cfg, nb, spec)
            tbytes = (tb + 7) // 8
            tot[name] += int(tbytes.sum())
            if name == "none":
                tot_align += int((tbytes * 8 - tb).sum()) // 8
                tot_table_u32 += 4 * nt
                tot_table_varint += int(leb128_len(tbytes).sum())

    print(f"images={len(images)} tile={tile} FLCS payload={tot_flcs}")
    print(
        f"table u32={tot_table_u32} ({100*tot_table_u32/tot_flcs:.3f}%) "
        f"varint={tot_table_varint} ({100*tot_table_varint/tot_flcs:.3f}%) "
        f"align={tot_align} ({100*tot_align/tot_flcs:.3f}%)"
    )
    for name in specs:
        for tbl, tname in ((tot_table_u32, "u32"), (tot_table_varint, "var")):
            full = tot[name] + tbl
            print(
                f"  prior={name:12s} table={tname}: payload={tot[name]} "
                f"total={full} vs FLCS {100*(full-tot_flcs)/tot_flcs:+.3f}%"
            )


if __name__ == "__main__":
    main()
