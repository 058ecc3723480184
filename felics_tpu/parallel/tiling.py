"""FLCT — the tiled-parallel container format.

Layout (all integers big-endian):

    0:4    magic "FLCT"
    4      color type      (0 = gray, 1 = rgb; same enum as FLCS)
    5      pixel depth     (0 = 8-bit, 1 = 16-bit)
    6:10   width  u32      (true image dims, pre-padding)
    10:14  height u32
    14:16  tile_w u16
    16:18  tile_h u16
    18:20  flags  u16      (bit 0: u16 length table; bit 1: k-prior block)
    20:24  n_tiles u32
    24:..  [flags bit 1] k-prior block: one 4-bit k0 per (channel, bucket),
           channel-major, high nibble first, zero-padded to a whole byte
           (ceil(C*nb/2) bytes;
           nb = min(bit_length(MAX_CONTEXT), QCTX_CAP) + 1 = 6)
    ..     per-tile payload byte length × n_tiles
           (u16 when flags bit 0 is set — the encoder sets it whenever every
           tile's payload fits — else u32)
    ..     payload: concatenated per-tile streams, each byte-aligned

The image is edge-replicated up to a multiple of the tile size; tiles are
row-major over the padded canvas. Each tile's stream is FELICS coding of its
channel planes (Y/Co/Cg for RGB) coded back-to-back exactly like a miniature
FLCS payload — per-tile raw first-two-pixels preamble, fresh k statistics —
with THREE deviations: (1) the k-estimator is indexed by the log-bucketed
context ``qctx = min(bit_length(Δ), QCTX_CAP)`` (felics_tpu.ops.kscan_tiled,
config.QCTX_CAP = 5) instead of exact Δ — 6 buckets keep per-tile tables
tiny (6 x K rows; merging the rare high-Δ contexts measured FREE on ratio),
which is what lets thousands of tiles decode concurrently on-chip; (2) the
raw preamble pixels
are depth-sized rather than 32-bit (plane 0: ``depth`` unsigned bits; the
signed Co/Cg planes: ``depth+1``-bit two's complement) — per-tile restart
overhead matters at tile granularity where 32-bit preambles cost ~1% of the
whole payload; (3) (v2, flags bit 1) every (tile, channel) k-table starts at
the per-image prior ``PRIOR_WEIGHT * |k - k0[channel][bucket]|`` instead of
all zeros, where k0 is the globally-best k per (channel, bucket) computed by
the encoder over the whole image and stored in the header as 4-bit nibbles —
this removes most of the per-tile estimator cold-start cost (measured: tile
32 goes from +1.3% to +0.6% vs single-stream FLCS on the corpus; see
scripts/ratio_lab.py). A zero prior reproduces the v0 (flags=0) streams
bit-exactly, so v0 containers remain decodable.

Tiles are mutually independent: encode is one batched XLA program over all
tiles; decode vmaps a per-tile sequential scan; the tile axis shards over a
``jax.sharding.Mesh`` for multi-chip runs (felics_tpu.parallel.mesh).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from functools import lru_cache as functools_lru_cache

from felics_tpu import errors
from felics_tpu.config import (
    CodingConfig,
    TileConfig,
    config_for_depth,
    tiled_config_for_depth,
)
from felics_tpu.core.color import rgb_to_ycocg, ycocg_to_rgb
from felics_tpu.core.context import neighbour_indices
from felics_tpu.format import ColorType, PixelDepth
from felics_tpu.ops import bitpack
from felics_tpu.ops.analysis import phase_in_code
from felics_tpu.ops.kscan_tiled import kscan_tiled, num_buckets, qctx_of


def _bucket_count(value: int, minimum: int = 64) -> int:
    """Bucket a compaction count to bound jit recompilation."""
    if value <= minimum:
        return minimum
    gran = max(minimum, 1 << max(0, value.bit_length() - 2))
    return -(-value // gran) * gran

MAGIC_TILED = b"FLCT"
_FIXED_HEADER = struct.Struct(">4sBBIIHHHI")  # 24 bytes

FLAG_TABLE_U16 = 0x0001  # tile length table entries are u16 (else u32)
FLAG_K_PRIOR = 0x0002  # header carries the per-(channel, bucket) k0 prior
_KNOWN_FLAGS = FLAG_TABLE_U16 | FLAG_K_PRIOR
# Seed weight of the k-prior: every (tile, channel) k-table starts at
# PRIOR_WEIGHT * |k - k0| instead of zeros (swept in scripts/ratio_lab.py;
# 2-4 are equivalent on the corpus, larger over-commits to the global k).
PRIOR_WEIGHT = 4


@dataclass
class TiledHeader:
    color_type: ColorType
    pixel_depth: PixelDepth
    width: int
    height: int
    tile_w: int
    tile_h: int
    n_tiles: int
    tile_lengths: np.ndarray  # payload bytes per tile
    flags: int = 0
    k0: Optional[np.ndarray] = None  # (C, nb) per-(channel, bucket) prior k
    payload_off: int = _FIXED_HEADER.size

    @property
    def num_channels(self) -> int:
        return 1 if self.color_type == ColorType.GRAY else 3


def read_tiled_header(data: bytes) -> TiledHeader:
    if len(data) < _FIXED_HEADER.size:
        raise errors.IoError("truncated FLCT header")
    magic, color, depth, w, h, tw, th, flags, n_tiles = _FIXED_HEADER.unpack(
        data[: _FIXED_HEADER.size]
    )
    if magic != MAGIC_TILED:
        raise errors.InvalidSignature(f"bad magic {magic!r}")
    if flags & ~_KNOWN_FLAGS:
        raise errors.InvalidValue(f"unsupported FLCT flags {flags:#06x}")
    color_type = ColorType.from_byte(color)
    pixel_depth = PixelDepth.from_byte(depth)
    # Every header field is validated before use, like the reference's
    # format reader (src/compression/format.rs:63-84): the encoder never
    # emits tile dims < 2 (see _clamped_tile_dims), and the tile grid
    # implied by (dims, tile dims) must match n_tiles — a zeroed/corrupt
    # field would otherwise divide by zero or mis-slice the payload.
    if tw < 2 or th < 2:
        raise errors.InvalidDimensions(f"invalid tile dims {tw}x{th}")
    expect_tiles = 0 if (w == 0 or h == 0) else (-(-h // th)) * (-(-w // tw))
    if n_tiles != expect_tiles:
        raise errors.InvalidDimensions(
            f"tile grid mismatch: header says {n_tiles} tiles, dims imply "
            f"{expect_tiles}"
        )
    pos = _FIXED_HEADER.size
    k0 = None
    if flags & FLAG_K_PRIOR:
        c = 1 if color_type == ColorType.GRAY else 3
        cfg = tiled_config_for_depth(pixel_depth)
        nb = num_buckets(cfg)
        nbytes = (c * nb + 1) // 2
        if len(data) < pos + nbytes:
            raise errors.IoError("truncated FLCT k-prior block")
        nibs = np.frombuffer(data[pos : pos + nbytes], dtype=np.uint8)
        k0 = np.empty(nbytes * 2, np.int32)
        k0[0::2] = nibs >> 4
        k0[1::2] = nibs & 0x0F
        # Corrupt-stream tolerance: nibbles past the largest candidate k only
        # shape the prior, never the code itself — clamp for sanity.
        k0 = np.minimum(k0[: c * nb], cfg.k_values[-1]).reshape(c, nb)
        pos += nbytes
    entry = 2 if flags & FLAG_TABLE_U16 else 4
    end = pos + entry * n_tiles
    if len(data) < end:
        raise errors.IoError("truncated FLCT tile table")
    dt = ">u2" if flags & FLAG_TABLE_U16 else ">u4"
    lengths = np.frombuffer(data[pos:end], dtype=dt).astype(np.int64)
    return TiledHeader(
        color_type=color_type,
        pixel_depth=PixelDepth.from_byte(depth),
        width=w,
        height=h,
        tile_w=tw,
        tile_h=th,
        n_tiles=n_tiles,
        tile_lengths=lengths,
        flags=flags,
        k0=k0,
        payload_off=end,
    )


@functools_lru_cache(maxsize=4)
def _qctx_lut(max_context: int) -> np.ndarray:
    """min(bit_length, QCTX_CAP) lookup for 0..max_context (floats via log2
    measured ~10x slower on the host path; this is the container encoder's
    hot host op)."""
    from felics_tpu.config import QCTX_CAP

    v = np.arange(max_context + 1, dtype=np.uint32)
    lut = np.zeros(max_context + 1, np.int64)
    bit = 0
    while (1 << bit) <= max_context:
        lut[v >= (1 << bit)] = bit + 1
        bit += 1
    return np.minimum(lut, QCTX_CAP)


def compute_k0_batch(
    tiles_np: np.ndarray,
    counts,
    th: int,
    tw: int,
    cfg: CodingConfig,
    nb: int,
) -> np.ndarray:
    """Per-(image, channel, bucket) globally-best Rice k for a concatenated
    tile batch; ``counts`` = tiles per image. Returns (n_imgs, C, nb) int32.

    Exact int64 host arithmetic (the value is written into the header and
    read back by every decoder, so engines need not recompute it — but the
    native C++ encoder computes the same sums in uint64, and byte-parity
    tests require the identical argmin). Ties select the largest k and
    all-zero (unseen bucket) yields the largest k, mirroring the estimator's
    selection rule (reference: src/compression/parameter_selection.rs:71-85).
    One vectorized pass + K bincounts for the WHOLE batch (bincount weights
    are float64 but the sums stay << 2^53, hence exact).
    """
    nt, c, t = tiles_np.shape
    counts = np.asarray(counts, np.int64)
    n_imgs = len(counts)
    a_idx, b_idx = neighbour_indices(th, tw, xp=np)
    # All int32 until the bincount (tiles are int32; residuals fit easily) —
    # int64 intermediates doubled this host pass's memory traffic.
    v1 = tiles_np[..., a_idx]
    v2 = tiles_np[..., b_idx]
    low = np.minimum(v1, v2)
    ctx = np.abs(v1 - v2)
    p = tiles_np
    first_two = np.arange(t) < 2
    below = (p < low) & ~first_two
    above = (p > low + ctx) & ~first_two
    oor = below | above
    qctx = _qctx_lut(int(cfg.max_context))[ctx].astype(np.int32)

    k_values = np.asarray(cfg.k_values, np.int64)
    K = len(k_values)
    img_of_tile = np.repeat(np.arange(n_imgs, dtype=np.int32), counts)
    chan = np.arange(c, dtype=np.int32)[None, :, None]
    bucket_full = (img_of_tile[:, None, None] * c + chan) * nb + qctx
    bucket = bucket_full[oor]
    # residual only on the extracted subset (typically ~half the pixels).
    below_s = below[oor]
    pe, le, ce = p[oor], low[oor], ctx[oor]
    res = np.where(below_s, le - pe, pe - le - ce) - 1
    nbuckets = n_imgs * c * nb
    totals = np.zeros((K, nbuckets), np.int64)
    for ki, k in enumerate(k_values):
        wts = (res >> k) + 1 + int(k)
        totals[ki] = np.bincount(
            bucket, weights=wts.astype(np.float64), minlength=nbuckets
        ).astype(np.int64)
    best = (K - 1) - np.argmin(totals[::-1], axis=0)  # ties -> largest k
    return k_values[best].reshape(n_imgs, c, nb).astype(np.int32)


def compute_k0(
    tiles_np: np.ndarray, th: int, tw: int, cfg: CodingConfig, nb: int
) -> np.ndarray:
    """Per-(channel, bucket) globally-best Rice k over one image's tiles."""
    return compute_k0_batch(
        tiles_np, [tiles_np.shape[0]], th, tw, cfg, nb
    )[0]


def k0_device_exact(
    cfg: CodingConfig, tile_pixels: int, tiles_per_image: int
) -> bool:
    """Whether the on-device k0 sums are provably exact.

    The device pass (compute_k0_prior_jax) accumulates per-TILE int32
    partials, then carries them across an image's tiles as 16-bit-split
    (hi, lo) int32 pairs with a lexicographic argmin, exact far past
    int32 — so 16-bit images stay on the device path too (pre-r4 they
    fell back to a host int64 pass that dominated their encode time).

    Per-update weight bound: the YCoCg chroma planes span (-2^d, 2^d), so
    a residual reaches max_context - 1 = 2^(d+1) - 3 and the k=0 weight
    reaches max_context (NOT 2^d — an earlier form understated the chroma
    case by 2x); at most tile_pixels - 2 coded pixels update a bucket."""
    max_w = 2 * (1 << cfg.depth_bits) - 2 + cfg.num_k  # + k term at big k
    per_tile = max(0, tile_pixels - 2) * max_w
    lo_sum = tiles_per_image * ((1 << 16) - 1)
    hi_sum = tiles_per_image * (per_tile >> 16)
    return max(per_tile, lo_sum, hi_sum + (lo_sum >> 16)) < (1 << 31)


@partial(jax.jit, static_argnames=("th", "tw", "cfg", "nb", "n_imgs"))
def compute_k0_prior_jax(
    tiles, img_of_tile, th: int, tw: int, cfg: CodingConfig, nb: int,
    n_imgs: int,
):
    """On-device k0 + per-tile prior: (k0 (n_imgs, C, nb) int32,
    prior (nt, C, nb, K) int32).

    Same exact sums/argmin as compute_k0_batch (callers must gate with
    k0_device_exact); keeps the whole container encode chain on-device —
    the host k0 pass measured ~30 ms/image on a slow host (and 100s of ms
    for 16-bit images) and serialized ahead of the kernel dispatch.
    Cross-tile accumulation runs as 16-bit-split (hi, lo) int32 pairs so
    the per-image totals stay EXACT past int32 (the 16-bit depths need
    ~35 bits); the argmin compares the pairs lexicographically after
    carry normalization — identical result to the host int64 argmin."""
    from felics_tpu.ops.kscan_tiled import qctx_of as _qctx

    tiles = tiles.astype(jnp.int32)  # callers upload the narrow dtype
    nt, c, t = tiles.shape
    a_idx, b_idx = neighbour_indices(th, tw, xp=jnp)
    v1 = tiles[..., a_idx]
    v2 = tiles[..., b_idx]
    low = jnp.minimum(v1, v2)
    ctx = jnp.abs(v1 - v2)
    p = tiles
    first_two = jnp.arange(t) < 2
    below = (p < low) & ~first_two
    above = (p > low + ctx) & ~first_two
    oor = below | above
    residual = jnp.where(below, low - p, p - low - ctx) - 1
    qctx = _qctx(ctx)
    kv = jnp.asarray(cfg.k_values, jnp.int32)
    K = cfg.num_k
    # Two-level reduction, TPU-friendly: a dense one-hot-over-buckets sum
    # within each tile (pure VPU work — a pixel-granular scatter-add would
    # serialize on TPU), then a tiny nt-element segment-sum over tiles into
    # images. int32 is exact per the k0_device_exact gate.
    onehot = (qctx[..., None] == jnp.arange(nb, dtype=jnp.int32)).astype(
        jnp.int32
    )  # (nt, C, t, nb)
    per_tile = []
    for k in cfg.k_values:
        w = jnp.where(oor, (residual >> k) + 1 + int(k), 0)
        per_tile.append(jnp.einsum("nct,nctb->ncb", w, onehot))
    per_tile = jnp.stack(per_tile, axis=-1)  # (nt, C, nb, K), exact int32
    # Exact-past-int32 cross-tile accumulation: 16-bit split halves summed
    # separately, carry-normalized, compared lexicographically.
    lo_sum = jax.ops.segment_sum(
        per_tile & 0xFFFF, img_of_tile, num_segments=n_imgs
    )
    hi_sum = jax.ops.segment_sum(
        per_tile >> 16, img_of_tile, num_segments=n_imgs
    )
    hi = hi_sum + (lo_sum >> 16)  # (n_imgs, C, nb, K)
    lo = lo_sum & 0xFFFF
    m_hi = jnp.min(hi, axis=-1, keepdims=True)
    lo_sel = jnp.where(hi == m_hi, lo, jnp.int32(1 << 30))
    m_lo = jnp.min(lo_sel, axis=-1, keepdims=True)
    is_best = (hi == m_hi) & (lo == m_lo)  # total == min total
    # ties -> LARGEST k: last True along K (mirror of the reversed argmin
    # in compute_k0_batch).
    best = (K - 1) - jnp.argmax(is_best[..., ::-1], axis=-1)
    k0 = kv[best]  # (n_imgs, C, nb)
    prior_img = PRIOR_WEIGHT * jnp.abs(
        kv[None, None, None, :] - k0[..., None]
    )  # (n_imgs, C, nb, K)
    return k0, prior_img[img_of_tile]


def prior_from_k0(k0: Optional[np.ndarray], cfg: CodingConfig, c: int):
    """(C, nb, K) int32 k-table seed. None (v0 stream) -> zeros."""
    nb = num_buckets(cfg)
    kv = np.asarray(cfg.k_values, np.int32)
    if k0 is None:
        return np.zeros((c, nb, len(kv)), np.int32)
    k0 = np.minimum(np.asarray(k0, np.int32), kv[-1])
    return (PRIOR_WEIGHT * np.abs(kv[None, None, :] - k0[..., None])).astype(
        np.int32
    )


def pack_tiled_container(
    base_color: ColorType,
    base_depth: PixelDepth,
    w: int,
    h: int,
    tw: int,
    th: int,
    n_tiles: int,
    tile_bytes_np: np.ndarray,
    payload: bytes,
    k0: Optional[np.ndarray],
) -> bytes:
    """Assemble header (+ optional k-prior block) + length table + payload."""
    flags = 0
    prior_blob = b""
    if k0 is not None:
        flags |= FLAG_K_PRIOR
        nib = np.asarray(k0, np.uint8).reshape(-1)
        if nib.size % 2:
            nib = np.append(nib, np.uint8(0))
        prior_blob = ((nib[0::2] << 4) | nib[1::2]).astype(np.uint8).tobytes()
    if n_tiles == 0 or int(tile_bytes_np.max(initial=0)) < (1 << 16):
        flags |= FLAG_TABLE_U16
        table = tile_bytes_np.astype(">u2").tobytes()
    else:
        table = tile_bytes_np.astype(">u4").tobytes()
    header = _FIXED_HEADER.pack(
        MAGIC_TILED, int(base_color), int(base_depth), w, h, tw, th, flags,
        n_tiles,
    )
    return header + prior_blob + table + payload


def _clamped_tile_dims(h: int, w: int, tile: TileConfig) -> Tuple[int, int]:
    th = max(2, min(tile.tile_h, h))
    tw = max(2, min(tile.tile_w, w))
    return th, tw


def _pad_to_tiles(image: np.ndarray, th: int, tw: int) -> np.ndarray:
    h, w = image.shape[:2]
    ph = (-h) % th
    pw = (-w) % tw
    if ph or pw:
        pad = [(0, ph), (0, pw)] + [(0, 0)] * (image.ndim - 2)
        image = np.pad(image, pad, mode="edge")
    return image


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


def narrow_tile_dtype(depth_bits: int, c: int) -> np.dtype:
    """Smallest dtype that losslessly holds tile plane values (gray planes
    in [0, 2^d); YCoCg planes: Y in [0, 2^d), Co/Cg in (-2^d, 2^d)).
    Host<->device transfers ride slow links on tunneled platforms — moving
    gray8 tiles as uint8 instead of int32 measures 4x faster; the jitted
    consumers widen to int32 on device."""
    if depth_bits == 8:
        return np.dtype(np.uint8) if c == 1 else np.dtype(np.int16)
    return np.dtype(np.uint16) if c == 1 else np.dtype(np.int32)


@partial(jax.jit, static_argnames=("depth_bits", "out_dtype"))
def _narrow_bufs(bufs, depth_bits: int, out_dtype: str):
    """Clamp + narrow decoded tile planes for the device->host fetch, plus
    a per-tile out-of-bounds flag. A valid stream never produces values
    outside the plane bounds, but a corrupt one can — and the narrowing
    cast would wrap those into the valid range, so they are flagged here
    (and clamped) instead; callers raise InvalidValue for flagged tiles.
    bufs: (nt, C, T) int32."""
    bound = (1 << depth_bits) - 1
    lo = 0 if np.dtype(out_dtype).kind == "u" else -bound
    bad = jnp.any((bufs < lo) | (bufs > bound), axis=(1, 2))
    small = jnp.clip(bufs, lo, bound).astype(np.dtype(out_dtype))
    return small, bad


@partial(jax.jit, static_argnames=("th", "tw", "nb"))
def _tiled_stage1(tiles, th: int, tw: int, nb: int):
    """tiles: (n_tiles, C, T) int planes (any width — widened to int32 so
    callers can upload the narrow dtype). Returns analysis + rank/count
    info."""
    tiles = tiles.astype(jnp.int32)
    t = th * tw
    a_idx, b_idx = neighbour_indices(th, tw, xp=jnp)
    v1 = tiles[..., a_idx]
    v2 = tiles[..., b_idx]
    high = jnp.maximum(v1, v2)
    low = jnp.minimum(v1, v2)
    context = (high - low).astype(jnp.int32)

    pix = jnp.arange(t, dtype=jnp.int32)
    first_two = pix < 2
    p = tiles
    in_range = (p >= low) & (p <= high) & ~first_two
    below = (p < low) & ~first_two
    above = (p > high) & ~first_two
    oor = below | above
    residual = jnp.where(below, low - p - 1, jnp.where(above, p - high - 1, 0)).astype(
        jnp.int32
    )

    qctx = qctx_of(context)
    return (context, low, oor, residual, in_range, above, qctx)


@partial(jax.jit, static_argnames=("th", "tw", "cfg", "nb", "row_words"))
def _tiled_stage2(
    tiles, context, low, oor, residual, in_range, above, qctx, prior,
    th: int, tw: int, cfg: CodingConfig, nb: int, row_words: int = 0,
):
    """Symbols + per-tile/global offsets. ``prior``: (nt, C, nb, K) int32
    per-domain k-table seed (zeros = v0). Returns flat symbols, flat offsets,
    per-tile byte lengths, total payload bytes.

    ``row_words`` > 0: ROW layout — tile i's stream starts at the fixed bit
    offset i*row_words*32 instead of the compacted byte cumsum, so the
    offsets depend only on data local to each tile (no cross-tile cumsum;
    the shard-mapped XLA engine packs per-device rows with zero
    collectives). The per-tile bytes are identical either way."""
    tiles = tiles.astype(jnp.int32)  # callers upload the narrow dtype
    nt, c, t = tiles.shape
    k = kscan_tiled(
        qctx.reshape(nt * c, t),
        oor.reshape(nt * c, t),
        residual.reshape(nt * c, t),
        cfg,
        nb,
        prior.reshape(nt * c, nb, cfg.num_k),
    ).reshape(nt, c, t)

    # --- symbolize (same codeword layout as ops.analysis.symbolize) ---
    a_val = jnp.where(in_range, 1, jnp.where(above, 0b01, 0b00))
    a_len = jnp.where(in_range, 1, 2)
    phase_val, phase_len = phase_in_code(context + 1, tiles - low)
    v = residual
    q = jnp.where(oor, v >> k, 0)
    remainder = (v & ((1 << k) - 1)).astype(jnp.uint32)
    b_val = jnp.where(in_range, phase_val, remainder)
    b_len = jnp.where(in_range, phase_len, k + 1)

    pix = jnp.arange(t, dtype=jnp.int32)
    is0 = pix == 0
    is1 = pix == 1
    # Depth-sized raw preamble: plane 0 (gray/Y) is unsigned depth bits;
    # planes 1-2 (Co/Cg) are signed, stored as depth+1-bit two's complement.
    pre_w = (
        cfg.depth_bits
        + (jnp.arange(c, dtype=jnp.int32) > 0).astype(jnp.int32)
    )[None, :, None]
    pre_mask = ((jnp.uint32(1) << pre_w) - 1).astype(jnp.uint32)
    p0 = tiles[..., 0:1].astype(jnp.uint32) & pre_mask
    p1 = tiles[..., 1:2].astype(jnp.uint32) & pre_mask
    a_val = jnp.where(is0, p0, jnp.where(is1, 0, a_val)).astype(jnp.uint32)
    a_len = jnp.where(is0, pre_w, jnp.where(is1, 0, a_len)).astype(jnp.int32)
    q = jnp.where(is0 | is1, 0, q).astype(jnp.int32)
    b_val = jnp.where(is0, p1, jnp.where(is1, 0, b_val)).astype(jnp.uint32)
    b_len = jnp.where(is0, pre_w, jnp.where(is1, 0, b_len)).astype(jnp.int32)

    # --- offsets: per-tile bit cumsum, byte-aligned tile starts ---
    lens = (a_len + q + b_len).reshape(nt, c * t)
    ends = jnp.cumsum(lens, axis=1, dtype=jnp.int32)
    tile_bits = ends[:, -1]
    tile_bytes = (tile_bits + 7) >> 3
    if row_words:
        tile_starts = jnp.arange(nt, dtype=jnp.int32) * (row_words * 4)
    else:
        tile_starts = jnp.cumsum(tile_bytes) - tile_bytes  # exclusive, bytes
    within = ends - lens
    offsets = (tile_starts[:, None] << 3) + within
    total_bytes = tile_starts[-1] + tile_bytes[-1]

    from felics_tpu.ops.analysis import Symbols

    flat = Symbols(
        a_val=a_val.reshape(-1),
        a_len=a_len.reshape(-1),
        q=q.reshape(-1),
        b_val=b_val.reshape(-1),
        b_len=b_len.reshape(-1),
    )
    return flat, offsets.reshape(-1), tile_bytes, total_bytes


def _prepare_tiles(image: np.ndarray, color: ColorType, th: int, tw: int):
    padded = _pad_to_tiles(np.asarray(image), th, tw)
    hp, wp = padded.shape[:2]
    ty, tx = hp // th, wp // tw
    if color == ColorType.GRAY:
        chans = padded.astype(np.int32)[None]  # (1, Hp, Wp)
    else:
        flat = padded.astype(np.int32).reshape(-1, 3)
        y, co, cg = rgb_to_ycocg(flat[:, 0], flat[:, 1], flat[:, 2])
        chans = np.stack([y, co, cg]).reshape(3, hp, wp)
    c = chans.shape[0]
    # (C, ty, th, tx, tw) -> (ty, tx, C, th*tw)
    tiles = (
        chans.reshape(c, ty, th, tx, tw)
        .transpose(1, 3, 0, 2, 4)
        .reshape(ty * tx, c, th * tw)
    )
    return tiles, ty, tx


def _columns_to_payload(words_lw: np.ndarray, lens_bytes: np.ndarray) -> bytes:
    """Compact per-tile big-endian word rows into the concatenated payload."""
    L, W = words_lw.shape
    rows = np.ascontiguousarray(words_lw.astype(">u4")).view(np.uint8)
    rows = rows.reshape(L, W * 4)
    mask = np.arange(W * 4, dtype=np.int64)[None, :] < lens_bytes[:, None]
    return rows[mask].tobytes()


def _bucket_bytes(n: int) -> int:
    """Round a byte count up to a coarse bucket (bounds jit recompiles)."""
    n = max(1 << 12, int(n))
    gran = 1 << max(10, n.bit_length() - 3)
    return -(-n // gran) * gran


_payload_hints: dict = {}  # (t, c, depth) -> observed MEAN payload bytes/tile


def payload_cap_hint(cfg: CodingConfig, nt: int, t: int, c: int) -> int:
    """Self-tuned capacity (bytes) for the on-device compacted payload.

    Starts at the raw plane size + per-tile preamble slack (FELICS almost
    always compresses, so this rarely overflows); shrinks toward ~1.2x the
    largest MEAN per-tile payload observed for this (t, c, depth) — the
    mean, not the max: the fetch cost is nt * cap, and a max-based cap
    over-fetched 60%+ on real batches. Overflow is detected exactly (the
    true total rides the same fetch) and retried at the exact bucketed
    size, so a stale hint costs one extra round trip, never correctness."""
    key = (t, c, cfg.pixel_depth)
    raw = c * t * cfg.depth_bits // 8 + 32
    hint = _payload_hints.get(key)
    per_tile = raw if hint is None else min(raw, hint + hint // 5 + 64)
    return _bucket_bytes(nt * per_tile)


def observe_payload(cfg: CodingConfig, t: int, c: int, mean_tile_bytes: int):
    key = (t, c, cfg.pixel_depth)
    _payload_hints[key] = max(
        _payload_hints.get(key, 0), int(mean_tile_bytes) + 1
    )


@partial(jax.jit, static_argnames=("cap",))
def _compact_payload_jit(words, bits, cap: int):
    """Compact per-tile big-endian word rows into the concatenated payload
    ON DEVICE, so the host fetches ~compressed-size bytes instead of the
    full padded (L, W) word matrix (measured 9.4 MB -> 2.0 MB per 12-image
    batch on the tunneled platform, the single largest container-path cost).

    Word-granular 1D gathers only (the bitpack.py lesson: byte-granular or
    2D gathers serialize on TPU). Every output 32-bit word merges two
    adjacent source words of its tile plus, when a byte-aligned tile
    boundary falls inside it, the head of the next tile's stream. VALID
    ONLY when every tile's payload is >= 8 bytes (else >2 tiles could share
    an output word) — callers check the fetched lengths and fall back to
    host compaction otherwise; any real tile stream is far larger.

    words: (L, W) uint32 big-endian rows; bits: (L,) int32 true bit counts.
    Returns (payload (cap,) uint8, tile_bytes (L,) int32, total int32).
    Bytes past ``total`` are zero; if total > cap the payload is truncated
    and the caller must retry with a bigger cap."""
    from felics_tpu.ops.bitpack import _ONES, _shl, _shr

    assert cap % 4 == 0
    L, W = words.shape
    flat = words.reshape(L * W)
    tile_bytes = (bits + 7) // 8
    starts = jnp.cumsum(tile_bytes) - tile_bytes
    total = starts[-1] + tile_bytes[-1]
    pos = jnp.arange(cap // 4, dtype=jnp.int32) * 4  # output word byte pos
    tile = jnp.clip(jnp.searchsorted(starts, pos, side="right") - 1, 0, L - 1)
    st = starts[tile]
    j = pos - st  # byte offset within the tile's row, >= 0
    base = tile * W + (j >> 2)
    sh = ((j & 3) * 8).astype(jnp.uint32)
    w0 = flat[jnp.clip(base, 0, L * W - 1)]
    w1 = flat[jnp.clip(base + 1, 0, L * W - 1)]
    cur = _shl(w0, sh) | _shr(w1, 32 - sh)  # sh==0: _shr(x,32) is 0
    # Zero bytes past this tile's end (w1 may even be the next ROW's word 0
    # when j straddles the row edge — masked off the same way) ...
    valid = jnp.clip(st + tile_bytes[tile] - pos, 0, 4)
    cur &= ~_shr(_ONES, valid * 8)
    # ... then OR in the next tile's first bytes where its start falls
    # inside this word (cross <= 3: a start <= pos would have been `tile`).
    t2 = jnp.clip(tile + 1, 0, L - 1)
    cross = jnp.clip(pos + 4 - starts[t2], 0, 4)
    head = _shr(flat[t2 * W], 32 - cross * 8)
    cur |= jnp.where((t2 > tile) & (cross > 0), head, jnp.uint32(0))
    cur = jnp.where(pos < total, cur, jnp.uint32(0))
    out = jnp.stack(
        [cur >> 24, cur >> 16, cur >> 8, cur], axis=1
    ).astype(jnp.uint8)
    return out.reshape(-1), tile_bytes, total


@partial(jax.jit, static_argnames=("cap",))
def _compact_payload_aligned_jit(words, bits, cap: int):
    """WORD-ALIGNED device payload compaction: each tile's stream starts on
    a 4-byte boundary (≤3 pad bytes per tile, stripped on the host by
    ``_strip_word_alignment``), so every output word is ONE source word —
    no per-word searchsorted and no cross-tile byte merges. The byte-exact
    variant (``_compact_payload_jit``) slope-measured 92 ms on a 2048-tile
    rgb8 batch (vs 5.6 ms for the encode kernel it followed!); this form is
    one scatter + one cumsum + two gathers. Fetch grows by ≤3 B/tile.

    Returns (payload (cap,) uint8, tile_bytes (L,) int32, padded total
    bytes int32). Callers must check padded-total <= cap and retry bigger
    otherwise (same contract as the exact variant)."""
    assert cap % 4 == 0
    L, W = words.shape
    flat = words.reshape(L * W)
    tile_bytes = (bits + 7) // 8
    wlen = (tile_bytes + 3) // 4  # words per tile, aligned
    wst = jnp.cumsum(wlen) - wlen  # word-aligned start of each tile
    total_words = wst[-1] + wlen[-1]
    nwords = cap // 4
    # tile id per output word via scatter + cumsum: cnt[i] = #tiles with
    # wst <= i (zero-length tiles double-scatter harmlessly — the LAST
    # tile starting at a word wins, and empty tiles emit nothing).
    cnt = jnp.zeros((nwords,), jnp.int32).at[wst].add(1, mode="drop")
    tile = jnp.clip(jnp.cumsum(cnt) - 1, 0, L - 1)
    i = jnp.arange(nwords, dtype=jnp.int32)
    src = tile * W + (i - wst[tile])
    cur = flat[jnp.clip(src, 0, L * W - 1)]
    cur = jnp.where(i < total_words, cur, jnp.uint32(0))
    out = jnp.stack(
        [cur >> 24, cur >> 16, cur >> 8, cur], axis=1
    ).astype(jnp.uint8)
    return out.reshape(-1), tile_bytes, total_words * 4


def _strip_word_alignment(pay_np: np.ndarray, tile_bytes: np.ndarray) -> bytes:
    """Drop the ≤3 inter-tile pad bytes of an aligned device compaction,
    yielding the exact concatenated payload (host-side, O(total) numpy)."""
    tb = np.asarray(tile_bytes, np.int64)
    padded = ((tb + 3) // 4) * 4
    pads = padded - tb
    n_pads = int(pads.sum())
    if n_pads == 0:
        return pay_np.tobytes()
    ends = np.cumsum(padded)
    # Flat indices of every pad byte: per tile, [end-pad, end).
    base = np.repeat(ends - pads, pads)
    off = np.arange(n_pads) - np.repeat(np.cumsum(pads) - pads, pads)
    keep = np.ones(int(ends[-1]), bool)
    keep[base + off] = False
    return pay_np[: int(ends[-1])][keep].tobytes()


@partial(jax.jit, static_argnames=("wd",))
def _expand_columns_jit(payload_u8, starts, lens, wd: int):
    """Inverse of _compact_payload_jit: concatenated payload bytes back into
    (L, wd) uint32 big-endian word rows ON DEVICE (the host uploads the
    ~compressed-size byte stream instead of a padded word matrix).
    Word-granular 1D gathers; rows are zero past each tile's byte length.

    payload_u8: (P,) uint8, P a multiple of 4 (bucket-padded); starts/lens:
    (L,) int32 byte offsets/lengths per tile."""
    from felics_tpu.ops.bitpack import _ONES, _shl, _shr

    P = payload_u8.shape[0]
    b = payload_u8.reshape(P // 4, 4).astype(jnp.uint32)
    pw = (b[:, 0] << 24) | (b[:, 1] << 16) | (b[:, 2] << 8) | b[:, 3]
    off = (jnp.arange(wd, dtype=jnp.int32) * 4)[None, :]
    bytepos = starts[:, None] + off  # (L, wd)
    wi = bytepos >> 2
    sh = ((bytepos & 3) * 8).astype(jnp.uint32)
    w0 = pw[jnp.clip(wi, 0, P // 4 - 1)]
    w1 = pw[jnp.clip(wi + 1, 0, P // 4 - 1)]
    cur = _shl(w0, sh) | _shr(w1, 32 - sh)
    valid = jnp.clip(lens[:, None] - off, 0, 4)
    return cur & ~_shr(_ONES, valid * 8)


# ---------------------------------------------------------------------------
# Fused single-dispatch container chains. The dev tunnel does NOT pipeline
# dispatches (each costs ~12-25 ms wall, docs/DESIGN.md §7), so the serving
# path fuses its whole device chain into ONE jitted call each way:
#   encode:  k0/prior -> fused Pallas encode -> payload compaction
#   decode:  column expansion -> fused Pallas decode -> clamp/narrow
# leaving exactly upload + dispatch + fetch per direction.
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("th", "tw", "cfg", "nb", "n_imgs", "W", "cap",
                     "interpret"),
)
def _fused_encode_chain(
    tiles, img_of_tile, th: int, tw: int, cfg: CodingConfig, nb: int,
    n_imgs: int, W: int, cap: int, interpret: bool,
):
    """tiles: (nt, C, T) narrow-dtype array. Returns (payload (cap,) uint8,
    bits (nt,) int32, k0 (n_imgs, C, nb) int32, total int32)."""
    from felics_tpu.ops import pallas_codec as pc

    nt, c, t = tiles.shape
    k0, prior = compute_k0_prior_jax(
        tiles, img_of_tile, th, tw, cfg, nb, n_imgs
    )
    meta = [jnp.asarray(m) for m in pc._meta_arrays(th, tw, c, cfg.depth_bits)]
    words, bits = pc._encode_tiles_pallas(
        tiles.reshape(nt, c * t), *meta, prior, th, tw, c, W, cfg, interpret
    )
    payload, _tb, total = _compact_payload_aligned_jit(words, bits, cap)
    return payload, bits, k0, total


@partial(
    jax.jit,
    static_argnames=("th", "tw", "cfg", "W", "cap", "interpret"),
)
def _fused_encode_chain_prior(
    tiles, prior, th: int, tw: int, cfg: CodingConfig, W: int, cap: int,
    interpret: bool,
):
    """_fused_encode_chain with a precomputed k-table prior instead of the
    on-device k0 pass — the 16-bit route, whose per-image Rice-length sums
    can overflow int32 on device and are computed exactly on the host
    (compute_k0_batch, int64). tiles: (nt, C, T) narrow dtype; prior:
    (nt, C, nb, K) or (C, nb, K) int32. Returns (payload (cap,) uint8,
    bits (nt,) int32, total int32)."""
    from felics_tpu.ops import pallas_codec as pc

    nt, c, t = tiles.shape
    meta = [jnp.asarray(m) for m in pc._meta_arrays(th, tw, c, cfg.depth_bits)]
    words, bits = pc._encode_tiles_pallas(
        tiles.reshape(nt, c * t), *meta, prior, th, tw, c, W, cfg, interpret
    )
    payload, _tb, total = _compact_payload_aligned_jit(words, bits, cap)
    return payload, bits, total


def _host_async(arrs) -> None:
    """Start device->host copies for already-dispatched results so the wire
    transfer overlaps whatever the host does next (pipelined serving)."""
    for a in arrs:
        try:
            a.copy_to_host_async()
        except Exception:
            pass  # older jax / non-Array results: the later fetch still works


def encode_container_dispatch(
    tiles_host, tile_group, th: int, tw: int, cfg: CodingConfig, nb: int,
    n_imgs: int, engine: str, prior_np=None, k0s_host=None,
):
    """Async half of the single-dispatch container encode: uploads the tile
    batch, dispatches the fused chain (k0 + prior + Pallas encode + payload
    compaction) and starts the device->host result copies WITHOUT blocking.
    Returns an opaque pending dict for ``encode_container_finish`` or None
    when the fast path is unavailable (non-pallas engine, VMEM-infeasible,
    prior Mosaic failure).

    ``prior_np``/``k0s_host``: precomputed prior ((nt, C, nb, K) or
    (C, nb, K)) + its (n_imgs, C, nb) k0 — the 16-bit route where the k0
    sums need host int64; the chain then skips the on-device k0 pass."""
    from felics_tpu.ops import pallas_codec as pc

    nt, c, t = tiles_host.shape
    if nt == 0 or _resolve_engine(engine) != "pallas":
        return None
    enc_key = (th, tw, c, cfg.pixel_depth)
    if not (_pallas_usable("encode", enc_key)
            and _pallas_usable("onepass-encode", enc_key)):
        return None
    wcap = pc.encode_width_bound(cfg, t, c)
    if nt * wcap * 4 >= (1 << 31):
        return None  # int32 offsets in the compactor
    interpret = not pc.on_tpu()
    tiles_dev = jnp.asarray(tiles_host)
    wtry = pc.width_hint(cfg, t, c)
    if not pc.kernel_plan(cfg, th, tw, c, wtry):
        return None
    cap = payload_cap_hint(cfg, nt, t, c)
    if prior_np is None:
        tg = jnp.asarray(np.asarray(tile_group, np.int32))
        k0 = None

        def redo(W, cp):
            return _fused_encode_chain(
                tiles_dev, tg, th, tw, cfg, nb, n_imgs, W, cp, interpret
            )
    else:
        prior_dev = jnp.asarray(prior_np, jnp.int32)
        k0 = np.asarray(k0s_host)

        def redo(W, cp):
            pay_, bits_, total_ = _fused_encode_chain_prior(
                tiles_dev, prior_dev, th, tw, cfg, W, cp, interpret
            )
            return pay_, bits_, None, total_  # k0 stays host-side

    return _start_encode_pending(
        redo, k0, wtry, cap, wcap, th, tw, cfg, nt, c, t, engine, enc_key
    )


def _start_encode_pending(
    redo, k0_host, wtry, cap, wcap, th, tw, cfg, nt, c, t, engine, enc_key
):
    """Run the first fused dispatch, start the async result copies, and
    package the pending dict shared by every encode-dispatch variant.
    ``redo(W, cap)`` re-dispatches at new sizing and returns
    (pay, bits, k0-or-placeholder, total); ``k0_host`` non-None means the
    k0 values live on the host already."""
    try:
        pay, bits, k0_dev, total = redo(wtry, cap)
    except Exception as e:
        if engine == "pallas":
            raise
        # The fused chain also contains plain-XLA stages (k0/prior, image
        # prep, compaction) — a failure here must not condemn the Pallas
        # kernels themselves. Disable only the fused chain; the caller's
        # split path retries Pallas standalone and disables the (op, key)
        # there if the kernel truly fails.
        _disable_pallas("onepass-encode", enc_key, e)
        return None
    _host_async((pay, bits, total) if k0_host is not None
                else (pay, bits, k0_dev, total))
    return {
        "redo": redo, "k0_host": k0_host,
        "pay": pay, "bits": bits, "k0": k0_dev, "total": total,
        "wtry": wtry, "cap": cap, "wcap": wcap,
        "th": th, "tw": tw, "cfg": cfg,
        "engine": engine, "enc_key": enc_key,
        "nt": nt, "c": c, "t": t,
    }


@partial(
    jax.jit,
    static_argnames=("th", "tw", "cfg", "nb", "n_imgs", "W", "cap",
                     "interpret", "rgb"),
)
def _fused_encode_chain_images(
    imgs, th: int, tw: int, cfg: CodingConfig, nb: int, n_imgs: int,
    W: int, cap: int, interpret: bool, rgb: bool,
):
    """Raw same-shape image batch -> container payload in ONE dispatch:
    device-side edge-pad + YCoCg + tile reshape (_image_tiles_device), then
    the full fused chain. Upload is the images' own narrow dtype (rgb8:
    3 B/px instead of 6 as int16 planes)."""
    tiles = _image_tiles_device(imgs, th, tw, rgb)
    nt = tiles.shape[0]
    img_of_tile = jnp.repeat(
        jnp.arange(n_imgs, dtype=jnp.int32), nt // n_imgs
    )
    return _fused_encode_chain(
        tiles, img_of_tile, th, tw, cfg, nb, n_imgs, W, cap, interpret
    )


def encode_images_dispatch(
    imgs_np: np.ndarray, th: int, tw: int, cfg: CodingConfig, nb: int,
    engine: str,
):
    """Async fused encode of a SAME-SHAPE image batch from raw pixels:
    upload (N, H, W[, 3]) in the images' own dtype; YCoCg + tiling + k0 +
    encode + compaction all on device. Returns a pending dict for
    ``encode_container_finish`` or None (fast path unavailable — caller
    uses the host-prep path)."""
    from felics_tpu.ops import pallas_codec as pc

    n_imgs = imgs_np.shape[0]
    h, w = imgs_np.shape[1], imgs_np.shape[2]
    rgb = imgs_np.ndim == 4
    c = 3 if rgb else 1
    t = th * tw
    ty, tx = -(-h // th), -(-w // tw)
    nt = n_imgs * ty * tx
    if nt == 0 or h < th or w < tw or _resolve_engine(engine) != "pallas":
        return None
    if not k0_device_exact(cfg, t, ty * tx):
        return None  # pathological shape: k0 sums not provably exact on device
    enc_key = (th, tw, c, cfg.pixel_depth)
    if not (_pallas_usable("encode", enc_key)
            and _pallas_usable("onepass-encode", enc_key)):
        return None
    wcap = pc.encode_width_bound(cfg, t, c)
    if nt * wcap * 4 >= (1 << 31):
        return None
    interpret = not pc.on_tpu()
    wtry = pc.width_hint(cfg, t, c)
    if not pc.kernel_plan(cfg, th, tw, c, wtry):
        return None
    cap = payload_cap_hint(cfg, nt, t, c)
    imgs_dev = jnp.asarray(np.ascontiguousarray(imgs_np))

    def redo(W, cp):
        return _fused_encode_chain_images(
            imgs_dev, th, tw, cfg, nb, n_imgs, W, cp, interpret, rgb
        )

    return _start_encode_pending(
        redo, None, wtry, cap, wcap, th, tw, cfg, nt, c, t, engine, enc_key
    )


def encode_container_finish(p):
    """Blocking half: fetches the pending fused-encode results, handling
    stream-width / payload-cap overflows with synchronous re-dispatches.
    Returns (tile_bytes int64, payload bytes, k0s (n_imgs, C, nb) int32)
    or None (caller falls back to the split encode_tiles_payload path)."""
    from felics_tpu.ops import pallas_codec as pc

    cfg, nt, c, t = p["cfg"], p["nt"], p["c"], p["t"]
    engine, enc_key = p["engine"], p["enc_key"]
    wtry, cap = p["wtry"], p["cap"]
    pay, bits, k0, total = p["pay"], p["bits"], p["k0"], p["total"]
    host_prior = p["k0_host"] is not None
    # Attempt bound: at most one W escalation + 3 cap retries per W.
    for _attempt in range(8):
        try:
            if host_prior:
                bits_np, pay_np, total_i = jax.device_get((bits, pay, total))
                k0_np = p["k0_host"]
            else:
                bits_np, k0_np, pay_np, total_i = jax.device_get(
                    (bits, k0, pay, total)
                )
        except Exception as e:
            if engine == "pallas":
                raise
            _disable_pallas("onepass-encode", enc_key, e)
            return None
        bits_np = np.asarray(bits_np).astype(np.int64)
        if int(bits_np.max()) > wtry * 32:
            if wtry >= p["wcap"]:
                return None  # pathological stream beyond the static bound
            wtry = p["wcap"]  # W overflow: retry at the pessimistic bound
            if not pc.kernel_plan(cfg, p["th"], p["tw"], c, wtry):
                return None
        elif int(bits_np.min()) < 64:
            return None  # toy tiles: _compact precondition fails
        elif int(total_i) <= cap:
            pc.observe_width(cfg, t, c, int(bits_np.max()))
            tb = ((bits_np + 7) // 8).astype(np.int64)
            observe_payload(cfg, t, c, int(tb.sum()) // nt)
            # total_i is the WORD-ALIGNED device compaction total; the ≤3
            # pad bytes per tile are stripped here (host, O(total) numpy).
            return tb, _strip_word_alignment(pay_np, tb), np.asarray(k0_np)
        else:
            cap = _bucket_bytes(int(total_i))  # cap overflow: exact retry
        try:
            pay, bits, k0, total = p["redo"](wtry, cap)
        except Exception as e:
            if engine == "pallas":
                raise
            _disable_pallas("onepass-encode", enc_key, e)
            return None
    return None


def encode_container_onepass(
    tiles_host, tile_group, th: int, tw: int, cfg: CodingConfig, nb: int,
    n_imgs: int, engine: str,
):
    """Single-dispatch device container encode (k0 + prior + Pallas encode +
    payload compaction fused). Returns (tile_bytes int64, payload bytes,
    k0s (n_imgs, C, nb) int32) or None when the fast path is unavailable
    (non-pallas engine, VMEM-infeasible, Mosaic failure, toy tiles) — the
    caller then uses the split encode_tiles_payload path."""
    p = encode_container_dispatch(
        tiles_host, tile_group, th, tw, cfg, nb, n_imgs, engine
    )
    if p is None:
        return None
    return encode_container_finish(p)


@partial(
    jax.jit,
    static_argnames=("th", "tw", "c", "cfg", "wd", "out_dtype", "interpret"),
)
def _fused_decode_chain(
    payload_u8, starts, lens, prior, th: int, tw: int, c: int,
    cfg: CodingConfig, wd: int, out_dtype: str, interpret: bool,
):
    """payload_u8: (P,) uint8 bucket-padded concatenated tile streams.
    Returns (tiles (nt, C, T) narrowed, bad (nt,) bool out-of-depth flags)."""
    from felics_tpu.ops import pallas_codec as pc

    cols = _expand_columns_jit(payload_u8, starts, lens, wd)
    meta = [jnp.asarray(m) for m in pc._meta_arrays(th, tw, c, cfg.depth_bits)]
    bufs = pc._decode_tiles_pallas(
        cols, *meta[:2], prior, th, tw, c, cfg, interpret
    )
    nt = starts.shape[0]
    bufs = bufs.reshape(nt, c, th * tw)
    return _narrow_bufs(bufs, cfg.depth_bits, out_dtype)


def decode_container_dispatch(
    payload: bytes, lens: np.ndarray, th: int, tw: int, c: int,
    cfg: CodingConfig, prior_np: np.ndarray, tile_group, engine: str,
):
    """Async half of the single-dispatch container decode: uploads the
    payload, dispatches the fused chain (column expansion + Pallas decode +
    clamp/narrow) and starts the result copies without blocking. Returns a
    pending dict for ``decode_container_finish`` or None."""
    from felics_tpu.ops import pallas_codec as pc

    lens = np.asarray(lens, np.int64)
    nt = lens.shape[0]
    if nt == 0 or _resolve_engine(engine) != "pallas":
        return None
    expected = int(lens.sum())
    if expected >= (1 << 31):
        return None
    wd = pc.bucket_words(int(-(-lens.max(initial=1) // 4)))
    dec_key = (th, tw, c, cfg.pixel_depth, wd)
    if not (_pallas_usable("decode", dec_key)
            and _pallas_usable("onepass-decode", dec_key)
            and pc.decode_fits(c * th * tw, wd, c, cfg)):
        return None
    starts_b = np.concatenate([[0], np.cumsum(lens)[:-1]])
    if tile_group is None or prior_np.shape[0] == 1:
        pr = prior_np[0]
    else:
        pr = prior_np[np.asarray(tile_group)]
    pad = _bucket_bytes(expected)
    buf = np.frombuffer(payload[:expected].ljust(pad, b"\0"), dtype=np.uint8)
    nd = narrow_tile_dtype(cfg.depth_bits, c)
    try:
        small, bad = _fused_decode_chain(
            jnp.asarray(buf),
            jnp.asarray(starts_b, jnp.int32),
            jnp.asarray(lens, jnp.int32),
            jnp.asarray(pr),
            th, tw, c, cfg, wd, nd.name, not pc.on_tpu(),
        )
    except Exception as e:
        if engine == "pallas":
            raise
        # Disable only the fused chain (it contains XLA stages too); the
        # split path retries the Pallas kernel standalone.
        _disable_pallas("onepass-decode", dec_key, e)
        return None
    _host_async((small, bad))
    return {
        "small": small, "bad": bad, "engine": engine, "dec_key": dec_key,
    }


def decode_container_finish(p):
    """Blocking half: fetch the narrowed tile planes. Returns
    (tiles_np (nt, C, T) int32, bad_np (nt,) bool) or None."""
    try:
        small_np, bad_np = jax.device_get((p["small"], p["bad"]))
    except Exception as e:
        if p["engine"] == "pallas":
            raise
        _disable_pallas("onepass-decode", p["dec_key"], e)
        return None
    return np.asarray(small_np).astype(np.int32), np.asarray(bad_np)


@partial(
    jax.jit,
    static_argnames=("th", "tw", "c", "cfg", "wd", "n_imgs", "ty", "tx",
                     "h", "w", "depth_max", "interpret"),
)
def _fused_decode_images_chain(
    payload_u8, starts, lens, prior, th: int, tw: int, c: int,
    cfg: CodingConfig, wd: int, n_imgs: int, ty: int, tx: int, h: int,
    w: int, depth_max: int, interpret: bool,
):
    """Same-shape batch: expand + Pallas decode + BATCHED device assembly
    (vmapped crop/inverse-YCoCg) in one dispatch. The fetch is the final
    (N, H, W[, 3]) images in their real dtype — for rgb8 that is half the
    wire of fetching int16 Y/Co/Cg planes, and the host does no assembly
    work at all. Returns (images, per-image validity flags).

    Validity matches the split path's plane-level check (_narrow_bufs):
    RAW decoded plane values outside the per-plane bounds flag the image
    even when they land in tile padding or happen to inverse-transform
    back into range — a corrupt container must not be accepted on one
    internal path and rejected on another."""
    from felics_tpu.ops import pallas_codec as pc

    cols = _expand_columns_jit(payload_u8, starts, lens, wd)
    meta = [jnp.asarray(m) for m in pc._meta_arrays(th, tw, c, cfg.depth_bits)]
    bufs = pc._decode_tiles_pallas(
        cols, *meta[:2], prior, th, tw, c, cfg, interpret
    )
    bufs = bufs.reshape(n_imgs, ty * tx, c, th * tw)
    bound = (1 << cfg.depth_bits) - 1
    lo = 0 if c == 1 else -bound
    planes_ok = jnp.all(
        (bufs >= lo) & (bufs <= bound), axis=(1, 2, 3)
    )  # (n_imgs,)
    out, valid = jax.vmap(
        lambda b: _assemble_image_body(b, th, tw, c, ty, tx, h, w, depth_max)
    )(bufs)
    return out, valid & planes_ok


def decode_images_dispatch(
    payload: bytes, lens: np.ndarray, th: int, tw: int, c: int,
    cfg: CodingConfig, prior_np: np.ndarray, tile_group, n_imgs: int,
    h: int, w: int, engine: str,
):
    """Async fused decode of a SAME-SHAPE container batch straight to
    assembled images on device. Returns a pending dict for
    ``decode_images_finish`` or None."""
    from felics_tpu.ops import pallas_codec as pc

    lens = np.asarray(lens, np.int64)
    nt = lens.shape[0]
    if nt == 0 or h < th or w < tw or _resolve_engine(engine) != "pallas":
        return None
    expected = int(lens.sum())
    if expected >= (1 << 31):
        return None
    ty, tx = -(-h // th), -(-w // tw)
    wd = pc.bucket_words(int(-(-lens.max(initial=1) // 4)))
    dec_key = (th, tw, c, cfg.pixel_depth, wd)
    if not (_pallas_usable("decode", dec_key)
            and _pallas_usable("onepass-decode", dec_key)
            and pc.decode_fits(c * th * tw, wd, c, cfg)):
        return None
    starts_b = np.concatenate([[0], np.cumsum(lens)[:-1]])
    if tile_group is None or prior_np.shape[0] == 1:
        pr = prior_np[0]
    else:
        pr = prior_np[np.asarray(tile_group)]
    pad = _bucket_bytes(expected)
    buf = np.frombuffer(payload[:expected].ljust(pad, b"\0"), dtype=np.uint8)
    depth_max = (1 << cfg.depth_bits) - 1
    try:
        out, valid = _fused_decode_images_chain(
            jnp.asarray(buf),
            jnp.asarray(starts_b, jnp.int32),
            jnp.asarray(lens, jnp.int32),
            jnp.asarray(pr),
            th, tw, c, cfg, wd, n_imgs, ty, tx, h, w, depth_max,
            not pc.on_tpu(),
        )
    except Exception as e:
        if engine == "pallas":
            raise
        _disable_pallas("onepass-decode", dec_key, e)
        return None
    _host_async((out, valid))
    return {"out": out, "valid": valid, "engine": engine, "dec_key": dec_key}


def decode_images_finish(p):
    """Blocking half of decode_images_dispatch: returns
    (images (N, H, W[, 3]) np in real dtype, valid (N,) bool) or None."""
    try:
        out_np, valid_np = jax.device_get((p["out"], p["valid"]))
    except Exception as e:
        if p["engine"] == "pallas":
            raise
        _disable_pallas("onepass-decode", p["dec_key"], e)
        return None
    return np.asarray(out_np), np.asarray(valid_np)


def decode_container_onepass(
    payload: bytes, lens: np.ndarray, th: int, tw: int, c: int,
    cfg: CodingConfig, prior_np: np.ndarray, tile_group, engine: str,
):
    """Single-dispatch device container decode (column expansion + Pallas
    decode + clamp/narrow fused); ONE fetch of the narrowed tile planes.
    Returns (tiles_np (nt, C, T) int32, bad_np (nt,) bool) or None when the
    fast path is unavailable (callers use decode_tiles_bufs)."""
    p = decode_container_dispatch(
        payload, lens, th, tw, c, cfg, prior_np, tile_group, engine
    )
    if p is None:
        return None
    return decode_container_finish(p)


@partial(
    jax.jit,
    static_argnames=("th", "tw", "c", "cfg", "wd", "ty", "tx", "h", "w",
                     "depth_max", "interpret"),
)
def _fused_decode_image_chain(
    payload_u8, starts, lens, prior, th: int, tw: int, c: int,
    cfg: CodingConfig, wd: int, ty: int, tx: int, h: int, w: int,
    depth_max: int, interpret: bool,
):
    """Per-image chain: expand + Pallas decode + tile assembly/inverse
    color transform, fused into one dispatch. Returns (image, valid)."""
    from felics_tpu.ops import pallas_codec as pc

    cols = _expand_columns_jit(payload_u8, starts, lens, wd)
    meta = [jnp.asarray(m) for m in pc._meta_arrays(th, tw, c, cfg.depth_bits)]
    bufs = pc._decode_tiles_pallas(
        cols, *meta[:2], prior, th, tw, c, cfg, interpret
    )
    bufs = bufs.reshape(starts.shape[0], c, th * tw)
    return _assemble_image(bufs, th, tw, c, ty, tx, h, w, depth_max)


def decode_image_onepass(
    payload: bytes, lens: np.ndarray, th: int, tw: int, c: int,
    cfg: CodingConfig, prior_np: np.ndarray, ty: int, tx: int, h: int,
    w: int, depth_max: int, engine: str,
):
    """Single-dispatch per-image decode (expand + decode + assemble fused);
    ONE fetch of (image, valid). Returns np image or None (fast path
    unavailable; callers use the split decode_tiles_bufs path). Raises
    InvalidValue for out-of-depth decoded values like the split path."""
    from felics_tpu.ops import pallas_codec as pc

    lens = np.asarray(lens, np.int64)
    nt = lens.shape[0]
    if nt == 0 or _resolve_engine(engine) != "pallas":
        return None
    expected = int(lens.sum())
    if expected >= (1 << 31):
        return None
    wd = pc.bucket_words(int(-(-lens.max(initial=1) // 4)))
    dec_key = (th, tw, c, cfg.pixel_depth, wd)
    if not (_pallas_usable("decode", dec_key)
            and _pallas_usable("onepass-decode", dec_key)
            and pc.decode_fits(c * th * tw, wd, c, cfg)):
        return None
    starts_b = np.concatenate([[0], np.cumsum(lens)[:-1]])
    pad = _bucket_bytes(expected)
    buf = np.frombuffer(payload[:expected].ljust(pad, b"\0"), dtype=np.uint8)
    try:
        out, valid = _fused_decode_image_chain(
            jnp.asarray(buf),
            jnp.asarray(starts_b, jnp.int32),
            jnp.asarray(lens, jnp.int32),
            jnp.asarray(prior_np[0]),
            th, tw, c, cfg, wd, ty, tx, h, w, depth_max, not pc.on_tpu(),
        )
        out_np, valid_np = jax.device_get((out, valid))
    except Exception as e:
        if engine == "pallas":
            raise
        # Fused-chain failure: fall back to the split path without
        # condemning the Pallas decode kernel itself (see onepass-encode).
        _disable_pallas("onepass-decode", dec_key, e)
        return None
    if not bool(valid_np):
        raise errors.InvalidValue("decoded value does not fit the pixel depth")
    return np.asarray(out_np)


def _payload_to_columns(
    payload: bytes, starts: np.ndarray, lens_bytes: np.ndarray, wd: int
) -> np.ndarray:
    """Expand the concatenated payload back into (L, wd) uint32 word rows,
    zero-padded past each tile's byte length."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    lens_bytes = np.asarray(lens_bytes, np.int64)
    within = np.arange(wd * 4, dtype=np.int64)[None, :] < lens_bytes[:, None]
    expected = int(lens_bytes.sum())
    cums = np.cumsum(lens_bytes) - lens_bytes
    out = np.zeros((len(lens_bytes), wd * 4), np.uint8)
    if np.array_equal(np.asarray(starts, np.int64), cums) and len(buf) >= expected:
        # Contiguous tile streams (every production caller): ONE row-major
        # boolean-mask fill — ~25x faster than the padded gather below.
        out[within] = buf[:expected]
    else:
        buf2 = np.concatenate([buf, np.zeros(wd * 4, np.uint8)])
        idx = starts[:, None] + np.arange(wd * 4, dtype=np.int64)[None, :]
        out = np.where(within, buf2[np.minimum(idx, len(buf2) - 1)], 0)
    return np.ascontiguousarray(out).view(">u4").astype(np.uint32)


def _resolve_engine(engine: str) -> str:
    if engine == "auto":
        from felics_tpu.ops import pallas_codec

        return "pallas" if pallas_codec.on_tpu() else "xla"
    return engine


_pallas_disabled: set = set()


def _pallas_usable(kind: str, key: tuple) -> bool:
    """False once a Mosaic compile/run failure was seen for this shape key."""
    return (kind, key) not in _pallas_disabled


def _disable_pallas(kind: str, key: tuple, exc: Exception) -> None:
    """Record a Mosaic failure and warn once: the shape falls back to the
    XLA engine for the rest of the process (same bytes, slower)."""
    import warnings

    _pallas_disabled.add((kind, key))
    warnings.warn(
        f"felics_tpu: pallas {kind} kernel failed for shape {key} "
        f"({type(exc).__name__}: {str(exc)[:200]}); falling back to the XLA "
        "engine for this shape",
        RuntimeWarning,
        stacklevel=3,
    )


def encode_tiles_payload(
    tiles_np,
    prior_np,
    cfg: CodingConfig,
    th: int,
    tw: int,
    engine: str = "auto",
    extra=None,
):
    """Engine-routed tile encoding shared by the per-image and batched APIs.

    tiles_np: (n_tiles, C, T) int32 (numpy or device array); prior_np:
    (C, nb, K) shared or (n_tiles, C, nb, K) per-tile k-table seed (numpy
    or device). ``extra``: optional device array fetched together with the
    lengths in the SAME host sync (callers piggyback the on-device k0 here
    — a separate fetch costs a full tunnel round trip). Returns (per-tile
    byte lengths int64, concatenated payload bytes, extra-as-numpy-or-None).
    Explicit ``engine="pallas"`` raises ValueError when the shape cannot
    fit the VMEM kernel plan.
    """
    from felics_tpu.ops import pallas_codec

    nt, c, t = tiles_np.shape
    nb = num_buckets(cfg)
    wcap = pallas_codec.encode_width_bound(cfg, t, c)
    enc_key = (th, tw, c, cfg.pixel_depth)
    plan_ok = pallas_codec.kernel_plan(
        cfg, th, tw, c, min(wcap, pallas_codec.width_hint(cfg, t, c))
    )
    if engine == "pallas" and not plan_ok:
        raise ValueError(
            f"engine='pallas': {th}x{tw} tiles with {c} channel(s) exceed "
            "the VMEM kernel plan; use a smaller tile or engine='xla'/'auto'"
        )
    if (
        _resolve_engine(engine) == "pallas"
        and _pallas_usable("encode", enc_key)
        and plan_ok
    ):
        # Tight self-tuned capacity first; retry at the pessimistic bound on
        # overflow (detected exactly: the kernel reports true bit lengths).
        for wtry in dict.fromkeys(
            [pallas_codec.width_hint(cfg, t, c), wcap]
        ):
            if not pallas_codec.kernel_plan(cfg, th, tw, c, wtry):
                break
            try:
                words, bits = pallas_codec.encode_tiles(
                    tiles_np, cfg, th, tw, wtry, prior_np
                )
                # Compact the payload on device and fetch everything in ONE
                # transfer: bits + extra + ~compressed-size bytes (the old
                # full (L, W) word fetch measured ~5x the payload bytes on
                # the tunneled platform). int32 offsets gate the fast path.
                on_device = nt * wtry * 4 < (1 << 31)
                cap = payload_cap_hint(cfg, nt, t, c) if on_device else 0
                for _try in range(3):
                    if not on_device:
                        break
                    pay_dev, _tb, total_dev = _compact_payload_aligned_jit(
                        words, bits, cap
                    )
                    bits_np, extra_np, pay_np, total = jax.device_get(
                        (bits, extra, pay_dev, total_dev)
                    )
                    bits_np = np.asarray(bits_np).astype(np.int64)
                    if int(bits_np.max()) > wtry * 32:
                        break  # W overflow: the outer loop retries bigger W
                    if int(bits_np.min()) < 64:  # toy tiles: host compaction
                        on_device = False        # (_compact precondition)
                        break
                    if int(total) <= cap:
                        pallas_codec.observe_width(
                            cfg, t, c, int(bits_np.max())
                        )
                        tile_bytes_np = ((bits_np + 7) // 8).astype(np.int64)
                        observe_payload(
                            cfg, t, c, int(tile_bytes_np.sum()) // nt
                        )
                        return (
                            tile_bytes_np,
                            _strip_word_alignment(pay_np, tile_bytes_np),
                            extra_np,
                        )
                    cap = _bucket_bytes(int(total))  # cap overflow: retry
                else:
                    on_device = False  # 3 cap retries: give up on fast path
                if not on_device:  # host compaction fallback (huge batches)
                    bits_np, extra_np = jax.device_get((bits, extra))
                    bits_np = np.asarray(bits_np).astype(np.int64)
            except Exception as e:  # Mosaic compile/run failure -> XLA
                if engine == "pallas":
                    raise
                _disable_pallas("encode", enc_key, e)
                break
            max_bits = int(bits_np.max())
            if max_bits > wtry * 32:
                continue
            pallas_codec.observe_width(cfg, t, c, max_bits)
            tile_bytes_np = ((bits_np + 7) // 8).astype(np.int64)
            payload_b = _columns_to_payload(np.asarray(words), tile_bytes_np)
            return tile_bytes_np, payload_b, extra_np
        # pathological stream exceeded the fast-path word budget: fall back

    tiles = jnp.asarray(tiles_np)
    prior = jnp.asarray(prior_np)
    if prior.ndim == 3:
        prior = jnp.broadcast_to(prior[None], (nt, c, nb, cfg.num_k))

    (context, low, oor, residual, in_range, above, qctx) = (
        _tiled_stage1(tiles, th, tw, nb)
    )
    flat, offsets, tile_bytes, total_bytes = _tiled_stage2(
        tiles, context, low, oor, residual, in_range, above, qctx, prior,
        th, tw, cfg, nb,
    )
    n_big = bitpack.count_big_symbols(flat)
    total, n_big, extra_np = jax.device_get((total_bytes, n_big, extra))
    total, n_big = int(total), int(n_big)
    b_pad = bitpack.bucket_bits(total * 8)
    n_big_pad = min(_bucket_count(n_big), offsets.shape[0])
    packed = bitpack.pack_bits_scatter(flat, offsets, b_pad, n_big_pad)

    tile_bytes_np = np.asarray(tile_bytes, dtype=np.int64)
    payload = np.asarray(packed[:total]).tobytes()
    return tile_bytes_np, payload, extra_np


def compress_tiled_bytes(
    image: np.ndarray,
    tile: Optional[TileConfig] = None,
    engine: str = "auto",
    k_prior: bool = True,
) -> bytes:
    """Engine "pallas" runs the fused Mosaic kernels (ops.pallas_codec);
    "xla" runs the dense stage1/stage2/bitpack pipeline. Output bytes are
    identical; "auto" picks pallas on TPU. ``k_prior=False`` emits a legacy
    v0 container (no per-image k-prior, u32 length table)."""
    from felics_tpu.api import header_for_array

    base = header_for_array(image)  # validates dtype/shape
    tile = tile or TileConfig()
    h, w = base.height, base.width
    if h == 0 or w == 0:
        th, tw = max(2, tile.tile_h), max(2, tile.tile_w)
        header = _FIXED_HEADER.pack(
            MAGIC_TILED, int(base.color_type), int(base.pixel_depth),
            w, h, tw, th, 0, 0,
        )
        return header
    th, tw = _clamped_tile_dims(h, w, tile)
    cfg = tiled_config_for_depth(base.pixel_depth)
    nb = num_buckets(cfg)

    tiles_np, ty, tx = _prepare_tiles(image, base.color_type, th, tw)

    nt, c, t = tiles_np.shape
    if k_prior and k0_device_exact(cfg, t, nt):
        # Whole chain on device: k0 -> prior -> encode -> compaction, ONE
        # dispatch + ONE host sync on the fused fast path. Upload in the
        # narrow dtype (2-4x less wire on tunneled hosts).
        tiles_dev = jnp.asarray(
            tiles_np.astype(narrow_tile_dtype(cfg.depth_bits, c))
        )
        res = encode_container_onepass(
            tiles_dev, np.zeros((nt,), np.int32), th, tw, cfg, nb, 1, engine
        )
        if res is not None:
            tile_bytes_np, payload_b, k0s = res
            return pack_tiled_container(
                base.color_type, base.pixel_depth, w, h, tw, th, ty * tx,
                tile_bytes_np, payload_b, k0s[0],
            )
        k0_dev, prior_dev = compute_k0_prior_jax(
            tiles_dev, jnp.zeros((nt,), jnp.int32), th, tw, cfg, nb, 1
        )
        tile_bytes_np, payload_b, k0_np = encode_tiles_payload(
            tiles_dev, prior_dev, cfg, th, tw, engine, extra=k0_dev
        )
        return pack_tiled_container(
            base.color_type, base.pixel_depth, w, h, tw, th, ty * tx,
            tile_bytes_np, payload_b, np.asarray(k0_np)[0],
        )
    k0 = compute_k0(tiles_np, th, tw, cfg, nb) if k_prior else None
    prior_np = prior_from_k0(k0, cfg, c)  # (C, nb, K); zeros when no prior

    if k_prior:
        # 16-bit fused route: host-exact k0 feeds the prior-fed fused
        # chain — same ONE dispatch + ONE sync as the 8-bit path, with the
        # pixels riding the narrow dtype up.
        tiles_dev = jnp.asarray(
            tiles_np.astype(narrow_tile_dtype(cfg.depth_bits, c))
        )
        p = encode_container_dispatch(
            tiles_dev, None, th, tw, cfg, nb, 1, engine,
            prior_np=prior_np, k0s_host=k0[None],
        )
        res = encode_container_finish(p) if p is not None else None
        if res is not None:
            tile_bytes_np, payload_b, _k0s = res
            return pack_tiled_container(
                base.color_type, base.pixel_depth, w, h, tw, th, ty * tx,
                tile_bytes_np, payload_b, k0,
            )

    def pack(tile_bytes_np: np.ndarray, payload_b: bytes) -> bytes:
        if not k_prior:  # legacy v0: flags=0, u32 table, no prior block
            return (
                _FIXED_HEADER.pack(
                    MAGIC_TILED, int(base.color_type), int(base.pixel_depth),
                    w, h, tw, th, 0, ty * tx,
                )
                + tile_bytes_np.astype(">u4").tobytes()
                + payload_b
            )
        return pack_tiled_container(
            base.color_type, base.pixel_depth, w, h, tw, th, ty * tx,
            tile_bytes_np, payload_b, k0,
        )

    tile_bytes_np, payload_b, _ = encode_tiles_payload(
        jnp.asarray(tiles_np.astype(narrow_tile_dtype(cfg.depth_bits, c))),
        prior_np, cfg, th, tw, engine,
    )
    return pack(tile_bytes_np, payload_b)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def _read_bits_fn(words):
    def read(pos, nbits_max: int):
        word_idx = pos >> 5
        bit_off = (pos & 31).astype(jnp.uint32)
        w0 = words[word_idx]
        w1 = words[jnp.minimum(word_idx + 1, words.shape[0] - 1)]
        hi = w0 << bit_off
        lo = jnp.where(
            bit_off > 0, w1 >> (jnp.uint32(32) - bit_off), jnp.uint32(0)
        )
        window = hi | lo
        if nbits_max == 32:
            return window
        return window >> jnp.uint32(32 - nbits_max)

    return read


@partial(jax.jit, static_argnames=("th", "tw", "c", "cfg", "nb"))
def _decode_tiles(
    words, tile_bit_starts, th: int, tw: int, c: int, cfg: CodingConfig,
    nb: int, prior=None, tile_group=None,
):
    """vmapped sequential decode of every tile at once.

    ``prior``: (G, C, nb, K) int32 k-table seeds and ``tile_group``:
    (n_tiles,) int32 index into G (images in a batch have distinct priors);
    None = zero seed (v0 streams).

    Per-step cost is the decode bottleneck, so the step is engineered around
    TPU costs: ONE aligned 64-bit window (3 word gathers) feeds the marker,
    phase-in code, unary run, and Rice remainder extractions arithmetically;
    the k-table row select/update is dense one-hot math (no gather/scatter);
    the long-unary fallback while_loop body never executes unless some lane's
    quotient overruns the window (rare). Returns (n_tiles, C, T) int32.
    """
    t = th * tw
    k_values = jnp.asarray(cfg.k_values, dtype=jnp.int32)
    num_k = cfg.num_k
    if prior is None:
        prior = jnp.zeros((1, c, nb, num_k), jnp.int32)
    if tile_group is None:
        tile_group = jnp.zeros_like(tile_bit_starts)
    a_idx, b_idx = neighbour_indices(th, tw, xp=jnp)
    bucket_ids = jnp.arange(nb, dtype=jnp.int32)
    read = _read_bits_fn(words)
    # Consecutive word triples, so the whole 96-bit cursor window is ONE
    # gather per step (dependent-gather latency dominates decode).
    wpad = jnp.concatenate([words, jnp.zeros((2,), jnp.uint32)])
    words3 = jnp.stack([wpad[:-2], wpad[1:-1], wpad[2:]], axis=1)

    def shr32(v, s):
        s = s.astype(jnp.uint32)
        return jnp.where(s < 32, v >> jnp.minimum(s, 31), jnp.uint32(0))

    def shl32(v, s):
        s = s.astype(jnp.uint32)
        return jnp.where(s < 32, v << jnp.minimum(s, 31), jnp.uint32(0))

    def window_bits(win0, win1, s, n):
        """n bits at offset s (s in [0, 64), s+n <= 64, n traced <= 31)."""
        lo = shl32(win0, s) | jnp.where(s > 0, shr32(win1, 32 - s), 0)
        hi = shl32(win1, s - 32)
        x = jnp.where(s < 32, lo, hi)
        return shr32(x, 32 - n)

    def decode_tile(start_bit, gidx):
        prior_t = prior[gidx]  # (C, nb, K)

        def step(state, i):
            pos, table, buf = state
            j = i % t  # pixel within channel plane
            ch = i // t
            # Fresh k statistics per channel plane, seeded from the header's
            # per-image prior (zeros for v0 streams; matches the encoder's
            # per-(tile, channel) domains and FLCS's per-channel estimator).
            table = jnp.where(
                j == 0,
                jax.lax.dynamic_index_in_dim(prior_t, ch, 0, keepdims=False),
                table,
            )

            # Aligned 64-bit window at the cursor: ONE triple-word gather.
            wi = pos >> 5
            off = (pos & 31).astype(jnp.uint32)
            last = words.shape[0] - 1
            tri = words3[jnp.minimum(wi, last)]
            w_a, w_b, w_c = tri[0], tri[1], tri[2]
            carry = jnp.where(off > 0, w_b >> (jnp.uint32(32) - off), jnp.uint32(0))
            win0 = (w_a << off) | carry
            carry2 = jnp.where(off > 0, w_c >> (jnp.uint32(32) - off), jnp.uint32(0))
            win1 = (w_b << off) | carry2

            # Depth-sized raw preamble for the first two pixels of each
            # channel (planes > 0 are signed two's complement, +1 bit).
            ch_i = i // t
            pre_w = cfg.depth_bits + jnp.where(ch_i > 0, 1, 0)
            pre_sh = (jnp.int32(32) - pre_w).astype(jnp.uint32)
            raw_u = (win0 >> pre_sh).astype(jnp.uint32)
            raw_lo = jax.lax.bitcast_convert_type(raw_u << pre_sh, jnp.int32)
            raw_sx = raw_lo >> pre_sh.astype(jnp.int32)  # arithmetic
            raw = jnp.where(
                ch_i > 0, raw_sx, jax.lax.bitcast_convert_type(raw_u, jnp.int32)
            )

            va = buf[ch * t + a_idx[j]]
            vb = buf[ch * t + b_idx[j]]
            h = jnp.maximum(va, vb)
            l = jnp.minimum(va, vb)
            ctx = jnp.clip(h - l, 0, cfg.max_context)
            qc = qctx_of(ctx)

            onehot = (bucket_ids == qc).astype(jnp.int32)  # (nb,)
            row = jnp.sum(table * onehot[:, None], axis=0)  # (num_k,)
            best = (num_k - 1) - jnp.argmin(row[::-1])
            k = k_values[best]

            first = (win0 >> 31).astype(jnp.int32)

            # --- in-range: phase-in over n = ctx+1, bits at offset 1 ---
            nn = ctx + 1
            m = 31 - jax.lax.clz(nn)
            left_p = nn - (1 << m)
            right_p = (1 << (m + 1)) - nn
            first_m = window_bits(win0, win1, jnp.int32(1), m).astype(jnp.int32)
            short = first_m < right_p
            extra = window_bits(win0, win1, 1 + m, jnp.int32(1)).astype(jnp.int32)
            number = jnp.where(
                short, first_m, (first_m - right_p) * 2 + right_p + extra
            )
            in_value = (number + left_p) % nn + l
            in_pos = pos + 1 + jnp.where(short, m, m + 1)

            # --- out-of-range: second marker bit, unary run, remainder ---
            above_bit = (win0 >> 30) & 1
            u_win = shl32(win0, jnp.int32(2)) | shr32(win1, jnp.int32(30))
            inverted = (~u_win) & jnp.uint32(0xFFFFFFFF)
            lead = jnp.where(inverted == 0, 32, jax.lax.clz(inverted)).astype(
                jnp.int32
            )
            overrun = lead >= 30  # terminator or remainder may exceed window

            bit_limit = jnp.int32(words.shape[0] * 32)

            def cont_cond(st):
                return ~st[3]

            def cont_body(st):
                q2, p2, rem2, done = st
                wdw = read(p2, 32)
                inv = (~wdw) & jnp.uint32(0xFFFFFFFF)
                ld = jnp.where(inv == 0, 32, jax.lax.clz(inv)).astype(jnp.int32)
                ld = jnp.where(done, 0, ld)  # finished lanes stay put
                # p2 >= bit_limit: corrupt stream ran off the end — stop (the
                # garbage value is range-checked after assembly). ``done`` is
                # sticky so already-finished lanes cannot re-arm the loop.
                fin = done | (ld < 32) | (p2 >= bit_limit)
                # On termination also fetch the Rice remainder at the far
                # cursor (only overrun lanes ever reach here).
                rem2 = jnp.where(
                    fin & ~done,
                    (read(p2 + ld + 1, 32) >> (32 - k).astype(jnp.uint32)).astype(
                        jnp.int32
                    ),
                    rem2,
                )
                return q2 + ld, p2 + ld + jnp.where(fin & ~done, 1, 0), rem2, fin

            # Fallback continues from the cursor for overrun lanes; done=True
            # for everyone else, so the loop body is skipped when no lane
            # overruns (the overwhelmingly common case).
            q2, p2, rem_slow, _ = jax.lax.while_loop(
                cont_cond,
                cont_body,
                (jnp.int32(0), pos + 2, jnp.int32(0), ~overrun),
            )
            uq = jnp.where(overrun, q2, lead)
            pos_u = jnp.where(overrun, p2, pos + 2 + lead + 1)
            rem_fast = window_bits(win0, win1, pos_u - pos, k).astype(jnp.int32)
            rem = jnp.where(k > 0, jnp.where(overrun, rem_slow, rem_fast), 0)
            encoded = (uq << k) + rem
            oor_value = jnp.where(above_bit == 1, encoded + h + 1, l - encoded - 1)
            oor_pos = pos_u + k

            is_pre = j < 2
            is_in = (first == 1) & ~is_pre
            is_oor = ~is_in & ~is_pre

            add_row = jnp.where(is_oor, (encoded >> k_values) + 1 + k_values, 0)
            new_row = row + add_row
            if cfg.count_scaling is not None:
                halve = (jnp.min(new_row) > cfg.count_scaling) & is_oor
                new_row = jnp.where(halve, new_row >> 1, new_row)
            table = table + onehot[:, None] * (new_row - row)[None, :]

            value = jnp.where(is_pre, raw, jnp.where(is_in, in_value, oor_value))
            new_pos = jnp.where(
                is_pre, pos + pre_w, jnp.where(is_in, in_pos, oor_pos)
            )
            buf = buf.at[i].set(value)
            return (new_pos, table, buf), None

        table0 = prior_t[0]
        buf0 = jnp.zeros((c * t,), jnp.int32)
        (end_pos, _, buf), _ = jax.lax.scan(
            step,
            (start_bit, table0, buf0),
            jnp.arange(c * t, dtype=jnp.int32),
            unroll=4,  # amortize per-step loop machinery
        )
        return buf

    bufs = jax.vmap(decode_tile)(
        tile_bit_starts.astype(jnp.int32), tile_group.astype(jnp.int32)
    )
    return bufs.reshape(-1, c, t)


def _assemble_image_body(
    bufs, th: int, tw: int, c: int, ty: int, tx: int, height: int, width: int,
    depth_max: int,
):
    """(n_tiles, C, T) planes -> (H, W[, 3]) pixels + validity flag
    (traced body — also vmapped over a same-shape image batch)."""
    planes = (
        bufs.reshape(ty, tx, c, th, tw)
        .transpose(2, 0, 3, 1, 4)
        .reshape(c, ty * th, tx * tw)[:, :height, :width]
    )
    if c == 1:
        out = planes[0]
    else:
        r, g, b = ycocg_to_rgb(planes[0], planes[1], planes[2], xp=jnp)
        out = jnp.stack([r, g, b], axis=-1)
    valid = jnp.all((out >= 0) & (out <= depth_max))
    dtype = jnp.uint8 if depth_max == 255 else jnp.uint16
    return out.astype(dtype), valid


_assemble_image = jax.jit(
    _assemble_image_body,
    static_argnames=("th", "tw", "c", "ty", "tx", "height", "width",
                     "depth_max"),
)


def _image_tiles_device(imgs, th: int, tw: int, rgb: bool):
    """(N, H, W[, 3]) narrow-dtype image batch -> (N*ty*tx, C, th*tw) int32
    tiles ON DEVICE (traced body): edge-pad to tile multiples, YCoCg for
    RGB, row-major tile reshape — the device mirror of _prepare_tiles, so
    same-shape batches upload RAW pixels (uint8: 3 B/px for rgb8 instead
    of 6 as int16 planes) and skip the host transform entirely."""
    n, h, w = imgs.shape[:3]
    ph, pw = (-h) % th, (-w) % tw
    if ph or pw:
        pad = ((0, 0), (0, ph), (0, pw)) + (
            ((0, 0),) if imgs.ndim == 4 else ()
        )
        imgs = jnp.pad(imgs, pad, mode="edge")
    hp, wp = h + ph, w + pw
    ty, tx = hp // th, wp // tw
    x = imgs.astype(jnp.int32)
    if rgb:
        y, co, cg = rgb_to_ycocg(x[..., 0], x[..., 1], x[..., 2], xp=jnp)
        chans = jnp.stack([y, co, cg], axis=1)  # (N, 3, Hp, Wp)
    else:
        chans = x[:, None]
    c = chans.shape[1]
    return (
        chans.reshape(n, c, ty, th, tx, tw)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(n * ty * tx, c, th * tw)
    )


def decode_tiles_bufs(
    payload: bytes,
    lens: np.ndarray,
    th: int,
    tw: int,
    c: int,
    cfg: CodingConfig,
    prior_np: np.ndarray,
    tile_group: Optional[np.ndarray] = None,
    engine: str = "auto",
):
    """Engine-routed tile decoding shared by the per-image and batched APIs.

    payload: concatenated per-tile byte streams (exactly sum(lens) bytes
    meaningful); lens: (n_tiles,) payload bytes per tile; prior_np:
    (G, C, nb, K) k-table seeds with ``tile_group`` (n_tiles,) indexing G
    (None = all tiles group 0). Returns (n_tiles, C, T) int32 device array.
    Explicit ``engine="pallas"`` raises ValueError on VMEM-infeasible shapes.
    """
    from felics_tpu.ops import pallas_codec

    nb = num_buckets(cfg)
    lens = np.asarray(lens, np.int64)
    wd = pallas_codec.bucket_words(int(-(-(lens.max(initial=1)) // 4)))
    dec_key = (th, tw, c, cfg.pixel_depth, wd)
    fits = pallas_codec.decode_fits(c * th * tw, wd, c, cfg)
    if engine == "pallas" and not fits:
        raise ValueError(
            f"engine='pallas': {th}x{tw} tiles with {c} channel(s) exceed "
            "the VMEM decode plan; use engine='xla'/'auto'"
        )
    expected = int(lens.sum())
    if (
        _resolve_engine(engine) == "pallas"
        and _pallas_usable("decode", dec_key)
        and fits
    ):
        starts_b = np.concatenate([[0], np.cumsum(lens)[:-1]])
        if tile_group is None or prior_np.shape[0] == 1:
            pr = prior_np[0]  # shared (C, nb, K) seed
        else:
            pr = prior_np[np.asarray(tile_group)]  # per-tile (nt, C, nb, K)
        try:
            if expected < (1 << 31):
                # Upload the ~compressed-size byte stream (bucket-padded to
                # bound recompiles) and expand to word rows ON DEVICE — the
                # host-side expansion uploaded a padded word matrix ~1.5x
                # the payload and burned host time building it.
                pad = _bucket_bytes(expected)
                buf = np.frombuffer(
                    payload[:expected].ljust(pad, b"\0"), dtype=np.uint8
                )
                cols_dev = _expand_columns_jit(
                    jnp.asarray(buf),
                    jnp.asarray(starts_b, jnp.int32),
                    jnp.asarray(lens, jnp.int32),
                    wd,
                )
            else:
                cols_dev = jnp.asarray(
                    _payload_to_columns(payload[:expected], starts_b, lens, wd)
                )
            return pallas_codec.decode_tiles(cols_dev, cfg, th, tw, c, pr)
        except Exception as e:  # Mosaic compile/run failure -> XLA
            if engine == "pallas":
                raise
            _disable_pallas("decode", dec_key, e)
    arr = np.frombuffer(payload[:expected], dtype=np.uint8)
    pad = (-len(arr)) % 4
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, np.uint8)])
    w32 = arr.reshape(-1, 4).astype(np.uint32)
    words = jnp.asarray(
        (w32[:, 0] << 24) | (w32[:, 1] << 16) | (w32[:, 2] << 8) | w32[:, 3]
    )
    starts = (np.concatenate([[0], np.cumsum(lens)[:-1]]) * 8).astype(np.int32)
    tg = None if tile_group is None else jnp.asarray(tile_group, jnp.int32)
    return _decode_tiles(
        words, jnp.asarray(starts), th, tw, c, cfg, nb,
        jnp.asarray(prior_np), tg,
    )


def assemble_image_np(
    bufs_np: np.ndarray, th: int, tw: int, c: int, ty: int, tx: int,
    height: int, width: int, depth_max: int,
) -> np.ndarray:
    """Host-side mirror of _assemble_image for already-fetched tile planes
    (the batched decode fetches all tiles in one transfer and assembles on
    the host). Raises on out-of-depth values like the device path."""
    planes = (
        bufs_np.reshape(ty, tx, c, th, tw)
        .transpose(2, 0, 3, 1, 4)
        .reshape(c, ty * th, tx * tw)[:, :height, :width]
    )
    if c == 1:
        out = planes[0]
    else:
        r, g, b = ycocg_to_rgb(planes[0], planes[1], planes[2])
        out = np.stack([r, g, b], axis=-1)
    if out.size and (out.min() < 0 or out.max() > depth_max):
        raise errors.InvalidValue("decoded value does not fit the pixel depth")
    dtype = np.uint8 if depth_max == 255 else np.uint16
    return out.astype(dtype)


def decompress_tiled_bytes(data: bytes, engine: str = "auto") -> np.ndarray:
    header = read_tiled_header(data)
    cfg = tiled_config_for_depth(header.pixel_depth)
    nb = num_buckets(cfg)
    h, w = header.height, header.width
    if h == 0 or w == 0:
        dtype = np.uint8 if header.pixel_depth == PixelDepth.EIGHT else np.uint16
        shape = (h, w) if header.color_type == ColorType.GRAY else (h, w, 3)
        return np.zeros(shape, dtype)

    th, tw = header.tile_h, header.tile_w
    ty = -(-h // th)
    tx = -(-w // tw)
    if ty * tx != header.n_tiles:
        raise errors.InvalidDimensions("tile grid does not match dims")
    c = header.num_channels
    prior_np = prior_from_k0(header.k0, cfg, c)  # zeros for v0 streams

    payload = data[header.payload_off :]
    expected = int(header.tile_lengths.sum())
    if len(payload) < expected:
        raise errors.IoError("truncated FLCT payload")

    depth_max = 255 if header.pixel_depth == PixelDepth.EIGHT else 65535
    res = decode_image_onepass(
        payload, header.tile_lengths, th, tw, c, cfg, prior_np[None],
        ty, tx, h, w, depth_max, engine,
    )
    if res is not None:
        return res
    bufs = decode_tiles_bufs(
        payload, header.tile_lengths, th, tw, c, cfg, prior_np[None],
        None, engine,
    )
    out, valid = _assemble_image(
        bufs, th, tw, c, ty, tx, h, w, depth_max
    )
    # ONE host sync for both (a separate bool(valid) fetch costs a full
    # round trip on tunneled platforms).
    out_np, valid_np = jax.device_get((out, valid))
    if not bool(valid_np):
        raise errors.InvalidValue("decoded value does not fit the pixel depth")
    return np.asarray(out_np)
