"""Device-mesh sharding for the tiled (FLCT) pipeline.

Tiles are mutually independent, so the natural multi-chip layout is the tile
axis sharded over a 1-D mesh (data parallelism over tiles):

  * analysis / kscan / symbolize: zero cross-device traffic — every op is
    elementwise or per-(tile, channel) segmented, so GSPMD partitions them
    trivially along the tile axis;
  * offsets: the per-tile byte-length cumsum is the one genuinely global
    step (equivalent to the all-gather-of-lengths in BASELINE.json's design);
    it moves n_tiles scalars over ICI, nothing more;
  * pack: each symbol writes only within its own tile's byte range, so
    scatter traffic stays shard-local after the offset broadcast.

``fused_encode_step`` is the whole encoder as ONE jittable program with
static worst-case paddings (no host syncs) — the form used for pjit over a
mesh, for ahead-of-time compilation, and for the driver's multi-chip dry-run.
The host-synced dynamic-shape path in tiling.py remains the single-chip
production encoder (tighter paddings → less wasted work).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from felics_tpu.config import CodingConfig, TileConfig, tiled_config_for_depth
from felics_tpu.format import ColorType
from felics_tpu.ops import bitpack
from felics_tpu.ops.kscan_tiled import num_buckets
from felics_tpu.parallel import tiling


def make_tile_mesh(devices=None, axis: str = "tiles") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


@partial(
    jax.jit,
    static_argnames=("th", "tw", "cfg", "nb", "b_pad"),
)
def fused_encode_step(
    tiles: jnp.ndarray,
    th: int,
    tw: int,
    cfg: CodingConfig,
    nb: int,
    b_pad: int,
    prior: Optional[jnp.ndarray] = None,
):
    """Full FLCT encode as one XLA program: tiles (n_tiles, C, T) int32 →
    (packed bytes uint8[b_pad//8], per-tile byte lengths, total bytes).

    ``prior``: (C, nb, K) int32 per-image k-table seed (None = zeros, the
    v0 stream). ``b_pad`` bounds total payload bits (caller must guarantee
    it — the dynamic path in tiling.py sizes it exactly).
    """
    nt, c, _t = tiles.shape
    if prior is None:
        prior = jnp.zeros((c, nb, cfg.num_k), jnp.int32)
    prior_nt = jnp.broadcast_to(prior[None], (nt, c, nb, cfg.num_k))
    (context, low, oor, residual, in_range, above, qctx) = (
        tiling._tiled_stage1(tiles, th, tw, nb)
    )
    flat, offsets, tile_bytes, total_bytes = tiling._tiled_stage2(
        tiles, context, low, oor, residual, in_range, above, qctx, prior_nt,
        th, tw, cfg, nb,
    )
    packed = bitpack.pack_bits_scatter(flat, offsets, b_pad)
    return packed, tile_bytes, total_bytes


def worst_case_payload_bits(n_tiles: int, c: int, t: int, cfg: CodingConfig) -> int:
    """Loose but safe payload bound for fused (no-host-sync) encoding of
    natural images: per pixel ≤ 2 marker + max(phase-in, k_max tail) bits
    plus the worst Rice quotient amortized; we bound the quotient by noting
    the adaptive estimator always has k_max available, whose quotient is
    ≤ residual >> k_max < 2^(depth - k_max + 1)."""
    k_max = cfg.k_values[-1]
    depth = cfg.depth_bits
    worst_pixel = 2 + max(cfg.max_phase_in_bits, (1 << (depth + 1 - k_max)) + 1 + k_max)
    per_tile = c * (64 + (t - 2) * worst_pixel) + 7
    return ((n_tiles * per_tile + 255) // 256) * 256


def encode_tiled_sharded(
    image: np.ndarray,
    mesh: Mesh,
    tile: Optional[TileConfig] = None,
    axis: str = "tiles",
) -> bytes:
    """FLCT encode with the tile axis sharded over ``mesh``.

    Pads the tile count to a multiple of the mesh size (empty padding tiles
    are dropped from the container). Produces byte-identical output to the
    single-device tiling.compress_tiled_bytes for the same tile geometry.
    """
    from felics_tpu.api import header_for_array

    base = header_for_array(image)
    tile = tile or TileConfig()
    h, w = base.height, base.width
    if h == 0 or w == 0:
        return tiling.compress_tiled_bytes(image, tile)
    th, tw = tiling._clamped_tile_dims(h, w, tile)
    cfg = tiled_config_for_depth(base.pixel_depth)
    nb = num_buckets(cfg)

    tiles_np, ty, tx = tiling._prepare_tiles(image, base.color_type, th, tw)
    n_tiles = tiles_np.shape[0]
    c = tiles_np.shape[1]
    k0 = tiling.compute_k0(tiles_np, th, tw, cfg, nb)
    prior_np = tiling.prior_from_k0(k0, cfg, c)
    n_dev = mesh.devices.size
    pad_tiles = (-n_tiles) % n_dev
    if pad_tiles:
        tiles_np = np.concatenate(
            [tiles_np, np.zeros((pad_tiles,) + tiles_np.shape[1:], np.int32)]
        )

    sharding = NamedSharding(mesh, P(axis, None, None))
    tiles = jax.device_put(jnp.asarray(tiles_np), sharding)
    prior = jnp.broadcast_to(
        jnp.asarray(prior_np)[None],
        (tiles_np.shape[0], c, nb, cfg.num_k),
    )

    (context, low, oor, residual, in_range, above, qctx) = (
        tiling._tiled_stage1(tiles, th, tw, nb)
    )
    flat, offsets, tile_bytes, total_bytes = tiling._tiled_stage2(
        tiles, context, low, oor, residual, in_range, above, qctx, prior,
        th, tw, cfg, nb,
    )
    n_big = bitpack.count_big_symbols(flat)
    total, n_big = (int(x) for x in jax.device_get((total_bytes, n_big)))
    b_pad = bitpack.bucket_bits(total * 8)
    n_big_pad = min(tiling._bucket_count(n_big), offsets.shape[0])
    packed = bitpack.pack_bits_scatter(flat, offsets, b_pad, n_big_pad)

    tile_bytes_np = np.asarray(tile_bytes, dtype=np.int64)[:n_tiles]
    payload_len = int(tile_bytes_np.sum())
    payload = np.asarray(packed[:payload_len]).tobytes()
    return tiling.pack_tiled_container(
        base.color_type, base.pixel_depth, w, h, tw, th, n_tiles,
        tile_bytes_np, payload, k0,
    )


def decode_tiled_sharded(data: bytes, mesh: Mesh, axis: str = "tiles") -> np.ndarray:
    """FLCT decode with tiles sharded over ``mesh``.

    The per-tile sequential scans are independent, so sharding the vmapped
    tile axis splits the batch across devices; the bitstream words are
    replicated (read-only gather source).
    """
    # The dynamic path reuses tiling.decompress_tiled_bytes; GSPMD shards the
    # vmap batch when inputs carry shardings. For explicitness we device_put
    # the tile starts sharded and the words replicated.
    header = tiling.read_tiled_header(data)
    if header.n_tiles == 0:
        return tiling.decompress_tiled_bytes(data)
    # Reuse the single-device implementation but with sharded inputs.
    import felics_tpu.parallel.tiling as t

    cfg = tiled_config_for_depth(header.pixel_depth)
    nb = num_buckets(cfg)
    h, w = header.height, header.width
    th, tw = header.tile_h, header.tile_w
    ty, tx = -(-h // th), -(-w // tw)
    c = header.num_channels
    prior_np = t.prior_from_k0(header.k0, cfg, c)
    arr = np.frombuffer(data[header.payload_off :], dtype=np.uint8)
    pad = (-len(arr)) % 4
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, np.uint8)])
    w32 = arr.reshape(-1, 4).astype(np.uint32)
    words = jnp.asarray(
        (w32[:, 0] << 24) | (w32[:, 1] << 16) | (w32[:, 2] << 8) | w32[:, 3]
    )
    words = jax.device_put(words, NamedSharding(mesh, P(None)))
    starts = np.concatenate([[0], np.cumsum(header.tile_lengths)[:-1]]) * 8
    # Pad the tile axis to the mesh size (mirror of encode_tiled_sharded):
    # padding lanes re-decode tile 0 and are sliced away after the scan.
    n_dev = mesh.devices.size
    pad_tiles = (-header.n_tiles) % n_dev
    if pad_tiles:
        starts = np.concatenate([starts, np.full(pad_tiles, starts[0])])
    starts = jax.device_put(
        jnp.asarray(starts, jnp.int32), NamedSharding(mesh, P(axis))
    )
    bufs = t._decode_tiles(
        words, starts, th, tw, c, cfg, nb, jnp.asarray(prior_np)[None]
    )
    if pad_tiles:
        bufs = bufs[: header.n_tiles]
    depth_max = 255 if int(header.pixel_depth) == 0 else 65535
    out, valid = t._assemble_image(bufs, th, tw, c, ty, tx, h, w, depth_max)
    if not bool(valid):
        from felics_tpu import errors

        raise errors.InvalidValue("decoded value does not fit the pixel depth")
    return np.asarray(out)
