"""Fused Pallas FLCT kernels vs the XLA pipeline — byte equality and round
trips (interpreter mode on CPU; the same code lowers through Mosaic on TPU).

The XLA pipeline (stage1/stage2/bitpack + scan decoder) is itself pinned
byte-for-byte against the scalar oracle and the native C++ core, so equality
here chains the Pallas kernels into the same cross-validation web.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from felics_tpu.config import TileConfig, tiled_config_for_depth
from felics_tpu.format import ColorType, PixelDepth
from felics_tpu.ops import pallas_codec as pc
from felics_tpu.parallel import tiling


def _image(shape, depth_max, seed, smooth=True):
    rng = np.random.default_rng(seed)
    dt = np.uint8 if depth_max == 255 else np.uint16
    if smooth:
        base = rng.integers(-3, 4, shape).cumsum(axis=1) + depth_max // 2
        return np.clip(base, 0, depth_max).astype(dt)
    return rng.integers(0, depth_max + 1, shape).astype(dt)


CASES = [
    ((24, 24), 255, (8, 8), True),
    ((16, 16), 255, (4, 4), False),
    ((16, 24), 65535, (8, 8), True),
    ((13, 9), 255, (5, 3), False),
    ((16, 16, 3), 255, (8, 8), True),
    ((8, 8, 3), 65535, (4, 4), False),
]


@pytest.mark.parametrize("shape,depth_max,tile,smooth", CASES)
def test_container_bytes_match_xla(shape, depth_max, tile, smooth):
    img = _image(shape, depth_max, hash((shape, depth_max)) % 1000, smooth)
    tc = TileConfig(tile_h=tile[0], tile_w=tile[1])
    blob_x = tiling.compress_tiled_bytes(img, tc, engine="xla")
    blob_p = tiling.compress_tiled_bytes(img, tc, engine="pallas")
    assert blob_p == blob_x

    out_p = tiling.decompress_tiled_bytes(blob_x, engine="pallas")
    assert np.array_equal(out_p, img)
    out_x = tiling.decompress_tiled_bytes(blob_p, engine="xla")
    assert np.array_equal(out_x, img)


def test_kernel_streams_match_symbol_pipeline():
    """Per-tile stream words from the kernel == XLA per-tile byte streams."""
    from felics_tpu.ops.kscan_tiled import num_buckets

    img = _image((32, 32), 255, 3, smooth=True)
    tc = TileConfig(tile_h=8, tile_w=8)
    blob = tiling.compress_tiled_bytes(img, tc, engine="xla")
    hdr = tiling.read_tiled_header(blob)
    payload = blob[hdr.payload_off :]

    cfg = tiled_config_for_depth(PixelDepth.EIGHT)
    tiles_np, _, _ = tiling._prepare_tiles(img, ColorType.GRAY, 8, 8)
    nt, c, t = tiles_np.shape
    # The default container seeds every tile's k-table from the per-image
    # prior in the header; feed the kernel the same seed.
    prior = tiling.prior_from_k0(hdr.k0, cfg, c)
    wcap = pc.encode_width_bound(cfg, t, c)
    words, bits = pc.encode_tiles(tiles_np, cfg, 8, 8, wcap, prior)
    words_np, bits_np = np.asarray(words), np.asarray(bits)

    off = 0
    for ti in range(nt):
        ln = int(hdr.tile_lengths[ti])
        assert (int(bits_np[ti]) + 7) // 8 == ln
        ref = payload[off : off + ln]
        off += ln
        got = words_np[ti].astype(">u4").tobytes()[:ln]
        assert got == ref, f"tile {ti} stream mismatch"


def test_decode_tolerates_corrupt_columns():
    """Corrupt streams must terminate and fail validation, never hang."""
    img = _image((16, 16), 255, 9)
    tc = TileConfig(tile_h=8, tile_w=8)
    blob = bytearray(tiling.compress_tiled_bytes(img, tc, engine="pallas"))
    hdr = tiling.read_tiled_header(bytes(blob))
    blob[hdr.payload_off + 3] ^= 0xFF
    try:
        out = tiling.decompress_tiled_bytes(bytes(blob), engine="pallas")
        assert out.shape == img.shape  # decoded-but-wrong is acceptable
    except Exception as exc:  # must be our error type, not a crash
        from felics_tpu import errors

        assert isinstance(exc, errors.DecompressionError)


def test_vmem_guard():
    """Oversized tiles (one big tile > VMEM): explicit pallas raises; the
    auto/xla engines still round-trip via the XLA pipeline."""
    img = _image((256, 256), 255, 11)
    tc = TileConfig(tile_h=256, tile_w=256)
    with pytest.raises(ValueError, match="VMEM"):
        tiling.compress_tiled_bytes(img, tc, engine="pallas")
    blob = tiling.compress_tiled_bytes(img, tc, engine="auto")
    with pytest.raises(ValueError, match="VMEM"):
        tiling.decompress_tiled_bytes(blob, engine="pallas")
    assert np.array_equal(
        tiling.decompress_tiled_bytes(blob, engine="auto"), img
    )


def test_flct_backend_choice(monkeypatch):
    """auto routes FLCT to the TPU pipeline when a TPU is live, to the
    native C++ codec on a CPU host; explicit choices are honored."""
    import felics_tpu.api as api
    from felics_tpu.native import runtime as native_runtime
    from felics_tpu.ops import pallas_codec

    monkeypatch.setattr(pallas_codec, "on_tpu", lambda: True)
    assert api._flct_backend("auto") == "jax"
    monkeypatch.setattr(pallas_codec, "on_tpu", lambda: False)
    expected = "native" if native_runtime.available() else "jax"
    assert api._flct_backend("auto") == expected
    assert api._flct_backend("jax") == "jax"
    assert api._flct_backend("native") == "native"
    assert api._flct_backend("oracle") == "jax"
