"""Batched multi-image FLCS encode: bytes identical to per-image encodes.

Reference parity anchor: the batched path must emit exactly the per-image
FLCS containers the reference's compress_image would (src/compression.rs:
412-418) — it only changes the execution schedule (one fused device program),
never the format.
"""

import numpy as np
import pytest

import felics_tpu
from felics_tpu import api


def smooth(rng, w, h, dtype=np.uint8, channels=None):
    shape = (h, w) if channels is None else (h, w, channels)
    hi = np.iinfo(dtype).max
    img = np.cumsum(np.cumsum(rng.integers(-6, 7, shape), 0), 1) + hi // 2
    return np.clip(img, 0, hi).astype(dtype)


def test_batched_matches_per_image(rng):
    images = [
        smooth(rng, 24, 16),
        smooth(rng, 24, 16),                     # same shape: shares a group
        smooth(rng, 17, 9),                      # different shape
        smooth(rng, 12, 10, np.uint16),          # 16-bit
        smooth(rng, 14, 11, channels=3),         # RGB
        smooth(rng, 8, 8, np.uint16, channels=3),
    ]
    batched = felics_tpu.compress_images_bytes(images, backend="jax")
    singles = [
        felics_tpu.compress_image_bytes(im, backend="jax") for im in images
    ]
    for i, (b, s) in enumerate(zip(batched, singles)):
        assert b == s, f"image {i}: batched bytes diverge from per-image"
    for im, b in zip(images, batched):
        out = felics_tpu.decompress_image_bytes(b, backend="jax")
        np.testing.assert_array_equal(out, im)


def test_batched_degenerate_dims(rng):
    images = [
        np.zeros((0, 5), np.uint8),
        np.asarray([[7]], np.uint8),
        smooth(rng, 16, 8),
    ]
    batched = felics_tpu.compress_images_bytes(images, backend="jax")
    singles = [
        felics_tpu.compress_image_bytes(im, backend="jax") for im in images
    ]
    assert batched == singles


def test_batched_empty():
    assert felics_tpu.compress_images_bytes([]) == []


def test_batched_flct_routing(rng):
    from felics_tpu.config import TileConfig

    images = [smooth(rng, 32, 32), smooth(rng, 32, 32)]
    tc = TileConfig(16, 16)
    batched = felics_tpu.compress_images_bytes(
        images, backend="jax", container="flct", tile=tc
    )
    singles = [
        felics_tpu.compress_image_bytes(im, container="flct", tile=tc)
        for im in images
    ]
    assert batched == singles


def test_batched_decode_matches_per_image(rng):
    """decompress_images_bytes (vmapped scan, lanes = images) must equal
    per-image decodes across shapes, depths and colors."""
    images = [
        smooth(rng, 24, 16),
        smooth(rng, 24, 16),                     # same shape: shares a group
        smooth(rng, 17, 9),
        smooth(rng, 12, 10, np.uint16),
        smooth(rng, 14, 11, channels=3),
        smooth(rng, 8, 8, np.uint16, channels=3),
    ]
    blobs = felics_tpu.compress_images_bytes(images, backend="jax")
    outs = felics_tpu.decompress_images_bytes(blobs, backend="jax")
    assert len(outs) == len(images)
    for im, out in zip(images, outs):
        np.testing.assert_array_equal(out, im)
        assert out.dtype == im.dtype


def test_batched_decode_degenerate_and_corrupt(rng):
    from felics_tpu import errors

    imgs = [smooth(rng, 1, 1), smooth(rng, 16, 16)]
    blobs = [felics_tpu.compress_image_bytes(im) for im in imgs]
    outs = felics_tpu.decompress_images_bytes(blobs, backend="jax")
    for im, out in zip(imgs, outs):
        np.testing.assert_array_equal(out, im)
    # truncated member fails the whole batch with a clean error
    bad = blobs[1][: 14 + 4]
    with pytest.raises(errors.DecompressionError):
        felics_tpu.decompress_images_bytes([blobs[0], bad], backend="jax")


def test_batched_decode_flct_routing(rng):
    imgs = [smooth(rng, 32, 32), smooth(rng, 32, 32)]
    blobs = felics_tpu.compress_images_bytes(
        imgs, backend="jax", container="flct"
    )
    outs = felics_tpu.decompress_images_bytes(blobs)
    for im, out in zip(imgs, outs):
        np.testing.assert_array_equal(out, im)
    # mixed containers loop per image, still exact
    mixed = [blobs[0], felics_tpu.compress_image_bytes(imgs[1])]
    outs = felics_tpu.decompress_images_bytes(mixed)
    for im, out in zip(imgs, outs):
        np.testing.assert_array_equal(out, im)


def test_batched_encode_lane_chunking_matches(rng, monkeypatch):
    """When the kscan scratch budget forces the vmapped lanes into slices,
    bytes must still equal the per-image encoder (the slicing is a memory
    guard, not a semantic change)."""
    from felics_tpu.core import jax_codec

    monkeypatch.setattr(jax_codec, "_KSCAN_LANE_BUDGET", 1)  # 1 lane/slice
    imgs = [
        np.clip(
            np.cumsum(np.cumsum(rng.integers(-6, 7, (24, 32)), 0), 1) + 128,
            0, 255,
        ).astype(np.uint8)
        for _ in range(3)
    ]
    batched = jax_codec.compress_images_bytes(imgs)
    singles = [
        jax_codec.compress_image_bytes(im, api.header_for_array(im))
        for im in imgs
    ]
    assert batched == singles
