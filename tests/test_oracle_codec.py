"""Round-trip tests for the sequential oracle codec.

Mirrors the reference's property tests (src/compression.rs:443-559): awkward
dimensions, zero-area images, u8/u16, gray/RGB, plus an exhaustive small-dims
sweep (bounded to keep the pure-Python codec fast).
"""

import numpy as np
import pytest

from felics_tpu.api import compress_image_bytes, decompress_image_bytes
from felics_tpu.format import read_header_bytes

AWKWARD_DIMS = [(2, 1), (1, 2), (1, 1), (4, 7), (44, 1), (1, 44), (40, 25), (23, 31)]


def random_image(rng, width, height, dtype, channels=None):
    high = np.iinfo(dtype).max + 1
    shape = (height, width) if channels is None else (height, width, channels)
    return rng.integers(0, high, size=shape).astype(dtype)


def round_trip(image):
    data = compress_image_bytes(image, backend="oracle")
    out = decompress_image_bytes(data, backend="oracle")
    np.testing.assert_array_equal(out, image)
    return data


def test_zero_width():
    image = np.zeros((3, 0), dtype=np.uint8)
    data = compress_image_bytes(image, backend="oracle")
    out = decompress_image_bytes(data, backend="oracle")
    assert out.shape == (3, 0)


def test_zero_height():
    image = np.zeros((0, 5), dtype=np.uint8)
    out = decompress_image_bytes(compress_image_bytes(image, backend="oracle"), backend="oracle")
    assert out.shape == (0, 5)


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
@pytest.mark.parametrize("dims", AWKWARD_DIMS)
def test_grayscale_round_trip(rng, dtype, dims):
    width, height = dims
    round_trip(random_image(rng, width, height, dtype))


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
@pytest.mark.parametrize("dims", [(1, 1), (1, 2), (5, 3), (16, 11)])
def test_rgb_round_trip(rng, dtype, dims):
    width, height = dims
    round_trip(random_image(rng, width, height, dtype, channels=3))


def test_small_dims_sweep(rng):
    for width in range(0, 7):
        for height in range(0, 7):
            round_trip(random_image(rng, width, height, np.uint8))
            round_trip(random_image(rng, width, height, np.uint8, channels=3))


def test_smooth_image_compresses(rng):
    # A smooth gradient must compress well below raw size (in-range phase-in
    # codes dominate); sanity-checks the adaptive machinery end to end.
    x = np.linspace(0, 255, 64, dtype=np.uint8)
    image = np.tile(x, (64, 1)) + rng.integers(0, 2, size=(64, 64)).astype(np.uint8)
    data = round_trip(image)
    assert len(data) < image.size * 0.6


def test_header_matches_image(rng):
    image = random_image(rng, 9, 4, np.uint16, channels=3)
    data = compress_image_bytes(image, backend="oracle")
    h = read_header_bytes(data)
    assert (h.width, h.height) == (9, 4)
    assert h.num_channels == 3


def test_rgb_constant_image():
    image = np.full((8, 8, 3), 200, dtype=np.uint8)
    data = round_trip(image)
    # 14-byte header + 3 channels x 64 bits raw preamble + tiny payload
    assert len(data) < 64


def test_truncated_stream_raises():
    from felics_tpu import errors

    image = np.random.default_rng(7).integers(0, 256, size=(16, 16)).astype(np.uint8)
    data = compress_image_bytes(image, backend="oracle")
    with pytest.raises(errors.DecompressionError):
        decompress_image_bytes(data[: len(data) // 2], backend="oracle")
