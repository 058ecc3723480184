"""Native (C++, threaded) FLCT codec: byte-identical to the JAX tiled codec."""

import numpy as np
import pytest

from felics_tpu.api import header_for_array
from felics_tpu.config import TileConfig
from felics_tpu.parallel import tiling


@pytest.fixture(scope="module", autouse=True)
def built_native():
    import subprocess
    import sys

    subprocess.run([sys.executable, "native/build.py"], check=True)
    from felics_tpu.native import runtime

    runtime._load_attempted = False
    runtime._lib = None
    assert runtime.available()


def images(rng):
    for shape, dtype in [
        ((48, 48), np.uint8),
        ((33, 47, 3), np.uint8),
        ((40, 24), np.uint16),
        ((21, 19, 3), np.uint16),
        ((5, 3), np.uint8),
    ]:
        yield rng.integers(0, np.iinfo(dtype).max + 1, size=shape).astype(dtype)
        smooth = np.cumsum(np.cumsum(rng.integers(-6, 7, shape), 0), 1) + 120
        yield np.clip(smooth, 0, np.iinfo(dtype).max).astype(dtype)


def test_native_tiled_matches_jax_bytes(rng):
    from felics_tpu.native import runtime

    for im in images(rng):
        nat = runtime.compress_tiled(im, header_for_array(im), 16, 16, 4)
        jx = tiling.compress_tiled_bytes(im, TileConfig(tile_h=16, tile_w=16))
        assert nat == jx, (im.shape, im.dtype)


def test_native_tiled_round_trip(rng):
    from felics_tpu.native import runtime

    for im in images(rng):
        data = runtime.compress_tiled(im, header_for_array(im), 16, 16, 4)
        out = runtime.decompress_tiled(data, 4)
        np.testing.assert_array_equal(out, im)
        assert out.dtype == im.dtype


def test_cross_decode(rng):
    """JAX-encoded FLCT decodes with the native core and vice versa."""
    from felics_tpu.native import runtime

    im = np.clip(
        np.cumsum(np.cumsum(rng.integers(-5, 6, (64, 48, 3)), 0), 1) + 128, 0, 255
    ).astype(np.uint8)
    jx = tiling.compress_tiled_bytes(im, TileConfig(tile_h=16, tile_w=16))
    np.testing.assert_array_equal(runtime.decompress_tiled(jx, 4), im)
    nat = runtime.compress_tiled(im, header_for_array(im), 16, 16, 4)
    np.testing.assert_array_equal(tiling.decompress_tiled_bytes(nat), im)


def test_api_dispatch_native_flct(rng):
    from felics_tpu.api import compress_image_bytes, decompress_image_bytes

    im = rng.integers(0, 256, size=(24, 24)).astype(np.uint8)
    data = compress_image_bytes(im, backend="native", container="flct")
    assert data[:4] == b"FLCT"
    out = decompress_image_bytes(data, backend="native")
    np.testing.assert_array_equal(out, im)


def test_corrupt_tile_errors(rng):
    from felics_tpu import errors
    from felics_tpu.native import runtime

    im = rng.integers(0, 256, size=(32, 32)).astype(np.uint8)
    data = bytearray(runtime.compress_tiled(im, header_for_array(im), 16, 16, 2))
    data = data[: len(data) // 2]  # truncate payload
    with pytest.raises(errors.DecompressionError):
        runtime.decompress_tiled(bytes(data), 2)
