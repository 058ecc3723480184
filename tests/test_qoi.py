"""Native QOI codec (spec: qoiformat.org) — structure + round-trip tests.

The reference's cross-format bench compares against qoi produced by
ImageMagick (bench/benchmark-small-corpus.py:39-69); this image has no
external tools, so the native core implements the one-page public spec and
these tests pin it: header layout, known-chunk encodings, exact round trips
over adversarial content, and corrupt-stream error paths.
"""

import struct

import numpy as np
import pytest

from felics_tpu.native import runtime


@pytest.fixture(scope="module", autouse=True)
def built_native():
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, os.path.join(repo, "native", "build.py")], check=True
    )
    runtime._load_attempted = False
    runtime._lib = None
    assert runtime.qoi_available()


def test_header_layout():
    img = np.zeros((2, 3, 3), np.uint8)
    data = runtime.qoi_encode(img)
    assert data[:4] == b"qoif"
    w, h = struct.unpack(">II", data[4:12])
    assert (w, h) == (3, 2)
    assert data[12] == 3  # channels
    assert data[13] == 0  # sRGB colorspace
    assert data[-8:] == b"\x00" * 7 + b"\x01"


def test_run_and_index_chunks():
    # 124 identical pixels: first encodes via OP_LUMA ((9,9,9) from the
    # (0,0,0) start state: dg=9, dr-dg=db-dg=0 -> 2 bytes), then a max
    # 62-run and a 61-run (runs are biased -1).
    img = np.full((1, 124, 3), 9, np.uint8)
    data = runtime.qoi_encode(img)
    body = data[14:-8]
    assert body[0] & 0xC0 == 0x80 and len(body) == 4  # OP_LUMA, 2 bytes
    assert body[2] == 0xC0 | 61  # max run 62
    assert body[3] == 0xC0 | 60  # remaining 61

    # A repeated earlier color hits the 64-entry index cache.
    px = np.array([[10, 20, 30], [50, 60, 70], [10, 20, 30]], np.uint8)
    data2 = runtime.qoi_encode(px.reshape(1, 3, 3))
    body2 = data2[14:-8]
    assert body2[-1] & 0xC0 == 0x00  # OP_INDEX for the third pixel


@pytest.mark.parametrize("channels", [3, 4])
def test_round_trip_random(channels):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (37, 23, channels)).astype(np.uint8)
    out = runtime.qoi_decode(runtime.qoi_encode(img))
    np.testing.assert_array_equal(out, img)


def test_round_trip_smooth_and_gray_expansion():
    rng = np.random.default_rng(6)
    gray = np.clip(
        np.cumsum(np.cumsum(rng.integers(-4, 5, (40, 52)), 0), 1) + 128, 0, 255
    ).astype(np.uint8)
    rgb = np.stack([gray] * 3, axis=-1)
    data = runtime.qoi_encode(rgb)
    assert len(data) < rgb.nbytes  # smooth content must actually compress
    np.testing.assert_array_equal(runtime.qoi_decode(data), rgb)


def test_corrupt_streams():
    from felics_tpu import errors

    img = np.full((4, 4, 3), 5, np.uint8)
    data = bytearray(runtime.qoi_encode(img))
    with pytest.raises(errors.InvalidSignature):
        runtime.qoi_decode(b"nope" + bytes(data[4:]))
    with pytest.raises(errors.IoError):
        runtime.qoi_decode(bytes(data[:10]))
    # Truncated mid-body must error or decode to SOME (4,4,3) image, not crash.
    try:
        out = runtime.qoi_decode(bytes(data[:-9]))
        assert out.shape == (4, 4, 3)
    except errors.DecompressionError:
        pass
