"""Container format tests (reference: src/compression/format.rs)."""

import io

import pytest

from felics_tpu import errors
from felics_tpu.format import (
    HEADER_SIZE,
    ColorType,
    Header,
    PixelDepth,
    header_bytes,
    read_header,
    read_header_bytes,
    write_header,
)


def test_header_round_trip():
    for color in ColorType:
        for depth in PixelDepth:
            h = Header(color, depth, 1920, 1080)
            data = header_bytes(h)
            assert len(data) == HEADER_SIZE == 14
            got = read_header_bytes(data)
            assert (got.color_type, got.pixel_depth, got.width, got.height) == (
                color, depth, 1920, 1080,
            )


def test_header_layout():
    # FLCS magic, color byte, depth byte, BE u32 width, BE u32 height.
    data = header_bytes(Header(ColorType.RGB, PixelDepth.SIXTEEN, 0x01020304, 7))
    assert data[:4] == b"FLCS"
    assert data[4] == 1
    assert data[5] == 1
    assert data[6:10] == bytes([1, 2, 3, 4])
    assert data[10:14] == bytes([0, 0, 0, 7])


def test_bad_magic():
    with pytest.raises(errors.InvalidSignature):
        read_header_bytes(b"NOPE" + b"\x00" * 10)


def test_bad_color_type():
    data = bytearray(header_bytes(Header(ColorType.GRAY, PixelDepth.EIGHT, 1, 1)))
    data[4] = 9
    with pytest.raises(errors.InvalidColorType):
        read_header_bytes(bytes(data))


def test_bad_pixel_depth():
    data = bytearray(header_bytes(Header(ColorType.GRAY, PixelDepth.EIGHT, 1, 1)))
    data[5] = 7
    with pytest.raises(errors.InvalidPixelDepth):
        read_header_bytes(bytes(data))


def test_truncated_header():
    with pytest.raises(errors.IoError):
        read_header_bytes(b"FLCS\x00")


def test_header_only_read_leaves_payload(tmp_path):
    # Metadata probe must not consume payload bytes.
    stream = io.BytesIO(
        header_bytes(Header(ColorType.GRAY, PixelDepth.EIGHT, 3, 2)) + b"PAYLOAD"
    )
    h = read_header(stream)
    assert (h.width, h.height) == (3, 2)
    assert stream.read() == b"PAYLOAD"
