"""Rice coder golden + round-trip tests.

Golden bitstrings derive from the reference tests
(src/coding/rice_coding.rs:69-82). The reference's BitWriterMock logs
multi-bit writes LSB-first (src/coding/bitwrite_mock.rs:30-41); our logger
records true MSB-first stream order, so the k-bit remainder groups below are
the mock strings with the remainder group reversed.
"""

import pytest

from felics_tpu.coding.bitio import BitReader, BitStringLogger, BitWriter
from felics_tpu.coding.rice import RiceCoder, rice_code_length


def encode_to_string(k, value):
    logger = BitStringLogger()
    RiceCoder(k).encode(logger, value)
    return logger.content()


def test_rice_encoding_golden():
    # mock "01110" = unary0(0)="0" + write(4, 7) LSB-first "1110" -> MSB "0111"
    assert encode_to_string(4, 7) == "00111"
    # k=0: no remainder bits; identical in both orders
    assert encode_to_string(0, 12) == "1111111111110"
    # mock "10010" = unary0(1)="10" + write(3, 2) "010" (palindrome)
    assert encode_to_string(3, 10) == "10010"


def test_rice_k_out_of_range():
    with pytest.raises(ValueError):
        RiceCoder(32)


def test_rice_round_trip():
    writer = BitWriter()
    coders = [RiceCoder(4), RiceCoder(0), RiceCoder(3)]
    values = [7, 12, 10]
    for coder, value in zip(coders, values):
        coder.encode(writer, value)
    writer.byte_align()
    reader = BitReader(writer.getvalue())
    for coder, value in zip(coders, values):
        assert coder.decode(reader) == value


def test_rice_round_trip_extensive(rng):
    numbers = rng.integers(0, 2 * 65536, size=4000)
    coder = RiceCoder(8)
    writer = BitWriter()
    for n in numbers:
        coder.encode(writer, int(n))
    writer.byte_align()
    reader = BitReader(writer.getvalue())
    for n in numbers:
        assert coder.decode(reader) == int(n)


def test_rice_code_length_matches_encoding():
    for number in range(0, 3000, 7):
        for k in range(0, 32):
            logger = BitStringLogger()
            RiceCoder(k).encode(logger, number)
            assert len(logger.content()) == rice_code_length(number, k)


def test_rice_long_unary():
    # k=0 worst case for 16-bit residuals: long unary runs must round-trip.
    coder = RiceCoder(0)
    writer = BitWriter()
    coder.encode(writer, 70000)
    writer.byte_align()
    reader = BitReader(writer.getvalue())
    assert coder.decode(reader) == 70000
