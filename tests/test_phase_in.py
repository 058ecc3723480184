"""Phase-in coder golden + round-trip tests.

Constructor internals and golden code tables come from the reference tests
(src/coding/phase_in_coding.rs:137-161, 186-225). The golden tables there are
in BitWriterMock order (multi-bit groups LSB-first); ``mock_to_msb`` converts
each codeword to true stream order: a short codeword is one m-bit group
(reverse it); a long codeword is an m-bit group plus a trailing single bit
(reverse the group, keep the trailing bit).
"""

import pytest

from felics_tpu.coding.bitio import BitReader, BitStringLogger, BitWriter
from felics_tpu.coding.phase_in import PhaseInCoder

GOLDEN_MOCK = {
    7: ["011", "110", "111", "00", "100", "101", "010"],
    8: ["000", "100", "010", "110", "001", "101", "011", "111"],
    9: ["1111", "000", "100", "010", "110", "001", "101", "011", "1110"],
    15: [
        "0011", "1010", "1011", "0110", "0111", "1110", "1111", "000",
        "1000", "1001", "0100", "0101", "1100", "1101", "0010",
    ],
    16: [
        "0000", "1000", "0100", "1100", "0010", "1010", "0110", "1110",
        "0001", "1001", "0101", "1101", "0011", "1011", "0111", "1111",
    ],
    17: [
        "11111", "0000", "1000", "0100", "1100", "0010", "1010", "0110",
        "1110", "0001", "1001", "0101", "1101", "0011", "1011", "0111",
        "11110",
    ],
}


def mock_to_msb(code: str, m: int) -> str:
    if len(code) == m:
        return code[::-1]
    assert len(code) == m + 1
    return code[:m][::-1] + code[m]


def encode_to_string(coder: PhaseInCoder, value: int) -> str:
    logger = BitStringLogger()
    coder.encode(logger, value)
    return logger.content()


def test_constructor_internals():
    # (n, m, left_p, right_p) from src/coding/phase_in_coding.rs:137-161
    for n, m, left_p, right_p in [
        (1, 0, 0, 1),
        (7, 2, 3, 1),
        (15, 3, 7, 1),
        (32, 5, 0, 32),
    ]:
        coder = PhaseInCoder(n)
        assert (coder.n, coder.m, coder.left_p, coder.right_p) == (
            n, m, left_p, right_p,
        )


def test_invalid_n():
    with pytest.raises(ValueError):
        PhaseInCoder(0)
    with pytest.raises(ValueError):
        PhaseInCoder(1 << 31)


def test_out_of_range_value():
    coder = PhaseInCoder(15)
    with pytest.raises(ValueError):
        coder.encode(BitWriter(), 15)


def test_golden_code_tables():
    for n, mock_codes in GOLDEN_MOCK.items():
        coder = PhaseInCoder(n)
        expected = [mock_to_msb(c, coder.m) for c in mock_codes]
        got = [encode_to_string(coder, v) for v in range(n)]
        assert got == expected, f"n={n}"


def test_code_length_matches():
    for n in list(range(1, 70)) + [511, 512, 1000, 131071]:
        coder = PhaseInCoder(n)
        sample = range(n) if n < 200 else range(0, n, max(1, n // 97))
        for v in sample:
            assert len(encode_to_string(coder, v)) == coder.code_length(v)


def test_round_trip(rng):
    for n in [1, 2, 3, 7, 8, 9, 100, 511, 1000]:
        coder = PhaseInCoder(n)
        domain = rng.permutation(n)
        writer = BitWriter()
        for v in domain:
            coder.encode(writer, int(v))
        writer.byte_align()
        reader = BitReader(writer.getvalue())
        for v in domain:
            assert coder.decode(reader) == int(v)


def test_n_one_zero_length_code():
    # n=1: m=0, right_p=1 -> the single value 0 encodes in zero bits.
    coder = PhaseInCoder(1)
    assert encode_to_string(coder, 0) == ""
    reader = BitReader(b"")
    assert coder.decode(reader) == 0
