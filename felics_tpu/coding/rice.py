"""Golomb-Rice coding with power-of-two divisor M = 2^k.

Reference counterpart: src/coding/rice_coding.rs:19-58. Code layout for value
``n`` at parameter ``k``: the quotient ``n >> k`` in unary (that many one-bits
then a terminating zero bit), followed by the low ``k`` bits of ``n``
MSB-first. ``code_length(n) = (n >> k) + 1 + k`` without encoding.
"""

from __future__ import annotations

from felics_tpu import errors


def rice_code_length(value: int, k: int) -> int:
    return (value >> k) + 1 + k


class RiceCoder:
    __slots__ = ("k", "m", "mask")

    def __init__(self, k: int) -> None:
        if not 0 <= k <= 31:
            raise ValueError("k must be in [0, 31]")
        self.k = k
        self.m = 1 << k
        self.mask = self.m - 1

    def encode(self, bitwrite, value: int) -> None:
        bitwrite.write_unary0(value >> self.k)
        bitwrite.write(self.k, value & self.mask)

    def decode(self, bitread) -> int:
        quotient = bitread.read_unary0()
        remainder = bitread.read(self.k)
        result = quotient * self.m + remainder
        if result > 0xFFFFFFFF:
            # The reference panics here (src/coding/rice_coding.rs:49
            # checked_mul().unwrap()); we return a decode error instead.
            raise errors.ValueOverflow("rice quotient overflows u32")
        return result

    def code_length(self, value: int) -> int:
        return rice_code_length(value, self.k)
