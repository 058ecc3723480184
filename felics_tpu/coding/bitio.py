"""MSB-first (big-endian) bit I/O.

Semantics match the ``bitstream-io`` crate's ``BitWriter<W, BigEndian>`` /
``BitReader<R, BigEndian>`` as used by the reference
(src/compression.rs:270,296,358,385): bits fill each byte from the most
significant bit down; multi-bit writes emit the value's bits MSB-first;
``write_signed(32, v)`` emits the 32-bit two's complement pattern MSB-first;
``byte_align`` pads the current byte with zero bits.

``BitStringLogger`` is the test double in the spirit of the reference's
``BitWriterMock`` (src/coding/bitwrite_mock.rs:6-89) but logs in true stream
order (the mock logs multi-bit writes LSB-first; golden strings ported from
its tests are converted — see tests/test_rice.py).
"""

from __future__ import annotations

from felics_tpu import errors


class BitWriter:
    """Accumulates bits MSB-first into a bytearray."""

    __slots__ = ("_buf", "_acc", "_nbits")

    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0  # bit accumulator, MSB side = oldest
        self._nbits = 0  # number of bits currently in _acc

    def write_bit(self, bit: int) -> None:
        self._acc = (self._acc << 1) | (bit & 1)
        self._nbits += 1
        if self._nbits == 8:
            self._buf.append(self._acc)
            self._acc = 0
            self._nbits = 0

    def write(self, nbits: int, value: int) -> None:
        """Write the low ``nbits`` bits of ``value``, MSB-first."""
        if nbits == 0:
            return
        value &= (1 << nbits) - 1
        self._acc = (self._acc << nbits) | value
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._buf.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_unary0(self, value: int) -> None:
        """``value`` one-bits followed by a terminating zero bit.

        Matches bitstream-io ``write_unary0`` as exercised by the reference
        golden test (src/coding/rice_coding.rs:76-77: k=0, v=12 ->
        ``111111111111`` + ``0``).
        """
        while value >= 32:
            self.write(32, 0xFFFFFFFF)
            value -= 32
        self.write(value + 1, ((1 << value) - 1) << 1)

    def write_signed32(self, value: int) -> None:
        self.write(32, value & 0xFFFFFFFF)

    def byte_align(self) -> None:
        if self._nbits:
            self.write(8 - self._nbits, 0)

    @property
    def bit_length(self) -> int:
        return len(self._buf) * 8 + self._nbits

    def getvalue(self) -> bytes:
        """Return the byte-aligned content (call byte_align first to flush)."""
        if self._nbits:
            raise ValueError("stream not byte-aligned; call byte_align()")
        return bytes(self._buf)


class BitReader:
    """Reads bits MSB-first from a bytes-like object."""

    __slots__ = ("_data", "_pos", "_bitlen")

    def __init__(self, data: bytes, start_bit: int = 0) -> None:
        self._data = data
        self._pos = start_bit
        self._bitlen = len(data) * 8

    @property
    def bit_position(self) -> int:
        return self._pos

    def read_bit(self) -> int:
        if self._pos >= self._bitlen:
            raise errors.IoError("unexpected end of bitstream")
        byte = self._data[self._pos >> 3]
        bit = (byte >> (7 - (self._pos & 7))) & 1
        self._pos += 1
        return bit

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        if self._pos + nbits > self._bitlen:
            raise errors.IoError("unexpected end of bitstream")
        result = 0
        pos = self._pos
        data = self._data
        remaining = nbits
        while remaining > 0:
            byte_idx = pos >> 3
            bit_off = pos & 7
            take = min(8 - bit_off, remaining)
            byte = data[byte_idx]
            chunk = (byte >> (8 - bit_off - take)) & ((1 << take) - 1)
            result = (result << take) | chunk
            pos += take
            remaining -= take
        self._pos = pos
        return result

    def read_unary0(self) -> int:
        count = 0
        while True:
            if self.read_bit() == 0:
                return count
            count += 1

    def read_signed32(self) -> int:
        raw = self.read(32)
        return raw - (1 << 32) if raw & (1 << 31) else raw


class BitStringLogger:
    """Records written bits as a '0'/'1' string in true stream order."""

    __slots__ = ("_bits",)

    def __init__(self) -> None:
        self._bits = []

    def write_bit(self, bit: int) -> None:
        self._bits.append("1" if bit & 1 else "0")

    def write(self, nbits: int, value: int) -> None:
        for shift in range(nbits - 1, -1, -1):
            self.write_bit((value >> shift) & 1)

    def write_unary0(self, value: int) -> None:
        self._bits.append("1" * value)
        self._bits.append("0")

    def write_signed32(self, value: int) -> None:
        self.write(32, value & 0xFFFFFFFF)

    def content(self) -> str:
        return "".join(self._bits)
