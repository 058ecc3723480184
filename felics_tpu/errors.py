"""Error types for decompression.

Mirrors the reference's error surface (reference: src/compression/error.rs:4-25)
as a Python exception hierarchy so callers can catch one base type or match a
specific failure mode. Unlike the reference (whose decoder can still panic on a
pathological Rice quotient, see src/coding/rice_coding.rs:49), every malformed
input path here raises ``DecompressionError``.
"""


class DecompressionError(Exception):
    """Base class for all decompression failures."""


class IoError(DecompressionError):
    """The underlying stream ended prematurely or could not be read."""


class InvalidValue(DecompressionError):
    """A decoded value does not fit the image bit-depth."""


class ValueOverflow(DecompressionError):
    """An overflow occurred during arithmetic on decoded values."""


class InvalidDimensions(DecompressionError):
    """The channel dimensions are invalid."""


class InvalidColorType(DecompressionError):
    """The file declares a color type we do not support."""


class InvalidPixelDepth(DecompressionError):
    """The file declares a pixel depth we do not support."""


class InvalidSignature(DecompressionError):
    """The file signature does not match a felics file."""
