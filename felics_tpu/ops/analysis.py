"""Vectorized per-pixel analysis and codeword symbolization.

Everything the reference computes inside its serial hot loop
(src/compression.rs:117-146) that does NOT depend on coder state is computed
here for every pixel at once: causal neighbours, context Δ = H-L, the
in/below/above classification, the residual, and — given the adaptive k per
pixel from the kscan — the final codeword as a fixed-layout symbol:

    symbol = (a_val, a_len) ++ (q ones) ++ (b_val, b_len)

  * in-range pixel:  a = marker '1' (1 bit), q = 0,
                     b = phase-in code of p-L over n = Δ+1 (≤ 18 bits)
  * below range:     a = marker '00' (2 bits), v = L-p-1, q = v >> k,
                     b = terminating '0' + k low bits of v (k+1 bits)
  * above range:     a = marker '01' (2 bits), v = p-H-1, likewise
  * raw preamble:    pixel 0 carries both raw 32-bit first pixels as
                     a = p0 (32 bits), q = 0, b = p1 (32 bits); pixel 1
                     is empty. (reference: src/compression.rs:104-107)

This fixed layout bounds every symbol's explicit bits at 32+32 while leaving
the unboundedly long unary run implicit — the bitpacker materializes runs by
interval diff + prefix sum instead of per-bit writes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from felics_tpu.config import CodingConfig
from felics_tpu.core.context import neighbour_indices


class Analysis(NamedTuple):
    context: jnp.ndarray  # int32[N] Δ = H - L (0 for the first two pixels)
    low: jnp.ndarray  # int32[N]
    high: jnp.ndarray  # int32[N]
    oor: jnp.ndarray  # bool[N] True where out-of-range (needs Rice coding)
    residual: jnp.ndarray  # int32[N] v = L-p-1 or p-H-1 (0 if in-range)
    in_range: jnp.ndarray  # bool[N]
    above: jnp.ndarray  # bool[N]


class Symbols(NamedTuple):
    a_val: jnp.ndarray  # uint32[N]
    a_len: jnp.ndarray  # int32[N]
    q: jnp.ndarray  # int32[N] length of the implicit run of one-bits
    b_val: jnp.ndarray  # uint32[N]
    b_len: jnp.ndarray  # int32[N]

    @property
    def total_len(self):
        return self.a_len + self.q + self.b_len


def analyze_channel(channel: jnp.ndarray, height: int, width: int) -> Analysis:
    """Per-pixel context/classification for a flat int32 raster channel."""
    n = height * width
    a_idx, b_idx = neighbour_indices(height, width, xp=jnp)
    v1 = channel[a_idx]
    v2 = channel[b_idx]
    high = jnp.maximum(v1, v2)
    low = jnp.minimum(v1, v2)
    context = high - low

    p = channel
    first_two = jnp.arange(n, dtype=jnp.int32) < 2
    in_range = (p >= low) & (p <= high) & ~first_two
    below = (p < low) & ~first_two
    above = (p > high) & ~first_two
    oor = below | above
    residual = jnp.where(below, low - p - 1, jnp.where(above, p - high - 1, 0))
    return Analysis(
        context=context.astype(jnp.int32),
        low=low,
        high=high,
        oor=oor,
        residual=residual.astype(jnp.int32),
        in_range=in_range,
        above=above,
    )


def phase_in_code(n: jnp.ndarray, value: jnp.ndarray):
    """Vectorized phase-in codeword (val, len) over domain [0, n-1].

    Mirrors felics_tpu.coding.phase_in.PhaseInCoder.encode elementwise.
    """
    n = n.astype(jnp.int32)
    m = 31 - jax.lax.clz(n)
    left_p = n - (1 << m)
    right_p = (1 << (m + 1)) - n
    r = (value + n - left_p) % n
    short = r < right_p
    off = r - right_p
    long_val = ((((off >> 1) + right_p) << 1) | (off & 1)).astype(jnp.int32)
    code_val = jnp.where(short, r, long_val)
    code_len = jnp.where(short, m, m + 1)
    return code_val.astype(jnp.uint32), code_len.astype(jnp.int32)


def symbolize(
    analysis: Analysis,
    channel: jnp.ndarray,
    k: jnp.ndarray,
    height: int,
    width: int,
) -> Symbols:
    """Materialize per-pixel codeword symbols given the adaptive k array.

    Assumes the non-degenerate case width*height >= 2 (edge cases are
    handled by the caller; reference: src/compression.rs:92-108).
    """
    n = height * width
    idx = jnp.arange(n, dtype=jnp.int32)

    # Range markers (reference: src/compression.rs:29-45).
    a_val = jnp.where(analysis.in_range, 1, jnp.where(analysis.above, 0b01, 0b00))
    a_len = jnp.where(analysis.in_range, 1, 2)

    phase_val, phase_len = phase_in_code(analysis.context + 1, channel - analysis.low)

    k = k.astype(jnp.int32)
    v = analysis.residual
    q = jnp.where(analysis.oor, v >> k, 0)
    remainder = (v & ((1 << k) - 1)).astype(jnp.uint32)

    b_val = jnp.where(analysis.in_range, phase_val, remainder)
    b_len = jnp.where(analysis.in_range, phase_len, k + 1)

    # First two pixels: raw 32-bit preamble packed into symbol 0.
    p0 = channel[0].astype(jnp.uint32)
    p1 = jnp.where(n > 1, channel[1], 0).astype(jnp.uint32)
    is0 = idx == 0
    is1 = idx == 1
    a_val = jnp.where(is0, p0, jnp.where(is1, 0, a_val)).astype(jnp.uint32)
    a_len = jnp.where(is0, 32, jnp.where(is1, 0, a_len)).astype(jnp.int32)
    q = jnp.where(is0 | is1, 0, q).astype(jnp.int32)
    b_val = jnp.where(is0, p1, jnp.where(is1, 0, b_val)).astype(jnp.uint32)
    b_len = jnp.where(is0, 32, jnp.where(is1, 0, b_len)).astype(jnp.int32)

    return Symbols(a_val=a_val, a_len=a_len, q=q, b_val=b_val, b_len=b_len)
