"""Parallel bitstream packing.

Replaces the reference's serial big-endian bit writer
(bitstream-io BitWriter, used at src/compression.rs:270,358) with a
data-parallel construction over 32-bit words:

  1. exclusive prefix-sum over per-symbol bit lengths → every symbol's start
     offset (and the exact total bit count);
  2. each symbol's explicit parts (≤ 32 bits each: marker + phase-in / Rice
     tail, or the raw 32-bit preamble words) straddle at most two output
     words — two masked scatter-ADDs per part (bit-disjoint contributions, so
     integer add == bitwise or);
  3. unary one-runs (Rice quotients, unbounded length): interior full words
     via a +1/-1 word-interval diff + prefix sum, the ≤ 2 partial edge words
     via two more mask scatter-adds;
  4. bytes = big-endian split of the words, trimmed to the byte-aligned
     total (byte_align zero padding falls out of the zero-initialized plane).

Every step is a dense XLA op (cumsum / segmented scatter-add / reshape); no
per-bit work anywhere, so packing runs at memory bandwidth regardless of
codeword lengths.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from felics_tpu.ops.analysis import Symbols

_ONES = jnp.uint32(0xFFFFFFFF)


@jax.jit
def symbol_offsets(symbols: Symbols):
    """Exclusive prefix sum of symbol lengths; returns (offsets, total_bits)."""
    lens = symbols.total_len
    ends = jnp.cumsum(lens, dtype=jnp.int32)
    offsets = ends - lens
    total = ends[-1] if lens.shape[0] else jnp.int32(0)
    return offsets, total


def _shl(value, amount):
    """uint32 << amount with well-defined 0 for amount >= 32."""
    amount = amount.astype(jnp.uint32)
    return jnp.where(amount < 32, value << jnp.minimum(amount, 31), jnp.uint32(0))


def _shr(value, amount):
    """uint32 >> amount (logical) with well-defined 0 for amount >= 32."""
    amount = amount.astype(jnp.uint32)
    return jnp.where(amount < 32, value >> jnp.minimum(amount, 31), jnp.uint32(0))


@partial(jax.jit, static_argnames=("b_pad",))
def pack_bits(symbols: Symbols, offsets: jnp.ndarray, b_pad: int) -> jnp.ndarray:
    """Materialize the byte stream. ``b_pad``: static bit-capacity (multiple
    of 32) >= total bits, host-synced and bucketized. Returns uint8[b_pad//8].
    """
    assert b_pad % 32 == 0
    num_words = b_pad // 32
    acc = jnp.zeros((num_words,), jnp.uint32)

    def add_part(acc, value, length, start):
        # Left-align the part's bits in a 32-bit lane, split across the two
        # words it may straddle, and scatter-add (bit-disjoint => add == or).
        value = value.astype(jnp.uint32)
        aligned = jnp.where(length > 0, _shl(value, 32 - length), jnp.uint32(0))
        w0 = start >> 5
        bit_off = start & 31
        c0 = _shr(aligned, bit_off)
        c1 = jnp.where(bit_off > 0, _shl(aligned, 32 - bit_off), jnp.uint32(0))
        acc = acc.at[w0].add(c0, mode="drop")
        acc = acc.at[w0 + 1].add(c1, mode="drop")
        return acc

    acc = add_part(acc, symbols.a_val, symbols.a_len, offsets)
    b_start = offsets + symbols.a_len + symbols.q
    acc = add_part(acc, symbols.b_val, symbols.b_len, b_start)

    # Unary one-runs [rs, re).
    rs = offsets + symbols.a_len
    re = rs + symbols.q
    has = symbols.q > 0
    head_w = rs >> 5
    head_start = rs & 31
    head_cap = jnp.minimum(re - (head_w << 5), 32)  # end bit within head word
    head_mask = _shr(_ONES, head_start) & ~_shr(_ONES, head_cap)
    acc = acc.at[jnp.where(has, head_w, num_words)].add(
        jnp.where(has, head_mask, jnp.uint32(0)), mode="drop"
    )
    tail_w = re >> 5
    tail_end = re & 31
    tail_valid = has & (tail_w > head_w) & (tail_end > 0)
    tail_mask = ~_shr(_ONES, tail_end)
    acc = acc.at[jnp.where(tail_valid, tail_w, num_words)].add(
        jnp.where(tail_valid, tail_mask, jnp.uint32(0)), mode="drop"
    )
    # Interior full words [ceil(rs/32), floor(re/32)).
    full_lo = (rs + 31) >> 5
    full_hi = tail_w
    span = has & (full_hi > full_lo)
    diff = jnp.zeros((num_words + 1,), jnp.int32)
    diff = diff.at[jnp.where(span, full_lo, num_words)].add(
        jnp.where(span, 1, 0), mode="drop"
    )
    diff = diff.at[jnp.where(span, full_hi, num_words)].add(
        jnp.where(span, -1, 0), mode="drop"
    )
    full = jnp.cumsum(diff[:-1], dtype=jnp.int32) > 0
    words = acc | jnp.where(full, _ONES, jnp.uint32(0))

    # Big-endian byte split.
    shifted = jnp.stack(
        [words >> 24, words >> 16, words >> 8, words], axis=1
    ).astype(jnp.uint8)
    return shifted.reshape(-1)


def bucket_bits(total_bits: int, minimum: int = 1 << 12) -> int:
    """Round total bits up to a word-aligned bucket (1/8-power-of-two
    granularity: ≤8 jit variants per octave, <12.5% padding waste)."""
    if total_bits <= minimum:
        return minimum
    gran = max(minimum // 8, 1 << max(8, total_bits.bit_length() - 3))
    return -(-total_bits // gran) * gran
