"""Fused Pallas TPU kernels for the FLCT tile codec.

Why these exist: the XLA formulation of the per-tile sequential coding loop
(felics_tpu.parallel.tiling) pays a fixed dispatch cost for every small HLO
op inside ``lax.scan`` and serializes gathers/scatters per element on TPU —
measured ~150 us per decode step and ~60 ms for the scatter bit-packer on a
3072-tile batch. These kernels fuse the ENTIRE per-tile walk (context model,
adaptive-k table, phase-in/Rice coding, and the bit writer/reader) into
Mosaic programs, with all state resident in VMEM:

  * lanes = tiles (vector dimension): every tile's stream advances one pixel
    per ``fori_loop`` step, so the irreducibly sequential dependency chain
    runs in parallel across thousands of tiles;
  * the bitstream is per-lane COLUMNS of 32-bit words; a 32-word shift ring
    buffers word emits/fetches (a one-hot over only the ring rows), and
    ring<->stream traffic moves 16 words at a time through block-aligned
    selects — no gathers, no scatters, no per-step W-wide sweeps;
  * the adaptive-k estimator is a (num_buckets * num_k, B) carry updated
    with one masked add per step, replacing the kscan cumsum pass entirely;
  * the encoder walks pixels in chunks, one pallas_call per chunk, with the
    coder state threading between calls as plain arrays (the chunk index is
    a scalar-prefetch operand selecting the pixel block), so only an
    (SC, B) pixel slice occupies VMEM and the lane block B stays large.

Mosaic/toolchain pitfalls encountered and worked around here are catalogued
in docs/DESIGN.md §8 (unsigned reductions/min/selects, i1 while carries,
scratch-sourced loop carries, the ~16 MB scoped VMEM limit).

The bitstreams produced/consumed are byte-identical to the XLA pipeline
(ops.analysis symbolize + ops.bitpack) and to the native C++ FLCT codec —
pinned by tests/test_pallas_codec.py.

Reference behavior being reproduced (structure only, none of this code path
exists in the reference): per-pixel coding loop src/compression.rs:117-146,
k selection src/compression/parameter_selection.rs:71-85 (log-bucketed for
FLCT, see ops.kscan_tiled), phase-in src/coding/phase_in_coding.rs:59-112,
Rice src/coding/rice_coding.rs:26-58.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from felics_tpu.config import QCTX_CAP, CodingConfig
from felics_tpu.core.context import neighbour_indices

_I32_MAX = 0x7FFFFFFF  # plain int: jnp scalars would be captured kernel consts

# VMEM budget for choosing the lane-block size B (bytes; the probed ceiling
# on v5e is ~24-32 MB, but Mosaic needs sizeable headroom for the ring
# carries and spill temporaries — 12 MB is the largest that compiles).
import os as _os

_VMEM_BUDGET = int(
    _os.environ.get("FELICS_TPU_VMEM_BUDGET", 12 * 1024 * 1024)
)


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    # Off-TPU (tests on the 8-device CPU mesh) the kernels run through the
    # Pallas interpreter — same numerics, no Mosaic.
    return not on_tpu()


@functools.lru_cache(maxsize=256)
def _pick_chunk(t: int, target: int = 512) -> int:
    """Largest divisor of the plane size <= target: the pixel walk is split
    into S/SC grid steps so only an (SC, B) slice of the pixel data is VMEM-
    resident at a time (per-lane coder state persists in scratch). SC | t
    keeps each plane's raw preamble (pixels 0 and 1) inside one chunk."""
    best = 1
    for d in range(1, t + 1):
        if t % d == 0 and d <= target:
            best = d
    return best


def _best_block(bmax: int, nt) -> int:
    """Lane block <= bmax for nt lanes: minimize padded lanes (every padding
    lane costs real VPU work in every step), then minimize block count (the
    per-step scalar bookkeeping is paid once per block). nt=None -> bmax."""
    if nt is None:
        return bmax
    return min(
        range(128, bmax + 1, 128),
        key=lambda b: (-(-nt // b) * b, -(-nt // b)),
    )


def kernel_plan(
    cfg: CodingConfig, th: int, tw: int, c: int, W: int, nt=None,
    mosaic=None,
):
    """VMEM plan for the fused encode kernel: (SC, NR, B, n_chunks), or None
    when even a 128-lane block cannot fit (callers fall back to the XLA
    engine). ``nt``: actual lane count when known — B is then sized to it
    (see _best_block). ``mosaic``: whether the kernel will lower through
    Mosaic (enables its block-shape constraints); None = on_tpu().

    Accounting: double-buffered pixel chunk + stream block, single-buffered
    scratch (k-table, word ring, causal-neighbour ring, scalar state). The
    pixel-chunk size SC trades VMEM against per-call overhead: a smaller
    chunk means more pallas calls but frees VMEM for a larger lane block,
    which amortizes the per-step scalar bookkeeping over more lanes — so
    the plan searches chunk sizes for the one maximizing B."""
    t = th * tw
    nr = 1 << (2 * tw + 2 - 1).bit_length()  # pow2 ring covering 2*tw+2 rows
    nbk = (min(int(cfg.max_context).bit_length(), QCTX_CAP) + 1) * cfg.num_k
    nt_rows = -(-nbk // 8) * 8
    # The per-chunk call's VMEM (scoped limit ~16 MB): pixel chunk in (2x
    # pipelined), stream words in AND out (2x each), state arrays in AND out
    # (2x each), per-lane k-prior block in (2x) — conservative so multi-
    # lane-block grids never stack-OOM.
    state = nt_rows + 8 + _RING + nr
    best = None
    # Sweep knobs (docs/DESIGN.md §7.1 headroom table): pin the chunk
    # target / raise the lane-block cap without code edits.
    _tgt_env = _os.environ.get("FELICS_TPU_CHUNK_TARGET")
    targets = (int(_tgt_env),) if _tgt_env else (512, 256, 128, 64)
    bcap = int(_os.environ.get("FELICS_TPU_LANE_BLOCK_CAP", 2048))
    for tgt in targets:
        sc = _pick_chunk(t, tgt)
        if (on_tpu() if mosaic is None else mosaic) and (
            sc % 8 != 0 and sc != c * t
        ):
            # Mosaic block rule: the (SC, B) pixel-chunk block needs its
            # sublane dim divisible by 8 or equal to the full array dim —
            # tiny odd tile planes (e.g. 2x1 rgb) otherwise crash the
            # lowering; skip so such shapes fall back to the XLA engine.
            # Interpret mode (off-TPU) has no such constraint, so the gate
            # only binds where Mosaic actually compiles.
            continue
        per_lane = 4 * (2 * sc + 4 * W + 4 * state + 2 * c * nt_rows + 32)
        b = _VMEM_BUDGET // max(per_lane, 1)
        b = min(bcap, (b // 128) * 128)
        if b < 128:
            continue
        # Score by the FINAL lane block (after padding/block-count
        # minimization), preferring the larger chunk at equal B — a
        # smaller chunk whose raw VMEM bound is higher can end up at the
        # SAME final B while paying 2x the per-call ramp/state-IO (the
        # device trace showed 8x0.49 ms chunk calls where 4 sufficed).
        bf = _best_block(b, nt)
        if best is None or (bf, sc) > (best[0], best[1]):
            best = (bf, sc)
    if best is None:
        return None
    bf, sc = best
    return sc, nr, bf, (c * t) // sc


@functools.lru_cache(maxsize=64)
def _meta_arrays(th: int, tw: int, c: int, depth_bits: int):
    """Per-step prefetch scalars: the absolute row indices of the two causal
    neighbours (self for j < 2) and the preamble field width per plane
    (plane 0 unsigned ``depth`` bits; Co/Cg planes signed ``depth+1``-bit
    two's complement). The encode kernel consumes all three; decode needs
    only the neighbour rows (its plane walk is fully static — pass
    ``*meta[:2]``)."""
    t = th * tw
    a_idx, b_idx = neighbour_indices(th, tw, xp=np)
    i = np.arange(c * t, dtype=np.int64)
    j = (i % t).astype(np.int64)
    ch = i // t
    row_a = np.where(j >= 2, i - j + a_idx[j], i).astype(np.int32)
    row_b = np.where(j >= 2, i - j + b_idx[j], i).astype(np.int32)
    pre_w = (depth_bits + (ch > 0)).astype(np.int32)
    return row_a, row_b, pre_w


def _shl(v, s):
    # clamp in int32 (Mosaic has no unsigned vector min), shift in uint32
    s = s.astype(jnp.int32)
    sc = jnp.minimum(jnp.maximum(s, 0), 31).astype(jnp.uint32)
    return _selu(s < 32, v << sc, jnp.uint32(0))


def _shr(v, s):
    s = s.astype(jnp.int32)
    sc = jnp.minimum(jnp.maximum(s, 0), 31).astype(jnp.uint32)
    return _selu(s < 32, v >> sc, jnp.uint32(0))


def _bitlen(x):
    """bit_length for int32 x >= 0."""
    return jnp.where(x > 0, 32 - jax.lax.clz(x), 0)


def _selu(pred, x, y):
    """where() on uint32 operands via int32 bitcasts — Mosaic's jellyfish
    lowering CHECK-fails on vector selects of unsigned ints in some dataflows
    (layout.h arr.size() >= layout_rank), so every u32 select in the kernels
    routes through here."""
    bc = jax.lax.bitcast_convert_type
    shp = jnp.broadcast_shapes(jnp.shape(pred), jnp.shape(x), jnp.shape(y))

    def prep(v):
        v = jnp.broadcast_to(v, shp)  # tpu.bitcast rejects scalars
        return bc(v, jnp.int32) if v.dtype == jnp.uint32 else v

    return bc(jnp.where(pred, prep(x), prep(y)).astype(jnp.int32), jnp.uint32)


def _sum_u32(masked_i32, axis=0):
    """Sum a one-hot-masked int32 plane and reinterpret as uint32 (Mosaic has
    no unsigned reductions; exactly one contributor per lane keeps the bit
    pattern intact)."""
    return jax.lax.bitcast_convert_type(
        jnp.sum(masked_i32, axis=axis), jnp.uint32
    )


def _k_select_plan(K: int, depth_bits: int, t: int) -> int:
    """Bits to pack the k index below the cost for a fused single-reduce
    k-selection, or 0 when the packed value could overflow int32.

    Entry bound: a per-(tile, channel) table row sees at most t-2 updates
    (the preamble pixels never update) of at most max_context + K each —
    max_context = 2*(2^depth - 1) because the YCoCg chroma planes span
    (-2^d, 2^d), so a k=0 weight reaches the full context range (an
    earlier 2^depth-based form understated the chroma case by 2x; FLCT
    has no count halving, config.tiled_config_for_depth) — plus the
    k-prior seed (<= 4*(K-1)). (entry << kb) stays below 2^31 whenever
    the bound does; at t=1024, depth=16, K=15 the bound is 133,968,926 <
    2^27, so both depths keep the packed form."""
    kb = max(1, (K - 1).bit_length())
    bound = max(0, t - 2) * (2 * (1 << depth_bits) - 2 + K) + 4 * (K - 1)
    return kb if bound < (1 << (31 - kb)) else 0


def _k_select(table, match, k_rows, K: int, kb: int):
    """Per-lane k: smallest cumulative cost over matched rows, ties to the
    LARGEST k (reference: src/compression/parameter_selection.rs:71-85).

    kb > 0 packs (cost << kb) | (K-1-k) so ONE masked pass + ONE min-reduce
    replaces the three-pass min/compare/max formulation — the k-table sweep
    is the dominant per-step vector cost in both kernels."""
    if kb:
        comb = jnp.where(match, (table << kb) | (K - 1 - k_rows), _I32_MAX)
        return (K - 1) - (jnp.min(comb, axis=0) & ((1 << kb) - 1))
    cost = jnp.where(match, table, _I32_MAX)
    minv = jnp.min(cost, axis=0)
    return jnp.max(jnp.where(cost == minv[None, :], k_rows, -1), axis=0)


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


# Emit/fetch ring geometry: each lane buffers _RING words; _SPILL words move
# between the ring and the (W, B) stream block at a time, in G-aligned block
# selects (never a W-wide one-hot — that sweep dominated the first kernel
# version at ~W*B elements PER STEP; the ring makes it W*B per ~G*32 bits).
_RING = 32
_SPILL = 16


def _encode_kernel_body(
    row_a_ref,
    row_b_ref,
    pre_w_ref,
    ci_ref,
    il_ref,
    vals_ref,
    tab_in,
    st_in,
    ring_in,
    nbr_in,
    words_in,
    prior_ref,
    tab_out,
    st_out,
    ring_out,
    nbr_out,
    out_ref,
    lens_ref,
    *,
    SC: int,
    W: int,
    B: int,
    t: int,
    nb: int,
    K: int,
    NR: int,
    C: int,
    KB: int,
    PRE: bool,
):
    """One grid program: encode SC pixels of B tile streams. The host calls
    this once per chunk (ci_ref = chunk index drives the vals block choice;
    il_ref flags the last chunk); per-lane coder state arrives and leaves as
    plain input/output arrays — Mosaic's layout assignment CHECK-fails on
    values sourced from VMEM scratch, so no scratch is used at all.

    ``PRE`` (static): this chunk starts a plane (chunk base ≡ 0 mod t; SC | t
    so chunks never straddle planes). The two raw preamble pixels then run
    as straight-line code before the loop and the per-step body is the main
    coding step ONLY — the former 3-way ``lax.switch`` and the jmod/pre_w
    scalar reads are off the hot loop entirely. Two kernel variants compile
    (plane-start / interior) instead of one."""
    base = ci_ref[0] * SC
    R, G = _RING, _SPILL
    rows_r = jax.lax.broadcasted_iota(jnp.int32, (R, B), 0)
    NT = -(-(nb * K) // 8) * 8  # sublane-aligned k-table rows
    trow = jax.lax.broadcasted_iota(jnp.int32, (NT, B), 0)
    bucket_rows = jnp.where(trow < nb * K, trow // K, -1)  # pad rows inert
    k_rows = trow % K

    # Carry the stream block and neighbour ring through this chunk.
    out_ref[:] = words_in[:]
    nbr_out[:] = nbr_in[:]

    def spill(ring, spilled, need):
        """Move ring[0:G] of `need` lanes to out rows [spilled, spilled+G).

        spilled is always a multiple of G, so each lane hits exactly ONE
        G-aligned output block — a per-block select, no word-level one-hot."""
        half = ring[0:G, :]
        for blk in range(W // G):
            sel = ((spilled == blk * G) & need)[None, :]
            cur = out_ref[blk * G : (blk + 1) * G, :]
            out_ref[blk * G : (blk + 1) * G, :] = _selu(sel, half, cur)
        ring = _selu(
            need[None, :],
            jnp.concatenate([ring[G:, :], jnp.zeros((G, B), jnp.uint32)]),
            ring,
        )
        spilled = spilled + jnp.where(need, G, 0)
        return ring, spilled

    def maybe_spill(ring, spilled, wi):
        # Threshold leaves headroom for 4 steps x 2 unconditional emits
        # between cadenced checks (see step(): the vector->scalar any-reduce
        # is costly, so the main loop only checks every 4th step).
        def cond(st):
            ring, spilled = st
            return jnp.any(wi - spilled >= R - 12)

        def body(st):
            ring, spilled = st
            return spill(ring, spilled, (wi - spilled) >= G)

        return jax.lax.while_loop(cond, body, (ring, spilled))

    def append(state, val, ln):
        """Append per-lane (val, ln<=32 bits); emit full words into the ring
        at slot (wi - spilled) — a one-hot over only R rows."""
        acc0, acc1, nbits, wi, ring, spilled = state
        val = _selu(ln > 0, val, jnp.uint32(0))
        sh = 64 - nbits - ln  # >= 1 (nbits <= 31, ln <= 32)
        hi = _selu(sh >= 32, _shl(val, sh - 32), _shr(val, 32 - sh))
        lo = _selu(sh >= 32, jnp.uint32(0), _shl(val, sh))
        acc0 = acc0 | hi
        acc1 = acc1 | lo
        nbits = nbits + ln
        emit = nbits >= 32
        hit = (rows_r == (wi - spilled)[None, :]) & emit[None, :]
        ring = ring | _selu(hit, acc0[None, :], jnp.uint32(0))
        acc0 = _selu(emit, acc1, acc0)
        acc1 = _selu(emit, jnp.uint32(0), acc1)
        wi = wi + emit.astype(jnp.int32)
        nbits = nbits - 32 * emit.astype(jnp.int32)
        return (acc0, acc1, nbits, wi, ring, spilled)

    def step_core(i, carry):
        """One main coding step WITHOUT the ring-headroom check — the caller
        owns the every-4th-step spill cadence (macro_step hoists it to one
        unconditional check per 4 unrolled steps; the generic fallback loop
        keeps the per-step cond). The spill threshold (R-12) covers the
        up-to-8 emits between cadenced checks (the unary drain loop
        re-checks internally every iteration)."""
        table, state = carry
        gi = base + i
        # Every step publishes its pixel row to the causal-neighbour ring
        # (rows at most 2*tw back are read; NR > 2*tw so slots never collide
        # with still-needed rows).
        nbr_out[gi & (NR - 1), :] = vals_ref[i, :]

        def main(table, state):
            p = vals_ref[i, :]
            va = nbr_out[row_a_ref[gi] & (NR - 1), :]
            vb = nbr_out[row_b_ref[gi] & (NR - 1), :]
            h = jnp.maximum(va, vb)
            l = jnp.minimum(va, vb)
            ctx = h - l
            qc = jnp.minimum(_bitlen(ctx), nb - 1)

            match = bucket_rows == qc[None, :]
            k = _k_select(table, match, k_rows, K, KB)

            in_range = (p >= l) & (p <= h)
            below = p < l
            v = jnp.where(below, l - p - 1, p - h - 1)

            # k-table update for out-of-range pixels (all candidate columns;
            # reference: src/compression/parameter_selection.rs:49-57).
            upd = match & (~in_range)[None, :]
            add = jnp.where(upd, (v[None, :] >> k_rows) + 1 + k_rows, 0)
            table = table + add

            # Symbol parts (layout identical to ops.analysis.symbolize).
            a_val = jnp.where(in_range, 1, jnp.where(below, 0, 1)).astype(
                jnp.uint32
            )
            a_len = jnp.where(in_range, 1, 2)
            nn = ctx + 1
            m = _bitlen(nn) - 1
            left_p = nn - (1 << m)
            right_p = (1 << (m + 1)) - nn
            x = p - l + nn - left_p
            r = x - jnp.where(x >= nn, nn, 0)
            short = r < right_p
            off2 = r - right_p
            long_val = (((off2 >> 1) + right_p) << 1) | (off2 & 1)
            pv = jnp.where(short, r, long_val)
            plen = jnp.where(short, m, m + 1)
            q = jnp.where(in_range, 0, v >> k)
            bv = jnp.where(in_range, pv, v & ((1 << k) - 1)).astype(jnp.uint32)
            blen = jnp.where(in_range, plen, k + 1)

            total = a_len + q + blen
            small = total <= 32
            qs = jnp.where(small, q, 0)
            merged = (
                _shl(a_val, qs + blen)
                | _shl(_shr(jnp.uint32(0xFFFFFFFF), 32 - qs), blen)
                | bv
            )
            p1v = _selu(small, merged, a_val)
            p1l = jnp.where(small, total, a_len)
            state = append(state, p1v, p1l)

            q_rem = jnp.where(small, 0, q)

            def rare(state):
                # Some lane's symbol exceeds 32 bits: drain its unary run in
                # word-size chunks, then append the Rice remainder. Fused
                # under ONE any-reduce — the common all-small step skips the
                # whole path (and its while-cond reduce) with a single check.
                def any_q(st):
                    return jnp.any(st[1] > 0)

                def drain(st):
                    state, q_rem = st
                    acc0, acc1, nbits, wi, ring, spilled = state
                    ring, spilled = maybe_spill(ring, spilled, wi)
                    state = (acc0, acc1, nbits, wi, ring, spilled)
                    chunk = jnp.minimum(q_rem, 32)
                    ones = _shr(jnp.uint32(0xFFFFFFFF), 32 - chunk)
                    return append(state, ones, chunk), q_rem - chunk

                state, _ = jax.lax.while_loop(any_q, drain, (state, q_rem))
                p2l = jnp.where(small, 0, blen)
                return append(state, bv, p2l)

            state = jax.lax.cond(
                jnp.any(~small), rare, lambda s: s, state
            )
            return table, state

        return main(table, state)

    def step(i, carry):
        # Generic path: per-step cadenced spill check + one coding step.
        table, state = carry
        acc0, acc1, nbits, wi, ring, spilled = state
        ring, spilled = jax.lax.cond(
            (i & 3) == 0,
            lambda rs: maybe_spill(rs[0], rs[1], wi),
            lambda rs: rs,
            (ring, spilled),
        )
        return step_core(i, (table, (acc0, acc1, nbits, wi, ring, spilled)))

    def macro_step(base0):
        """4 coding steps per loop iteration (trace-time unroll): the spill
        check runs ONCE, unconditionally, at the macro start (same
        i % 4 == 0 cadence and headroom margin as the per-step cond it
        replaces), and the loop bookkeeping amortizes over 4 pixels."""

        def body(m, carry):
            table, state = carry
            acc0, acc1, nbits, wi, ring, spilled = state
            ring, spilled = maybe_spill(ring, spilled, wi)
            carry = (table, (acc0, acc1, nbits, wi, ring, spilled))
            i0 = base0 + 4 * m
            for u in range(4):
                carry = step_core(i0 + u, carry)
            return carry

        return body

    def preamble(table, state):
        """Plane start (PRE chunks, steps 0-1): depth-sized raw first two
        pixels (two's-complement truncated for the signed Co/Cg planes);
        k statistics restart from this plane's per-image prior (all-zero
        for v0 streams). Straight-line — runs once per plane-start chunk."""
        nbr_out[base & (NR - 1), :] = vals_ref[0, :]
        nbr_out[(base + 1) & (NR - 1), :] = vals_ref[1, :]
        acc0, acc1, nbits, wi, ring, spilled = state
        ring, spilled = maybe_spill(ring, spilled, wi)
        state = (acc0, acc1, nbits, wi, ring, spilled)
        w = pre_w_ref[base]
        maskv = (1 << w) - 1
        p0 = (vals_ref[0, :] & maskv).astype(jnp.uint32)
        p1 = (vals_ref[1, :] & maskv).astype(jnp.uint32)
        state = append(state, p0, jnp.full((B,), 1, jnp.int32) * w)
        state = append(state, p1, jnp.full((B,), 1, jnp.int32) * w)
        ch = base // t
        NT_ = table.shape[0]
        newt = prior_ref[0:NT_, :]
        for ci2 in range(1, C):
            newt = jnp.where(
                ch == ci2, prior_ref[ci2 * NT_ : (ci2 + 1) * NT_, :], newt
            )
        return newt, state

    # Resume per-lane coder state from the chunk inputs.
    table0 = tab_in[:]
    u32 = lambda row: jax.lax.bitcast_convert_type(st_in[row, :], jnp.uint32)
    state0 = (
        u32(0),
        u32(1),
        st_in[2, :],
        st_in[3, :],
        jax.lax.bitcast_convert_type(ring_in[:], jnp.uint32),
        st_in[4, :],
    )
    if PRE:
        table0, state0 = preamble(table0, state0)
    lo = 2 if PRE else 0
    carry0 = (table0, state0)
    if SC >= lo + 4 and SC % 4 == 0:
        # Unrolled hot path. PRE chunks: steps 2, 3 straight-line (static
        # indices; no spill check due there — the preamble checked at step
        # 0), then (SC-4)/4 macro steps; interior chunks: SC/4 macros.
        if PRE:
            carry0 = step_core(2, carry0)
            carry0 = step_core(3, carry0)
            lo = 4
        table, (acc0, acc1, nbits, wi, ring, spilled) = jax.lax.fori_loop(
            0, (SC - lo) // 4, macro_step(lo), carry0
        )
    else:
        table, (acc0, acc1, nbits, wi, ring, spilled) = jax.lax.fori_loop(
            lo, SC, step, carry0
        )

    tab_out[:] = table
    st_out[:] = jnp.zeros_like(st_out)
    st_out[0, :] = jax.lax.bitcast_convert_type(acc0, jnp.int32)
    st_out[1, :] = jax.lax.bitcast_convert_type(acc1, jnp.int32)
    st_out[2, :] = nbits
    st_out[3, :] = wi
    st_out[4, :] = spilled
    ring_out[:] = jax.lax.bitcast_convert_type(ring, jnp.int32)
    lens_ref[:] = jnp.zeros_like(lens_ref)
    lens_ref[0, :] = wi * 32 + nbits

    @pl.when(il_ref[0] == 1)
    def _():
        # Flush the partial word into the ring (byte-align padding is the
        # zero fill), then spill everything left.
        hit = (rows_r == (wi - spilled)[None, :]) & (nbits > 0)[None, :]
        ring2 = ring | _selu(hit, acc0[None, :], jnp.uint32(0))
        end_words = wi + (nbits > 0).astype(jnp.int32)

        def drain_cond(st):
            return jnp.any(st[1] < end_words)

        def drain_all(st):
            ring2, spilled2 = st
            return spill(ring2, spilled2, spilled2 < end_words)

        jax.lax.while_loop(drain_cond, drain_all, (ring2, spilled))


@functools.partial(
    jax.jit, static_argnames=("th", "tw", "c", "W", "cfg", "interpret")
)
def _encode_tiles_pallas(
    tiles_ls, row_a, row_b, pre_w, prior, th: int, tw: int,
    c: int, W: int, cfg: CodingConfig, interpret: bool,
):
    """tiles_ls: (L, S) int32 tile channel planes; prior: (c, nb, K) or
    (L, c, nb, K) int32 k-table seeds. Returns (words (W, L) uint32,
    bits (L,) int32).

    One pallas_call per pixel chunk; the per-lane coder state (k-table,
    bit accumulator, word ring, neighbour ring) threads through the calls as
    plain arrays. The chunk index is a scalar-prefetch operand driving the
    vals BlockSpec, so every call shares one compiled kernel."""
    tiles_ls = tiles_ls.astype(jnp.int32)  # callers upload the narrow dtype
    L, S = tiles_ls.shape
    t = th * tw
    nb = min(int(cfg.max_context).bit_length(), QCTX_CAP) + 1
    K = cfg.num_k
    NT = -(-(nb * K) // 8) * 8
    plan = kernel_plan(cfg, th, tw, c, W, nt=L, mosaic=not interpret)
    if plan is None:
        raise ValueError(
            f"no Pallas kernel plan for {th}x{tw} tiles with {c} channel(s)"
            " at this VMEM budget/width; use the XLA engine"
        )
    SC, NR, B, n_chunks = plan
    Lp = -(-L // B) * B
    vals = jnp.pad(tiles_ls, ((0, Lp - L), (0, 0))).T  # (S, Lp)

    if prior.ndim == 3:  # one image: same seed for every lane
        prior = jnp.broadcast_to(prior[None], (L, c, nb, K))
    pr = jnp.pad(
        prior.reshape(L, c, nb * K), ((0, Lp - L), (0, 0), (0, NT - nb * K))
    )
    prior_lanes = pr.reshape(Lp, c * NT).T  # (c*NT, Lp)

    lane = lambda b, *_: (0, b)
    chunk = lambda b, ra, rb, pw, ci, il: (ci[0], b)
    state_specs = [
        pl.BlockSpec((NT, B), lane, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, B), lane, memory_space=pltpu.VMEM),
        pl.BlockSpec((_RING, B), lane, memory_space=pltpu.VMEM),
        pl.BlockSpec((NR, B), lane, memory_space=pltpu.VMEM),
    ]

    def make_call(pre: bool):
        kernel = functools.partial(
            _encode_kernel_body,
            SC=SC, W=W, B=B, t=t, nb=nb, K=K, NR=NR, C=c,
            KB=_k_select_plan(K, cfg.depth_bits, t), PRE=pre,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(Lp // B,),
                in_specs=[
                    pl.BlockSpec((SC, B), chunk, memory_space=pltpu.VMEM),
                    *state_specs,
                    pl.BlockSpec((W, B), lane, memory_space=pltpu.VMEM),
                    pl.BlockSpec((c * NT, B), lane, memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    *state_specs,
                    pl.BlockSpec((W, B), lane, memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, B), lane, memory_space=pltpu.VMEM),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((NT, Lp), jnp.int32),
                jax.ShapeDtypeStruct((8, Lp), jnp.int32),
                jax.ShapeDtypeStruct((_RING, Lp), jnp.int32),
                jax.ShapeDtypeStruct((NR, Lp), jnp.int32),
                jax.ShapeDtypeStruct((W, Lp), jnp.uint32),
                jax.ShapeDtypeStruct((8, Lp), jnp.int32),
            ],
            interpret=interpret,
        )

    # Two kernel variants: plane-start chunks (static straight-line preamble)
    # and interior chunks (pure main loop). SC | t, so base % t == 0 decides.
    calls = {}
    tab = jnp.zeros((NT, Lp), jnp.int32)
    st = jnp.zeros((8, Lp), jnp.int32)
    ring = jnp.zeros((_RING, Lp), jnp.int32)
    nbr = jnp.zeros((NR, Lp), jnp.int32)
    words = jnp.zeros((W, Lp), jnp.uint32)
    lens = None
    for ci in range(n_chunks):
        pre = (ci * SC) % t == 0
        if pre not in calls:
            calls[pre] = make_call(pre)
        ci_a = jnp.full((1,), ci, jnp.int32)
        il_a = jnp.full((1,), 1 if ci == n_chunks - 1 else 0, jnp.int32)
        tab, st, ring, nbr, words, lens = calls[pre](
            row_a, row_b, pre_w, ci_a, il_a,
            vals, tab, st, ring, nbr, words, prior_lanes,
        )
    return words[:, :L].T, lens[0, :L]


def encode_tiles(
    tiles: np.ndarray, cfg: CodingConfig, th: int, tw: int, W: int,
    prior=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode (n_tiles, C, t) int32 tiles into per-tile word columns.

    ``prior``: (C, nb, K) int32 k-table seed shared by every tile (or
    (n_tiles, C, nb, K) per-tile, e.g. a multi-image batch); None = zeros
    (v0 streams). Returns (words (n_tiles, W) uint32 device array,
    bits (n_tiles,) int32 device array). If any tile's bits exceed W*32 the
    caller must fall back (detect via bits > W*32; the kernel drops
    overflowing words safely). ``tiles``/``prior`` may be device arrays
    (kept on device — no host round trip) or numpy."""
    nt, c, t = tiles.shape
    if t < 2:
        raise ValueError(
            "FLCT tile planes need >= 2 pixels (the raw preamble is two "
            f"pixels per plane); got {th}x{tw}"
        )
    meta = _meta_arrays(th, tw, c, cfg.depth_bits)
    if isinstance(tiles, jax.Array):
        tiles_ls = tiles.reshape(nt, c * t)
    else:
        tiles_ls = jnp.asarray(np.ascontiguousarray(tiles.reshape(nt, c * t)))
    nb = min(int(cfg.max_context).bit_length(), QCTX_CAP) + 1
    if prior is None:
        prior = np.zeros((c, nb, cfg.num_k), np.int32)
    return _encode_tiles_pallas(
        tiles_ls,
        *(jnp.asarray(m) for m in meta),
        jnp.asarray(prior, jnp.int32),
        th,
        tw,
        c,
        W,
        cfg,
        _interpret(),
    )


def bucket_words(w: int) -> int:
    """Round a word count up to a coarse bucket (bounds jit recompiles;
    always a multiple of the ring spill block)."""
    w = max(64, w)
    gran = max(32, 1 << max(0, w.bit_length() - 3))
    return -(-w // gran) * gran  # gran >= 32 keeps _SPILL alignment


_w_hints: dict = {}


def width_hint(cfg: CodingConfig, t: int, c: int) -> int:
    """Self-tuning stream-column capacity: start at the pessimistic bound,
    then shrink toward 1.25x the largest tile actually observed for this
    (t, c, depth) shape. Overflow is detected by the caller (bits > W*32)
    and retried at the full bound, so a stale hint costs a recompile, never
    correctness."""
    key = (t, c, cfg.pixel_depth)
    cap = encode_width_bound(cfg, t, c)
    hint = _w_hints.get(key)
    if hint is None:
        return bucket_words(min(cap, 64 + (t * c * 20) // 32))
    return min(bucket_words(hint + hint // 4), bucket_words(cap))


def observe_width(cfg: CodingConfig, t: int, c: int, max_bits: int) -> None:
    key = (t, c, cfg.pixel_depth)
    w = -(-int(max_bits) // 32)
    _w_hints[key] = max(_w_hints.get(key, 0), w)


def encode_width_bound(cfg: CodingConfig, t: int, c: int) -> int:
    """Static stream-column word capacity W for one tile.

    Budget: raw preambles + a generous per-pixel ceiling (the adaptive k
    keeps real symbols far below it). Overflow is detected (bits > W*32)
    and falls back to the XLA path, so this is a fast-path sizing knob, not
    a correctness bound."""
    per_pixel = cfg.max_phase_in_bits + 2  # in-range worst case
    per_pixel = max(per_pixel, 2 + 1 + max(cfg.k_values) + 8)  # typical oor
    bits = c * (64 + t * (per_pixel + 8))
    w = -(-bits // 32)
    return -(-w // _SPILL) * _SPILL  # spill-block aligned


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def _prior_rows(c: int, cfg: CodingConfig) -> int:
    """Sublane-padded per-channel row count of the k-prior VMEM block."""
    nbk = (min(int(cfg.max_context).bit_length(), QCTX_CAP) + 1) * cfg.num_k
    return -(-nbk // 8) * 8


def decode_fits(S: int, W: int, c: int, cfg: CodingConfig) -> bool:
    """Whether the non-chunked decode kernel fits VMEM at B=128."""
    return 4 * (2 * (S + W + c * _prior_rows(c, cfg)) + 96) * 128 <= _VMEM_BUDGET


def _lane_block_full(S: int, W: int, c: int, cfg: CodingConfig, nt=None) -> int:
    """Lane block for the non-chunked decode kernel: the full (S, B) output,
    (W, B) stream block and (c*NT, B) prior are VMEM-resident
    (double-buffered). ``nt``: actual lane count when known — B is then
    sized to it (see _best_block)."""
    per_lane = 4 * (2 * (S + W + c * _prior_rows(c, cfg)) + 96)
    b = _VMEM_BUDGET // max(per_lane, 1)
    b = min(2048, (b // 128) * 128)
    return _best_block(max(128, b), nt)


def _decode_kernel_body(
    row_a_ref,
    row_b_ref,
    cols_ref,
    prior_ref,
    out_ref,
    *,
    S: int,
    W: int,
    B: int,
    t: int,
    nb: int,
    K: int,
    max_context: int,
    C: int,
    NT: int,
    KB: int,
    depth_bits: int,
):
    """One grid program: decode B tile streams into (S, B) pixel planes.

    The pixel walk is split at the (static) plane boundaries: the two raw
    preamble pixels of each plane run as straight-line code with their
    width/signedness/prior rows resolved at trace time, and the per-plane
    ``fori_loop`` body is the main coding step ONLY — no per-step
    ``cond(j < 2, ...)`` branch and no jmod/pre_w/pre_sgn scalar reads
    (they were ~3 SMEM reads + a Mosaic branch on every one of the S
    sequential steps; docs/DESIGN.md §7.1)."""
    R, G = _RING, _SPILL
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)
    rows_r = jax.lax.broadcasted_iota(jnp.int32, (R, B), 0)
    bucket_rows = jax.lax.broadcasted_iota(jnp.int32, (nb * K, B), 0) // K
    k_rows = jax.lax.broadcasted_iota(jnp.int32, (nb * K, B), 0) % K

    def fetch(idx):
        """Direct per-lane word cols[idx[lane], lane]; 0 when out of range.
        Full-width one-hot — only for the RARE slow paths (unary overrun,
        window rebuild); the hot path reads through the ring."""
        hit = rows_w == idx[None, :]
        masked = jnp.where(
            hit, jax.lax.bitcast_convert_type(cols_ref[:], jnp.int32), 0
        )
        return _sum_u32(masked, axis=0)

    def load_block(lo, need):
        """(G, B) words cols[lo:lo+G] per lane (lo multiple of G): exactly one
        G-aligned block select per lane — no word-level one-hot."""
        red = jnp.zeros((G, B), jnp.uint32)
        for blk in range(W // G):
            sel = ((lo == blk * G) & need)[None, :]
            red = jnp.where(sel, cols_ref[blk * G : (blk + 1) * G, :], red)
        return red

    def fetch_ring(ring, rbase, idx):
        """Per-lane word at idx ∈ [rbase, rbase+R) via a one-hot over R rows."""
        hit = rows_r == (idx - rbase)[None, :]
        masked = jnp.where(
            hit, jax.lax.bitcast_convert_type(ring, jnp.int32), 0
        )
        return _sum_u32(masked, axis=0)

    def refill(ring, rbase, need):
        new = load_block(rbase + R, need)
        ring = jnp.where(
            need[None, :], jnp.concatenate([ring[G:, :], new]), ring
        )
        return ring, rbase + jnp.where(need, G, 0)

    def _refill_window(pos, ring, rbase):
        # Top up the ring so [wp, wp+4] stays resident through this step and
        # the next three: the check costs a vector->scalar any-reduce, so it
        # runs every 4th step with margin for 4 steps x <=2 words fast-path
        # advance (the overrun slow path rebuilds the ring directly below).
        wp0 = pos >> 5

        def need_fill(st):
            ring, rbase = st
            return jnp.any(wp0 + 12 > rbase + R - 1)

        def do_fill(st):
            ring, rbase = st
            # Refill every lane whose cursor has fully passed the half being
            # evicted (wp0 >= rbase+G) — eager top-up is only safe then; the
            # hard-need lanes (wp0 >= rbase+R-12) all qualify.
            return refill(ring, rbase, (wp0 - rbase) >= G)

        return jax.lax.while_loop(need_fill, do_fill, (ring, rbase))

    def step_core(i, carry):
        """One main coding step WITHOUT the ring-refill check — the caller
        owns the every-4th-step refill cadence (macro_step hoists it to one
        unconditional check per 4 unrolled steps; the generic fallback loop
        keeps the per-step cond)."""
        table, pos, w0, w1, w2, ring, rbase = carry
        off = (pos & 31).astype(jnp.uint32)
        # Aligned 64-bit window at the cursor.
        carry1 = jnp.where(off > 0, w1 >> (jnp.uint32(32) - off), jnp.uint32(0))
        win0 = (w0 << off) | carry1
        carry2 = jnp.where(off > 0, w2 >> (jnp.uint32(32) - off), jnp.uint32(0))
        win1 = (w1 << off) | carry2

        def window_bits(s, n):
            """n bits (n <= 31) at bit offset s (s + n <= 64) of the window."""
            lo = _shl(win0, s) | jnp.where(s > 0, _shr(win1, 32 - s), 0)
            hi = _shl(win1, s - 32)
            x = jnp.where(s < 32, lo, hi)
            return _shr(x, 32 - n)

        def main(table, pos):
            va = out_ref[row_a_ref[i], :]
            vb = out_ref[row_b_ref[i], :]
            h = jnp.maximum(va, vb)
            l = jnp.minimum(va, vb)
            ctx = jnp.clip(h - l, 0, max_context)
            qc = jnp.minimum(_bitlen(ctx), nb - 1)

            match = bucket_rows == qc[None, :]
            k = _k_select(table, match, k_rows, K, KB)

            first = (win0 >> 31).astype(jnp.int32)

            # in-range: phase-in over n = ctx + 1 at offset 1
            nn = ctx + 1
            m = _bitlen(nn) - 1
            left_p = nn - (1 << m)
            right_p = (1 << (m + 1)) - nn
            first_m = window_bits(jnp.int32(1), m).astype(jnp.int32)
            short = first_m < right_p
            extra = window_bits(1 + m, jnp.int32(1)).astype(jnp.int32)
            number = jnp.where(
                short, first_m, (first_m - right_p) * 2 + right_p + extra
            )
            xsum = number + left_p
            in_value = xsum - jnp.where(xsum >= nn, nn, 0) + l
            in_pos = pos + 1 + jnp.where(short, m, m + 1)

            # out-of-range: marker bit 2, unary quotient, k-bit remainder.
            # Fast path counts the run across the full 64-bit window (up to
            # 61-k bits): runs past ~30 bits are common on smooth content
            # where k adapts to 0, and with thousands of lanes ANY lane in
            # the slow loop drags the whole step through full-width fetches.
            above_bit = ((win0 >> 30) & 1).astype(jnp.int32)
            u1 = win0 << jnp.uint32(2)  # bits [2, 32) + two trailing zeros
            iv1 = (~u1) & jnp.uint32(0xFFFFFFFF)  # never 0: low bits set
            ones1 = jax.lax.clz(
                jax.lax.bitcast_convert_type(iv1, jnp.int32)
            ).astype(jnp.int32)
            iv2 = (~win1) & jnp.uint32(0xFFFFFFFF)
            ones2 = jnp.where(
                iv2 == 0,
                32,
                jax.lax.clz(jax.lax.bitcast_convert_type(iv2, jnp.int32)),
            ).astype(jnp.int32)
            lead = ones1 + jnp.where(ones1 == 30, ones2, 0)
            # terminator + k remainder bits must stay inside the window.
            # Gate on the marker bit: for IN-RANGE lanes the "unary run" read
            # from the window is meaningless (their phase-in payload is often
            # all-ones on smooth content — e.g. ctx 0 emits a bare '1' marker
            # per pixel), and letting them flag overrun drags the whole lane
            # block through the full-width slow loop on nearly every step
            # (measured 16x decode blowup on a smooth corpus image).
            overrun = (first == 0) & (lead > 61 - k)
            bit_limit = jnp.int32(W * 32)

            def any_active(st):
                # done carried as int32: Mosaic cannot yield i1 vectors
                return jnp.any(st[2] == 0)

            def scan_on(st):
                q2, p2, done_i = st
                done = done_i != 0
                wp2 = p2 >> 5
                o2 = (p2 & 31).astype(jnp.uint32)
                a = fetch(wp2)
                b = fetch(wp2 + 1)
                wdw = (a << o2) | jnp.where(
                    o2 > 0, b >> (jnp.uint32(32) - o2), jnp.uint32(0)
                )
                iv = (~wdw) & jnp.uint32(0xFFFFFFFF)
                ld = jnp.where(iv == 0, 32, jax.lax.clz(iv)).astype(jnp.int32)
                ld = jnp.where(done, 0, ld)
                fin = done | (ld < 32) | (p2 >= bit_limit)
                newly = fin & ~done
                return (
                    q2 + ld,
                    jnp.where(newly, p2 + ld + 1, p2 + ld),
                    fin.astype(jnp.int32),
                )

            def slow(args):
                q2, p2, done_i = jax.lax.while_loop(
                    any_active, scan_on, args
                )
                # ONE remainder read after the loop (p2 sits past the
                # terminator for every lane) — reading it per iteration
                # doubled the slow loop's full-width fetches. (A ring-read
                # slow loop was tried and MISCOMPILES on this toolchain:
                # nested while/cond with ring threading decodes wrong.)
                o3 = (p2 & 31).astype(jnp.uint32)
                ra = fetch(p2 >> 5)
                rb = fetch((p2 >> 5) + 1)
                rwin = (ra << o3) | jnp.where(
                    o3 > 0, rb >> (jnp.uint32(32) - o3), jnp.uint32(0)
                )
                return q2, p2, _shr(rwin, 32 - k).astype(jnp.int32)

            def no_slow(args):
                q2, p2, _ = args
                return q2, p2, jnp.zeros((B,), jnp.int32)

            init = (jnp.zeros((B,), jnp.int32), pos + 2,
                    (~overrun).astype(jnp.int32))
            has_overrun = jnp.any(overrun)
            q2, p2, rem_slow = jax.lax.cond(
                has_overrun, slow, no_slow, init
            )
            ring_u, rbase_u = ring, rbase
            uq = jnp.where(overrun, q2, lead)
            pos_u = jnp.where(overrun, p2, pos + 2 + lead + 1)
            rem_fast = window_bits(pos_u - pos, k).astype(jnp.int32)
            rem = jnp.where(
                k > 0, jnp.where(overrun, rem_slow, rem_fast), 0
            )
            encoded = (uq << k) + rem
            oor_value = jnp.where(
                above_bit == 1, encoded + h + 1, l - encoded - 1
            )
            oor_pos = pos_u + k

            is_in = first == 1
            value = jnp.where(is_in, in_value, oor_value)
            new_pos = jnp.where(is_in, in_pos, oor_pos)

            upd = match & (~is_in)[None, :]
            add = jnp.where(upd, (encoded[None, :] >> k_rows) + 1 + k_rows, 0)
            table = table + add
            return (
                table, new_pos, value, ring_u, rbase_u,
                has_overrun.astype(jnp.int32),
            )

        table, new_pos, value, ring, rbase, had_overrun = main(table, pos)
        out_ref[i, :] = value

        # Advance the 96-bit window to the new cursor word (ring reads; the
        # refill at step start guarantees wp+4 is resident).
        wp = pos >> 5
        nwp = new_pos >> 5
        delta = nwp - wp

        def adv_once(st, r):
            w0, w1, w2 = st
            go = delta > r
            nw = fetch_ring(ring, rbase, wp + 3 + r)
            w0 = jnp.where(go, w1, w0)
            w1 = jnp.where(go, w2, w1)
            w2 = jnp.where(go, nw, w2)
            return (w0, w1, w2)

        st = (w0, w1, w2)
        st = adv_once(st, 0)
        st = adv_once(st, 1)

        def rebuild(args):
            # Rare (unary overrun jumped far): direct-fetch the window and
            # resync the ring onto the new cursor block.
            st, ring, rbase = args
            m = delta > 2
            nbase = nwp & ~(G - 1)
            new_ring = jnp.concatenate(
                [load_block(nbase, m), load_block(nbase + G, m)]
            )
            ring = jnp.where(m[None, :], new_ring, ring)
            rbase = jnp.where(m, nbase, rbase)
            return (fetch(nwp), fetch(nwp + 1), fetch(nwp + 2)), ring, rbase

        # delta > 2 only happens via the unary-overrun slow path (fast-path
        # advance is bounded by the 64-bit window), so the scalar flag main
        # already reduced gates the rebuild — no extra any-reduce per step.
        st, ring, rbase = jax.lax.cond(
            had_overrun != 0, rebuild, lambda a: a, (st, ring, rbase)
        )
        w0, w1, w2 = st
        return (table, new_pos, w0, w1, w2, ring, rbase)

    def step(i, carry):
        # Generic path: per-step cadenced refill + one coding step.
        table, pos, w0, w1, w2, ring, rbase = carry
        ring, rbase = jax.lax.cond(
            (i & 3) == 0,
            lambda st: _refill_window(pos, st[0], st[1]),
            lambda st: st,
            (ring, rbase),
        )
        return step_core(i, (table, pos, w0, w1, w2, ring, rbase))

    def macro_step(base0):
        """4 coding steps per loop iteration (trace-time unroll): the refill
        check runs ONCE, unconditionally, at the macro start (same i % 4 == 0
        cadence and headroom margin as the per-step cond it replaces), and
        the loop bookkeeping amortizes over 4 pixels. base0: static plane
        row offset; the m-th macro covers rows base0+4m .. base0+4m+3."""

        def body(m, carry):
            pos = carry[1]
            ring, rbase = _refill_window(pos, carry[5], carry[6])
            carry = carry[:5] + (ring, rbase)
            i0 = base0 + 4 * m
            for u in range(4):
                carry = step_core(i0 + u, carry)
            return carry

        return body

    def preamble_step(ci, i, carry):
        """Raw-pixel preamble (j < 2) of plane ``ci``, pixel row ``i`` — a
        STATIC trace-time step: the field width, signedness, prior rows and
        output row are compile-time constants. Runs twice per plane as
        straight-line code, so the hot ``step`` loop carries none of it."""
        table, pos, w0, w1, w2, ring, rbase = carry
        ring, rbase = _refill_window(pos, ring, rbase)
        off = (pos & 31).astype(jnp.uint32)
        win0 = (w0 << off) | jnp.where(
            off > 0, w1 >> (jnp.uint32(32) - off), jnp.uint32(0)
        )
        w = depth_bits + (1 if ci > 0 else 0)
        raw_u = win0 >> jnp.uint32(32 - w)
        if ci > 0:  # Co/Cg planes: signed w-bit two's complement
            value = jax.lax.bitcast_convert_type(
                raw_u << jnp.uint32(32 - w), jnp.int32
            ) >> (32 - w)
        else:
            value = jax.lax.bitcast_convert_type(raw_u, jnp.int32)
        if i == ci * t:
            # j == 0: restart the k statistics from this plane's per-image
            # prior (all-zero for v0 streams).
            table = prior_ref[ci * NT : ci * NT + nb * K, :]
        out_ref[i, :] = value
        new_pos = pos + w
        # The preamble consumes w <= 17 bits: the cursor moves <= one word.
        go = (new_pos >> 5) > (pos >> 5)
        nw = fetch_ring(ring, rbase, (pos >> 5) + 3)
        w0n = _selu(go, w1, w0)
        w1n = _selu(go, w2, w1)
        w2n = _selu(go, nw, w2)
        return (table, new_pos, w0n, w1n, w2n, ring, rbase)

    table0 = jnp.zeros((nb * K, B), jnp.int32)
    pos0 = jnp.zeros((B,), jnp.int32)
    all_lanes = jnp.ones((B,), bool)
    ring0 = jnp.concatenate(
        [
            load_block(jnp.zeros((B,), jnp.int32), all_lanes),
            load_block(jnp.full((B,), G, jnp.int32), all_lanes),
        ]
    )
    rbase0 = jnp.zeros((B,), jnp.int32)
    w0 = fetch_ring(ring0, rbase0, jnp.zeros((B,), jnp.int32))
    w1 = fetch_ring(ring0, rbase0, jnp.ones((B,), jnp.int32))
    w2 = fetch_ring(ring0, rbase0, jnp.full((B,), 2, jnp.int32))
    carry = (table0, pos0, w0, w1, w2, ring0, rbase0)
    for ci in range(C):
        carry = preamble_step(ci, ci * t, carry)
        if t > 1:
            carry = preamble_step(ci, ci * t + 1, carry)
        if t >= 8 and t % 4 == 0:
            # Unrolled hot path: rows +2, +3 straight-line (static indices;
            # no refill due at those rows — the preamble refilled at +0/+1),
            # then (t-4)/4 macro steps of 4 pixels each.
            carry = step_core(ci * t + 2, carry)
            carry = step_core(ci * t + 3, carry)
            carry = jax.lax.fori_loop(
                0, (t - 4) // 4, macro_step(ci * t + 4), carry
            )
        elif t > 2:
            carry = jax.lax.fori_loop(ci * t + 2, (ci + 1) * t, step, carry)


@functools.partial(
    jax.jit, static_argnames=("th", "tw", "c", "cfg", "interpret")
)
def _decode_tiles_pallas(
    cols_lw, row_a, row_b, prior, th: int, tw: int,
    c: int, cfg: CodingConfig, interpret: bool,
):
    """cols_lw: (L, W) uint32 per-tile stream words; prior: (c, nb, K) or
    (L, c, nb, K) int32 k-table seeds. Returns (L, S) int32."""
    L, W = cols_lw.shape
    t = th * tw
    S = c * t
    nb = min(int(cfg.max_context).bit_length(), QCTX_CAP) + 1
    K = cfg.num_k
    NT = -(-(nb * K) // 8) * 8
    B = _lane_block_full(S, W, c, cfg, nt=L)
    Lp = -(-L // B) * B
    cols = jnp.pad(cols_lw, ((0, Lp - L), (0, 0))).T  # (W, Lp)

    if prior.ndim == 3:  # one image: same seed for every lane
        prior = jnp.broadcast_to(prior[None], (L, c, nb, K))
    pr = jnp.pad(
        prior.reshape(L, c, nb * K), ((0, Lp - L), (0, 0), (0, NT - nb * K))
    )
    prior_lanes = pr.reshape(Lp, c * NT).T  # (c*NT, Lp)

    kernel = functools.partial(
        _decode_kernel_body,
        S=S,
        W=W,
        B=B,
        t=t,
        nb=nb,
        K=K,
        max_context=cfg.max_context,
        C=c,
        NT=NT,
        KB=_k_select_plan(K, cfg.depth_bits, t),
        depth_bits=cfg.depth_bits,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Lp // B,),
            in_specs=[
                pl.BlockSpec((W, B), lambda b, *_: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (c * NT, B), lambda b, *_: (0, b), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (S, B), lambda b, *_: (0, b), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((S, Lp), jnp.int32),
        interpret=interpret,
    )(row_a, row_b, cols, prior_lanes)
    return out[:, :L].T


def decode_tiles(
    cols_lw, cfg: CodingConfig, th: int, tw: int, c: int, prior=None
) -> jnp.ndarray:
    """Decode per-tile stream word rows (L, W) into (L, C, t) int32 planes.

    ``prior``: (C, nb, K) int32 k-table seed shared by every tile (or
    (L, C, nb, K) per-tile); None = zeros (v0 streams)."""
    t = th * tw
    if t < 2:
        raise ValueError(
            "FLCT tile planes need >= 2 pixels (the raw preamble is two "
            f"pixels per plane); got {th}x{tw}"
        )
    meta = _meta_arrays(th, tw, c, cfg.depth_bits)
    nb = min(int(cfg.max_context).bit_length(), QCTX_CAP) + 1
    if prior is None:
        prior = np.zeros((c, nb, cfg.num_k), np.int32)
    out = _decode_tiles_pallas(
        cols_lw,
        *(jnp.asarray(m) for m in meta[:2]),
        jnp.asarray(prior, jnp.int32),
        th,
        tw,
        c,
        cfg,
        _interpret(),
    )
    return out.reshape(-1, c, t)
