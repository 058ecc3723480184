"""Probe: cost of candidate on-device payload compaction formulations."""
import os, sys, time
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax
import jax.numpy as jnp
from functools import partial

L, W = 3072, 320
cap = 2 * 1024 * 1024
rng = np.random.default_rng(0)
words = jnp.asarray(rng.integers(0, 2**32, (L, W), dtype=np.uint32))
bits = jnp.asarray(
    rng.integers(4000, 8000, (L,), dtype=np.int32) // 8 * 8
)


@partial(jax.jit, static_argnames=("cap",))
def compact_2d(words, bits, cap):
    Lq, Wq = words.shape
    tb = (bits + 7) // 8
    starts = jnp.cumsum(tb) - tb
    total = starts[-1] + tb[-1]
    pos = jnp.arange(cap, dtype=jnp.int32)
    tile = jnp.clip(jnp.searchsorted(starts, pos, side="right") - 1, 0, Lq - 1)
    j = jnp.clip(pos - starts[tile], 0, Wq * 4 - 1)
    w = words[tile, j >> 2]
    sh = ((3 - (j & 3)) * 8).astype(jnp.uint32)
    return jnp.where(pos < total, (w >> sh) & 0xFF, 0).astype(jnp.uint8), total


@partial(jax.jit, static_argnames=("cap",))
def compact_1d_bytes(words, bits, cap):
    Lq, Wq = words.shape
    tb = (bits + 7) // 8
    starts = jnp.cumsum(tb) - tb
    total = starts[-1] + tb[-1]
    # vector byte unpack: (L, W) u32 -> (L*W*4,) u8, big-endian order
    b = jnp.stack(
        [(words >> s) & 0xFF for s in (24, 16, 8, 0)], axis=-1
    ).astype(jnp.uint8).reshape(Lq * Wq * 4)
    pos = jnp.arange(cap, dtype=jnp.int32)
    tile = jnp.clip(jnp.searchsorted(starts, pos, side="right") - 1, 0, Lq - 1)
    j = jnp.clip(pos - starts[tile], 0, Wq * 4 - 1)
    out = b[tile * (Wq * 4) + j]
    return jnp.where(pos < total, out, 0).astype(jnp.uint8), total


@partial(jax.jit, static_argnames=("cap",))
def compact_1d_words(words, bits, cap):
    """Word-granular gather: output word i gathers src word; tile payloads
    are byte-aligned so an output word can span two tiles -> gather two
    candidate words and merge. cap in bytes, multiple of 4."""
    Lq, Wq = words.shape
    tb = (bits + 7) // 8
    starts = jnp.cumsum(tb) - tb
    total = starts[-1] + tb[-1]
    flat = words.reshape(Lq * Wq)
    npos = cap // 4
    pos = jnp.arange(npos, dtype=jnp.int32) * 4  # byte pos of word start
    tile = jnp.clip(jnp.searchsorted(starts, pos, side="right") - 1, 0, Lq - 1)
    j = jnp.clip(pos - starts[tile], 0, Wq * 4 - 1)
    base = tile * Wq + (j >> 2)
    sh = ((j & 3) * 8).astype(jnp.uint32)
    w0 = flat[base]
    w1 = flat[jnp.clip(base + 1, 0, Lq * Wq - 1)]
    lo = jnp.where(sh > 0, w1 >> (32 - sh), jnp.uint32(0))
    cur = (w0 << sh) | lo
    # bytes of this output word that cross into the NEXT tile
    nxt_start = starts[jnp.clip(tile + 1, 0, Lq - 1)]
    cross = jnp.clip(pos + 4 - nxt_start, 0, 4)  # how many tail bytes
    t2 = jnp.clip(tile + 1, 0, Lq - 1)
    w2 = flat[t2 * Wq]
    mask = jnp.where(
        cross >= 4, jnp.uint32(0xFFFFFFFF),
        (jnp.uint32(1) << (cross * 8)) - 1,
    )
    merged = (cur & ~mask) | (w2 >> (32 - cross.clip(1) * 8)) * 0  # placeholder
    return cur, total  # timing only; correctness handled in real impl


def t(label, fn, n=5):
    r = jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"{label:30s} {best*1e3:8.1f} ms")


x = jnp.zeros((1,), jnp.int32)
t("RTT", lambda: x + 1)
bits2 = bits + 8  # defeat identical-execution cache per call? keep static
t("compact_2d", lambda: compact_2d(words, bits, cap)[0][:64])
t("compact_1d_bytes", lambda: compact_1d_bytes(words, bits, cap)[0][:64])
t("compact_1d_words", lambda: compact_1d_words(words, bits, cap)[0][:64])
