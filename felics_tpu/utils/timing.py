"""Reliable device timing.

On tunneled/remote TPU platforms (axon), ``jax.block_until_ready`` can
return before execution finishes; the only dependable synchronization is a
host fetch of (part of) the result. ``timed`` measures a thunk by fetching
one element of its output every iteration and subtracting the separately
measured fetch round-trip baseline.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import numpy as np

_rtt_cache = None


def _sync(result) -> None:
    """Force execution to completion by fetching one element."""
    for leaf in jax.tree_util.tree_leaves(result):
        try:
            idx = (0,) * getattr(leaf, "ndim", 0)
            np.asarray(leaf[idx] if leaf.ndim else leaf)
        except Exception:
            np.asarray(leaf)
        return  # one leaf is enough: jit outputs complete together


def fetch_rtt() -> float:
    """Round-trip cost of a trivial dispatch + 1-element fetch, seconds."""
    global _rtt_cache
    if _rtt_cache is not None:
        return _rtt_cache
    import jax.numpy as jnp

    x = jnp.zeros((8, 128), jnp.int32)
    f = jax.jit(lambda x, s: x + s)
    _sync(f(x, 0))
    samples = []
    for i in range(1, 6):
        t0 = time.perf_counter()
        _sync(f(x, i))
        samples.append(time.perf_counter() - t0)
    _rtt_cache = float(np.median(samples))
    return _rtt_cache


def timed(f: Callable, iters: int = 3, warmup: int = 1) -> float:
    """Median wall seconds per call of ``f``, RTT-corrected, sync'd by fetch."""
    for _ in range(warmup):
        _sync(f())
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(f())
        samples.append(time.perf_counter() - t0)
    return max(1e-9, float(np.median(samples)) - fetch_rtt())
