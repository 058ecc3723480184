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

_rtt_samples = None


def _sync(result) -> None:
    """Force execution to completion by fetching one element."""
    for leaf in jax.tree_util.tree_leaves(result):
        try:
            idx = (0,) * getattr(leaf, "ndim", 0)
            np.asarray(leaf[idx] if leaf.ndim else leaf)
        except Exception:
            np.asarray(leaf)
        return  # one leaf is enough: jit outputs complete together


def fetch_rtt(reduce: str = "median") -> float:
    """Round-trip cost of a trivial dispatch + 1-element fetch, seconds.

    ``reduce="median"`` pairs with median timings; ``reduce="min"`` is the
    right (conservative) correction when pairing with min-of-N timings —
    the fastest timed sample likely also had a below-median RTT, and
    subtracting the median there would overcorrect.
    """
    global _rtt_samples
    if _rtt_samples is None:
        import jax.numpy as jnp

        x = jnp.zeros((8, 128), jnp.int32)
        f = jax.jit(lambda x, s: x + s)
        _sync(f(x, 0))
        samples = []
        for i in range(1, 8):
            t0 = time.perf_counter()
            _sync(f(x, i))
            samples.append(time.perf_counter() - t0)
        _rtt_samples = samples
    if reduce == "min":
        return float(np.min(_rtt_samples))
    return float(np.median(_rtt_samples))


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
