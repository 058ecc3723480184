"""Two-nearest-causal-neighbour context model.

Reference counterpart: src/compression/misc.rs:6-24. For a pixel at flat
raster index ``i`` in an image of width ``w``:

  * interior (x>0, y>0):        (left, above)           = (i-1, i-w)
  * top row (y==0, x>=2):       (left, left-left)       = (i-1, i-2)
  * left column (x==0, y>=2):   (above, above-above)    = (i-w, i-2w)
  * left column (x==0, y==1):   (above, above-right)    = (i-w, i-w+1)
  * otherwise (the first two raster pixels): no neighbours.

The scalar form returns ``None`` for the first two pixels; the vectorized form
returns index arrays with the first two entries self-referencing (masked out
by callers), computed in one shot for every pixel — the encoder-side context
pass is embarrassingly parallel because all pixel values are known up front.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def nearest_neighbours(i: int, width: int) -> Optional[Tuple[int, int]]:
    """Scalar oracle, mirroring the reference exactly."""
    x, y = i % width, i // width
    if x > 0 and y > 0:
        return (i - 1, i - width)
    if y == 0:
        if x >= 2:
            return (i - 1, i - 2)
        return None
    if y >= 2:
        return (i - width, i - 2 * width)
    if (x + 1) < width:
        return (i - width, i - width + 1)
    return None


def neighbour_indices(height: int, width: int, xp=np) -> Tuple["np.ndarray", "np.ndarray"]:
    """Vectorized neighbour indices for every flat raster index.

    Returns int32 arrays ``(a, b)`` of shape (height*width,). Entries for
    pixels with no neighbours (the first two in raster order) point at
    themselves; callers mask indices < 2.

    ``xp`` may be numpy or jax.numpy; all ops are elementwise/broadcast so the
    same code traces under jit.
    """
    n = height * width
    i = xp.arange(n, dtype=xp.int32)
    w = width
    x = i % w
    y = i // w

    interior = (x > 0) & (y > 0)
    top_row = (y == 0) & (x >= 2)
    left_col_deep = (x == 0) & (y >= 2)
    left_col_y1 = (x == 0) & (y == 1) & (w > 1)

    a = xp.where(
        interior | top_row,
        i - 1,
        xp.where(left_col_deep | left_col_y1, i - w, i),
    )
    b = xp.where(
        interior,
        i - w,
        xp.where(
            top_row,
            i - 2,
            xp.where(
                left_col_deep,
                i - 2 * w,
                xp.where(left_col_y1, i - w + 1, i),
            ),
        ),
    )
    return a.astype(xp.int32), b.astype(xp.int32)


def context_of(v1, v2, xp=np):
    """Return (low, high, context) for neighbour values; context = H - L."""
    h = xp.maximum(v1, v2)
    low = xp.minimum(v1, v2)
    return low, h, (h - low)
