"""Neighbour/context model tests (reference: src/compression/misc.rs tests)."""

import numpy as np

from felics_tpu.core.context import nearest_neighbours, neighbour_indices


def pti(xy, width):
    x, y = xy
    return y * width + x


def test_nearest_neighbours_oracle():
    w = 23
    assert nearest_neighbours(pti((5, 8), w), w) == (pti((4, 8), w), pti((5, 7), w))
    assert nearest_neighbours(pti((0, 8), w), w) == (pti((0, 7), w), pti((0, 6), w))
    assert nearest_neighbours(pti((2, 0), w), w) == (pti((1, 0), w), pti((0, 0), w))
    assert nearest_neighbours(pti((1, 1), w), w) == (pti((0, 1), w), pti((1, 0), w))
    assert nearest_neighbours(pti((1, 0), w), w) is None
    assert nearest_neighbours(pti((0, 1), w), w) == (pti((0, 0), w), pti((1, 0), w))

    w = 1
    assert nearest_neighbours(pti((0, 0), w), w) is None
    assert nearest_neighbours(pti((0, 1), w), w) is None
    assert nearest_neighbours(pti((0, 2), w), w) == (pti((0, 1), w), pti((0, 0), w))


def test_vectorized_matches_oracle():
    for h, w in [(1, 5), (5, 1), (2, 2), (3, 23), (23, 3), (7, 7), (1, 2), (2, 1)]:
        a, b = neighbour_indices(h, w)
        for i in range(h * w):
            expected = nearest_neighbours(i, w)
            if expected is None:
                assert i < 2  # only the first two raster pixels lack neighbours
                assert a[i] == i and b[i] == i
            else:
                assert (a[i], b[i]) == expected, (h, w, i)


def test_vectorized_jax_matches_numpy():
    import jax.numpy as jnp

    for h, w in [(4, 6), (1, 9), (9, 1)]:
        a0, b0 = neighbour_indices(h, w)
        a1, b1 = neighbour_indices(h, w, xp=jnp)
        np.testing.assert_array_equal(np.asarray(a1), a0)
        np.testing.assert_array_equal(np.asarray(b1), b0)
