"""Randomized differential testing beyond the 0..20 dims sweep: odd image
dims x odd tile configs x depths x colors, pallas==xla container bytes +
round trips, and FLCS backend byte equality (native == jax == oracle) on
crops. Each seed-derived case is deterministic per run of the suite's
seeded rng fixture."""

import numpy as np
import pytest

from felics_tpu import api
from felics_tpu.config import TileConfig
from felics_tpu.parallel import tiling


def _img(rng, h, w, dtype, channels):
    shape = (h, w) if channels == 1 else (h, w, 3)
    step = 6 if np.dtype(dtype).itemsize == 1 else 700
    base = np.cumsum(
        np.cumsum(rng.integers(-step, step + 1, shape), 0), 1
    ).astype(np.int64)
    hi = np.iinfo(dtype).max
    return np.clip(base + hi // 2, 0, hi).astype(dtype)


def test_differential_flct_engines_random_geometry(rng):
    import jax

    for _ in range(6):
        # Every geometry compiles fresh interpret-Pallas programs with zero
        # reuse across iterations; dropping them each round avoids the
        # accumulated-executables XLA:CPU segfault (docs/DESIGN.md §7.3).
        jax.clear_caches()
        h = int(rng.integers(2, 90))
        w = int(rng.integers(2, 90))
        th = int(rng.integers(2, 33))
        tw = int(rng.integers(2, 33))
        dtype = [np.uint8, np.uint16][int(rng.integers(0, 2))]
        channels = [1, 3][int(rng.integers(0, 2))]
        img = _img(rng, h, w, dtype, channels)
        tc = TileConfig(tile_h=th, tile_w=tw)
        a = tiling.compress_tiled_bytes(img, tc, engine="xla")
        b = tiling.compress_tiled_bytes(img, tc, engine="pallas")
        case = (h, w, th, tw, dtype.__name__, channels)
        assert a == b, case
        np.testing.assert_array_equal(
            tiling.decompress_tiled_bytes(a, engine="pallas"), img, case
        )
        np.testing.assert_array_equal(
            tiling.decompress_tiled_bytes(b, engine="xla"), img, case
        )


def test_differential_flcs_backends_random_dims(rng):
    from felics_tpu.native import runtime as rt

    have_native = rt.available()
    for _ in range(5):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        dtype = [np.uint8, np.uint16][int(rng.integers(0, 2))]
        channels = [1, 3][int(rng.integers(0, 2))]
        img = _img(rng, h, w, dtype, channels)
        case = (h, w, dtype.__name__, channels)
        jx = api.compress_image_bytes(img, backend="jax")
        if have_native:
            assert jx == api.compress_image_bytes(img, backend="native"), case
        if h * w <= 600:  # oracle is ~50k px/s
            assert jx == api.compress_image_bytes(img, backend="oracle"), case
        np.testing.assert_array_equal(
            api.decompress_image_bytes(jx, backend="jax"), img, case
        )
        if have_native:
            np.testing.assert_array_equal(
                api.decompress_image_bytes(jx, backend="native"), img, case
            )
