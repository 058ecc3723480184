"""YCoCg-R transform tests (reference: src/compression/color_transform.rs tests).

The reference tests reversibility exhaustively over all 256^3 RGB triplets;
we do the same vectorized (fast in numpy), plus the u16 spot values, plus an
explicit check of the truncating-division semantics on negatives.
"""

import numpy as np

from felics_tpu.config import CONFIG_8BIT, CONFIG_16BIT
from felics_tpu.core.color import _div2_trunc, rgb_to_ycocg, ycocg_to_rgb


def test_div2_truncates_toward_zero():
    x = np.array([-5, -4, -3, -2, -1, 0, 1, 2, 3, 4, 5], dtype=np.int32)
    expected = np.array([-2, -2, -1, -1, 0, 0, 0, 1, 1, 2, 2], dtype=np.int32)
    np.testing.assert_array_equal(_div2_trunc(x), expected)


def test_color_transform8_exhaustive():
    r, g, b = np.meshgrid(
        np.arange(256, dtype=np.int32),
        np.arange(256, dtype=np.int32),
        np.arange(256, dtype=np.int32),
        indexing="ij",
        sparse=True,
    )
    y, co, cg = rgb_to_ycocg(r, g, b)
    rn, gn, bn = ycocg_to_rgb(y, co, cg)
    assert np.array_equal(rn, np.broadcast_to(r, rn.shape))
    assert np.array_equal(gn, np.broadcast_to(g, gn.shape))
    assert np.array_equal(bn, np.broadcast_to(b, bn.shape))
    # Contexts induced by the transformed channels fit MAX_CONTEXT.
    for chan in (y, co, cg):
        assert int(chan.max()) - int(chan.min()) <= CONFIG_8BIT.max_context


def test_color_transform16_spot_values():
    values = [
        (0, 65535, 0),
        (0, 0, 65535),
        (65535, 0, 0),
        (65535, 65535, 65535),
        (65535, 0, 65535),
        (1726, 12640, 26649),
        (0, 0, 0),
        (9127, 65535, 3),
    ]
    spans = []
    for r, g, b in values:
        y, co, cg = rgb_to_ycocg(r, g, b)
        rn, gn, bn = ycocg_to_rgb(y, co, cg)
        assert (int(rn), int(gn), int(bn)) == (r, g, b)
        spans.append((int(y), int(co), int(cg)))
    arr = np.array(spans)
    for col in range(3):
        assert arr[:, col].max() - arr[:, col].min() <= CONFIG_16BIT.max_context


def test_color_transform16_random(rng):
    rgb = rng.integers(0, 65536, size=(100000, 3)).astype(np.int32)
    y, co, cg = rgb_to_ycocg(rgb[:, 0], rgb[:, 1], rgb[:, 2])
    r, g, b = ycocg_to_rgb(y, co, cg)
    np.testing.assert_array_equal(np.stack([r, g, b], axis=1), rgb)


def test_matches_jax_numpy():
    import jax.numpy as jnp

    rgb = np.random.default_rng(0).integers(0, 65536, size=(1000, 3)).astype(np.int32)
    y0, co0, cg0 = rgb_to_ycocg(rgb[:, 0], rgb[:, 1], rgb[:, 2])
    y1, co1, cg1 = rgb_to_ycocg(
        jnp.asarray(rgb[:, 0]), jnp.asarray(rgb[:, 1]), jnp.asarray(rgb[:, 2]), xp=jnp
    )
    np.testing.assert_array_equal(np.asarray(y1), y0)
    np.testing.assert_array_equal(np.asarray(co1), co0)
    np.testing.assert_array_equal(np.asarray(cg1), cg0)
