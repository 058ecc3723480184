"""Device k0 (split-accumulator lexicographic argmin) vs host int64 k0.

The on-device per-image Rice-length sums for 16-bit images exceed int32;
compute_k0_prior_jax carries them as 16-bit-split (hi, lo) int32 pairs and
compares lexicographically. These tests pin exact agreement with the host
int64 reference (compute_k0_batch) across depths, channels and adversarial
content, including the ties->largest-k rule.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from felics_tpu.config import tiled_config_for_depth
from felics_tpu.format import ColorType, PixelDepth
from felics_tpu.ops.kscan_tiled import num_buckets
from felics_tpu.parallel import tiling


def _tiles(rng, n_imgs, per_img, c, t, hi):
    return rng.integers(0, hi, size=(n_imgs * per_img, c, t)).astype(np.int32)


@pytest.mark.parametrize("depth", [PixelDepth.EIGHT, PixelDepth.SIXTEEN])
@pytest.mark.parametrize("c", [1, 3])
def test_device_k0_matches_host(rng, depth, c):
    cfg = tiled_config_for_depth(depth)
    nb = num_buckets(cfg)
    th = tw = 16
    t = th * tw
    n_imgs, per_img = 3, 8
    hi = (1 << cfg.depth_bits) - 1
    # noisy content maximizes residuals (worst case for the sums)
    tiles = _tiles(rng, n_imgs, per_img, c, t, hi)
    if c == 3:
        # Co/Cg planes are signed: shift to realistic YCoCg ranges
        tiles[:, 1:] -= hi // 2
    counts = [per_img] * n_imgs
    ref = tiling.compute_k0_batch(tiles, counts, th, tw, cfg, nb)
    img_of_tile = np.repeat(np.arange(n_imgs, dtype=np.int32), per_img)
    k0_dev, prior = tiling.compute_k0_prior_jax(
        jnp.asarray(tiles), jnp.asarray(img_of_tile), th, tw, cfg, nb, n_imgs
    )
    np.testing.assert_array_equal(np.asarray(k0_dev), ref)
    # prior rows must match prior_from_k0 on the same k0
    expect = np.stack(
        [tiling.prior_from_k0(ref[i], cfg, c) for i in range(n_imgs)]
    )
    np.testing.assert_array_equal(np.asarray(prior), expect[img_of_tile])


def test_device_k0_smooth_and_flat(rng):
    # flat tiles (all-zero sums -> ties -> largest k) + smooth gradients
    cfg = tiled_config_for_depth(PixelDepth.SIXTEEN)
    nb = num_buckets(cfg)
    th = tw = 16
    t = th * tw
    flat = np.full((4, 1, t), 777, np.int32)
    ramp = np.cumsum(rng.integers(0, 900, size=(4, 1, t)), axis=-1).astype(
        np.int32
    ) % 65536
    tiles = np.concatenate([flat, ramp])
    counts = [4, 4]
    ref = tiling.compute_k0_batch(tiles, counts, th, tw, cfg, nb)
    img_of_tile = np.repeat(np.arange(2, dtype=np.int32), 4)
    k0_dev, _ = tiling.compute_k0_prior_jax(
        jnp.asarray(tiles), jnp.asarray(img_of_tile), th, tw, cfg, nb, 2
    )
    np.testing.assert_array_equal(np.asarray(k0_dev), ref)
    assert (ref[0] == cfg.k_values[-1]).all()  # unseen buckets -> largest k


def test_gate_accepts_corpus_shapes():
    cfg16 = tiled_config_for_depth(PixelDepth.SIXTEEN)
    # 1081x1081 16-bit at tile 32: 1156 tiles of 1024 px — must be on-device
    assert tiling.k0_device_exact(cfg16, 32 * 32, 1156)
    # absurd: 2^16 tiles per image trips the lo-sum bound
    assert not tiling.k0_device_exact(cfg16, 32 * 32, 1 << 16)
