"""Break down encode_tiles_payload's 220ms on the pallas path."""
import os, sys, time
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax
import jax.numpy as jnp

cache = os.path.join(REPO, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import load_batch, TILE
from felics_tpu.config import tiled_config_for_depth
from felics_tpu.format import ColorType, PixelDepth
from felics_tpu.ops import pallas_codec as pc
from felics_tpu.ops.kscan_tiled import num_buckets
from felics_tpu.parallel import tiling


def t(label, fn, n=3):
    best = float("inf"); r = None
    for _ in range(n):
        t0 = time.perf_counter(); r = fn(); best = min(best, time.perf_counter() - t0)
    print(f"{label:45s} {best*1e3:8.1f} ms")
    return r


images = load_batch()
cfg = tiled_config_for_depth(PixelDepth.EIGHT)
nb = num_buckets(cfg)
th = tw = TILE
parts = [tiling._prepare_tiles(im, ColorType.GRAY, th, tw) for im in images]
tiles_np = np.concatenate([p[0] for p in parts])
nt, c, tt = tiles_np.shape
tile_group = np.repeat(np.arange(len(images)), [p[0].shape[0] for p in parts])

nd = tiling.narrow_tile_dtype(cfg.depth_bits, c)
tiles_dev = jax.block_until_ready(jnp.asarray(tiles_np.astype(nd)))
tg = jnp.asarray(tile_group, jnp.int32)
k0_dev, prior_dev = jax.block_until_ready(
    tiling.compute_k0_prior_jax(tiles_dev, tg, th, tw, cfg, nb, len(images))
)

W = pc.width_hint(cfg, tt, c)
print(f"nt={nt} t={tt} W(hint)={W} words -> words matrix {nt*W*4/1e6:.2f} MB")

# warm
words, bits = pc.encode_tiles(tiles_dev, cfg, th, tw, W, prior_dev)
jax.block_until_ready((words, bits))

def enc_only():
    w, b = pc.encode_tiles(tiles_dev, cfg, th, tw, W, prior_dev)
    jax.block_until_ready(b)
    return w, b

words, bits = t("encode_tiles dispatch+sync(bits)", enc_only)
t("device_get bits+k0", lambda: jax.device_get((bits, k0_dev)))
wnp = t("np.asarray(words) FULL fetch", lambda: np.asarray(words))
bits_np = np.asarray(jax.device_get(bits)).astype(np.int64)
tb = ((bits_np + 7) // 8).astype(np.int64)
print(f"actual payload {int(tb.sum())/1e6:.2f} MB; max tile words used "
      f"{int((bits_np.max()+31)//32)}")
t("_columns_to_payload (host)", lambda: tiling._columns_to_payload(wnp, tb))

t("FULL encode_tiles_payload", lambda: tiling.encode_tiles_payload(
    tiles_dev, prior_dev, cfg, th, tw, "pallas", extra=k0_dev))
