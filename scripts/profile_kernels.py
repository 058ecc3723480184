"""Capture a jax.profiler trace of both fused Pallas kernels on the real
chip and print per-kernel DEVICE time (independent cross-check of bench.py's
slope-timing; SURVEY §5 asks for profiler-trace evidence).

Run: python scripts/profile_kernels.py
Writes the raw trace under docs/traces/ and prints a summary table.
"""

import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

from felics_tpu.config import tiled_config_for_depth
from felics_tpu.format import PixelDepth
from felics_tpu.ops import pallas_codec as pc

REPS = 3
OUT = os.path.join(REPO, "docs", "traces")


def main():
    cfg = tiled_config_for_depth(PixelDepth.EIGHT)
    rng = np.random.default_rng(0)
    tiles = np.clip(
        np.cumsum(np.cumsum(rng.integers(-6, 7, (3072, 1, 1024)), 1), 2) + 128,
        0, 255,
    ).astype(np.int32)
    W = 320
    prior = np.zeros((1, 6, 6), np.int32)  # (c, nb, K) at QCTX_CAP=5

    # warm/compile both kernels
    words, bits = pc.encode_tiles(tiles, cfg, 32, 32, W, prior)
    bits_np = np.asarray(bits)
    wd = pc.bucket_words(int(bits_np.max() + 31) // 32)
    cols = np.asarray(words)[:, :wd].astype(np.uint32)
    nw = (bits_np + 31) // 32
    cols[np.arange(wd)[None, :] >= nw[:, None]] = 0
    bufs = pc.decode_tiles(jax.numpy.asarray(cols), cfg, 32, 32, 1, prior)
    np.asarray(bufs[:1, :1])

    os.makedirs(OUT, exist_ok=True)
    with jax.profiler.trace(OUT):
        for _ in range(REPS):
            words, bits = pc.encode_tiles(tiles, cfg, 32, 32, W, prior)
            np.asarray(bits[:1])
            bufs = pc.decode_tiles(
                jax.numpy.asarray(cols), cfg, 32, 32, 1, prior
            )
            np.asarray(bufs[:1, :1])

    traces = sorted(glob.glob(OUT + "/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(traces[-1]) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    procs = {
        e.get("pid"): e.get("args", {}).get("name")
        for e in ev if e.get("name") == "process_name"
    }
    tpu_pids = [p for p, n in procs.items() if n and "TPU" in n]
    tev = [e for e in ev if e.get("pid") in tpu_pids and e.get("ph") == "X"]
    agg = collections.defaultdict(lambda: [0, 0.0])
    for e in tev:
        agg[e["name"]][0] += 1
        agg[e["name"]][1] += e["dur"]
    print(f"device events from {traces[-1]}:")
    for name, (cnt, tot) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:8]:
        print(f"  {name[:64]:64s} x{cnt}  {tot/1000:8.3f} ms total"
              f"  {tot/1000/cnt:7.3f} ms/exec")


if __name__ == "__main__":
    main()
