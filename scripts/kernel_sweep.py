#!/usr/bin/env python
"""Kernel-parameter sweep for the gray8 fused Mosaic codec (DESIGN §7.1
headroom hunt, VERDICT r4 item 7): vary the VMEM budget, pixel-chunk
target, and lane-block cap; slope-time encode+decode per combo in a FRESH
subprocess (plan caches are process-local, and each combo's kernels get
their own Mosaic compile, persisted in .jax_cache).

Writes one JSON line per combo; summarize into the DESIGN table.

Usage: python scripts/kernel_sweep.py            # full sweep (~30-60 min cold)
       python scripts/kernel_sweep.py --combo VMEM=12582912,CHUNK=512  # one
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMBOS = [
    # (label, env overrides)
    ("baseline 12M/auto/2048", {}),
    ("vmem 8M", {"FELICS_TPU_VMEM_BUDGET": str(8 * 1024 * 1024)}),
    ("vmem 14M", {"FELICS_TPU_VMEM_BUDGET": str(14 * 1024 * 1024)}),
    ("chunk 1024", {"FELICS_TPU_CHUNK_TARGET": "1024"}),
    ("chunk 256", {"FELICS_TPU_CHUNK_TARGET": "256"}),
    ("chunk 128", {"FELICS_TPU_CHUNK_TARGET": "128"}),
    ("blockcap 1024", {"FELICS_TPU_LANE_BLOCK_CAP": "1024"}),
    ("blockcap 4096 vmem 14M", {
        "FELICS_TPU_LANE_BLOCK_CAP": "4096",
        "FELICS_TPU_VMEM_BUDGET": str(14 * 1024 * 1024),
    }),
]

WORKER = r"""
import json, sys, os
sys.path.insert(0, %(repo)r)
import numpy as np
import jax
try:
    jax.config.update("jax_compilation_cache_dir", %(repo)r + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
import bench
from felics_tpu.format import ColorType, PixelDepth
from felics_tpu.ops import pallas_codec as pc
from felics_tpu.config import tiled_config_for_depth
images = bench.load_batch()
cfg = tiled_config_for_depth(PixelDepth.EIGHT)
plan = pc.kernel_plan(cfg, bench.TILE, bench.TILE, 1,
                      pc.width_hint(cfg, bench.TILE * bench.TILE, 1))
mpxs, t_enc, t_dec, ratio, n_tiles, pixels = bench.tpu_bench(
    images, ColorType.GRAY, PixelDepth.EIGHT)
print("SWEEP " + json.dumps({
    "plan_sc_nr_b_chunks": plan, "mpxs": round(mpxs, 1),
    "t_enc_ms": round(t_enc * 1e3, 2), "t_dec_ms": round(t_dec * 1e3, 2),
}))
"""


def run_combo(label, env_over):
    env = dict(os.environ)
    env.update(env_over)
    r = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": REPO}],
        capture_output=True, text=True, timeout=3000, env=env, cwd=REPO,
    )
    out = [l for l in r.stdout.splitlines() if l.startswith("SWEEP ")]
    if not out:
        print(json.dumps({"combo": label, "error": r.stderr[-400:]}),
              flush=True)
        return
    rec = json.loads(out[-1][6:])
    rec["combo"] = label
    rec["env"] = env_over
    print(json.dumps(rec), flush=True)


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--combo":
        kv = dict(p.split("=") for p in sys.argv[2].split(","))
        run_combo("custom", kv)
        return
    for label, env_over in COMBOS:
        run_combo(label, env_over)


if __name__ == "__main__":
    main()
