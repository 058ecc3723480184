#!/usr/bin/env python
"""Hardware check: run all four (color, depth) configs through the compiled
Pallas FLCT kernels on the real TPU chip, asserting exact round-trips.

Usage: python scripts/hw_matrix_check.py [tile_size ...]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def make_image(color: str, depth: int, h: int = 256, w: int = 256):
    rng = np.random.default_rng(7)
    hi = 255 if depth == 8 else 65535
    shape = (h, w) if color == "gray" else (h, w, 3)
    step = 6 if depth == 8 else 900
    img = np.cumsum(np.cumsum(rng.integers(-step, step + 1, shape), 0), 1)
    img = np.clip(img + hi // 2, 0, hi)
    return img.astype(np.uint8 if depth == 8 else np.uint16)


def main():
    import jax

    print("backend:", jax.default_backend(), jax.devices())
    from felics_tpu.config import TileConfig
    from felics_tpu.parallel import tiling

    tiles = [int(a) for a in sys.argv[1:]] or [32, 64]
    failures = []
    for tsz in tiles:
        for color in ("gray", "rgb"):
            for depth in (8, 16):
                tag = f"{color}{depth}/tile{tsz}"
                img = make_image(color, depth)
                tc = TileConfig(tile_h=tsz, tile_w=tsz)
                try:
                    t0 = time.perf_counter()
                    blob = tiling.compress_tiled_bytes(img, tc, engine="pallas")
                    t1 = time.perf_counter()
                    out = tiling.decompress_tiled_bytes(blob, engine="pallas")
                    t2 = time.perf_counter()
                    assert np.array_equal(out, img), "round-trip mismatch"
                    ratio = img.nbytes / len(blob)
                    print(
                        f"OK   {tag}: {len(blob)} B ratio {ratio:.3f} "
                        f"enc {t1-t0:.1f}s dec {t2-t1:.1f}s (incl compile)"
                    )
                except ValueError as e:
                    if "VMEM" in str(e):
                        # By-design: explicit pallas raises on shapes that
                        # cannot fit the kernel plan (auto uses XLA there).
                        print(f"SKIP {tag}: {e}")
                    else:
                        failures.append((tag, repr(e)[:300]))
                        print(f"FAIL {tag}: {repr(e)[:300]}")
                except Exception as e:
                    failures.append((tag, repr(e)[:300]))
                    print(f"FAIL {tag}: {repr(e)[:300]}")
    if failures:
        print(f"\n{len(failures)} FAILURES")
        sys.exit(1)
    print("\nall configs OK")


if __name__ == "__main__":
    main()
