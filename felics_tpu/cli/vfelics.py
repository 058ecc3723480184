"""vfelics — visualize a felics file.

Counterpart of the reference viewer (src/bin/vfelics.rs:17-64, a
show-image/wgpu window). Headless-friendly: decodes and displays via PIL's
viewer when a display is available, otherwise writes a PNG next to the input
(or to --export) and prints the image info.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    from felics_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()  # CLI processes are one-shot: reuse compiled kernels
    parser = argparse.ArgumentParser(
        prog="vfelics", description="Visualizes a felics file"
    )
    parser.add_argument("input", help="The path to the felics file.")
    parser.add_argument(
        "--export", help="Write a PNG here instead of opening a window."
    )
    args = parser.parse_args(argv)

    try:
        with open(args.input, "rb") as f:
            data = f.read()
    except OSError as e:
        print(f"Cannot open input file: {e}")
        return 1

    from felics_tpu.api import decompress_image_bytes

    try:
        image = decompress_image_bytes(data)
    except Exception as e:
        print(f"Error while decompressing the image: {e!r}")
        return 1

    name = os.path.basename(args.input)
    h, w = image.shape[:2]
    kind = "grayscale" if image.ndim == 2 else "rgb"
    print(f"{name}: {w}x{h} {image.dtype} {kind}")

    if args.export:
        from felics_tpu.io.images import save_image

        save_image(args.export, image)
        print(f"Wrote {args.export}")
        return 0

    if os.environ.get("DISPLAY") or sys.platform == "darwin":
        from PIL import Image

        arr8 = image if image.dtype.itemsize == 1 else (image >> 8).astype("uint8")
        Image.fromarray(arr8).show(title=name)
    else:
        out = os.path.splitext(args.input)[0] + ".png"
        from felics_tpu.io.images import save_image

        save_image(out, image)
        print(f"No display available; wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
