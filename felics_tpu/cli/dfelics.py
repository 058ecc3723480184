"""dfelics — decompress a felics file to another image file.

Parity with the reference CLI (src/bin/dfelics.rs:9-58): ``-i/--input``
``-o/--output``; the output format is determined by the output extension.
Handles both FLCS and FLCT containers transparently.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    from felics_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()  # CLI processes are one-shot: reuse compiled kernels
    parser = argparse.ArgumentParser(
        prog="dfelics",
        description="Decompresses a felics file to another image file",
    )
    parser.add_argument("-i", "--input", required=True, help="The input felics file.")
    parser.add_argument(
        "-o",
        "--output",
        required=True,
        help="The output file; format chosen by its extension.",
    )
    parser.add_argument(
        "--backend",
        choices=["auto", "oracle", "native", "jax"],
        default="auto",
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
        image = decompress_image_bytes(data, backend=args.backend)
    except Exception as e:
        print(f"Error while decompressing the image: {e!r}")
        return 1

    from felics_tpu.io.images import save_image

    try:
        save_image(args.output, image)
    except Exception as e:
        print(f"Cannot save image: {e}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
