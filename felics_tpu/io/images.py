"""Image file IO.

Counterpart of the reference's use of the Rust ``image`` crate
(src/bin/cfelics.rs:36-50): load any PIL/imageio-readable file into the four
supported array shapes (Luma8/Luma16/Rgb8/Rgb16), save by output extension.
"""

from __future__ import annotations

import numpy as np


class UnsupportedImageFormat(Exception):
    pass


def load_image(path: str) -> np.ndarray:
    """Load to (H, W) or (H, W, 3) uint8/uint16.

    Mirrors the reference's DynamicImage match (cfelics.rs:52-70): grayscale
    and RGB at 8/16 bits are supported; anything else (palette, alpha, float)
    raises UnsupportedImageFormat.
    """
    # imageio first: it preserves true sample depth (PIL silently narrows
    # 16-bit RGB TIFFs to 8-bit "RGB" mode).
    try:
        import imageio.v3 as iio

        arr = np.asarray(iio.imread(path))
        if arr.dtype in (np.uint8, np.uint16):
            if arr.ndim == 2:
                return arr
            if arr.ndim == 3 and arr.shape[2] == 3:
                return arr
            if arr.ndim == 3 and arr.shape[2] == 1:
                return arr[..., 0]
        if arr.dtype == np.int32 and arr.ndim == 2:
            if 0 <= arr.min(initial=0) and arr.max(initial=0) <= 65535:
                return arr.astype(np.uint16)
    except FileNotFoundError:
        raise
    except Exception:
        arr = None

    from PIL import Image

    with Image.open(path) as im:
        mode = im.mode
        if mode == "L":
            return np.asarray(im, dtype=np.uint8)
        if mode in ("I;16", "I;16B", "I;16L"):
            return np.asarray(im, dtype=np.uint16)
        if mode == "RGB":
            return np.asarray(im, dtype=np.uint8)
        if mode in ("P", "1"):
            # The Rust image crate decodes palette/bilevel sources to
            # Rgb8/Luma8 before cfelics sees them; match that. Alpha modes
            # stay unsupported like the reference (cfelics.rs:66-69).
            target = "L" if mode == "1" else "RGB"
            return np.asarray(im.convert(target), dtype=np.uint8)
    raise UnsupportedImageFormat(
        f"unsupported image format: {mode if arr is None else (arr.dtype, arr.shape)}"
    )


def save_image(path: str, image: np.ndarray) -> None:
    """Save by extension (reference: dfelics.rs:44-52 uses image::save)."""
    if image.dtype == np.uint8:
        from PIL import Image

        mode = "L" if image.ndim == 2 else "RGB"
        Image.fromarray(image, mode=mode).save(path)
        return
    # 16-bit: PIL's writer support is spotty; imageio handles PNG/TIFF.
    import imageio.v3 as iio

    iio.imwrite(path, image)
