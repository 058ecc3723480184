"""Additional cross-implementation and edge coverage."""

import numpy as np
import pytest

from felics_tpu.api import compress_image_bytes, decompress_image_bytes
from felics_tpu.config import TileConfig


@pytest.fixture(scope="module", autouse=True)
def built_native():
    import subprocess
    import sys

    subprocess.run([sys.executable, "native/build.py"], check=True)


def smooth(rng, w, h, dtype=np.uint8, channels=None):
    shape = (h, w) if channels is None else (h, w, channels)
    img = np.cumsum(np.cumsum(rng.integers(-6, 7, shape), 0), 1) + 128
    return np.clip(img, 0, np.iinfo(dtype).max).astype(dtype)


def test_rgb16_flct_batch_round_trip(rng):
    from felics_tpu.parallel.batch import compress_tiled_batch, decompress_tiled_batch

    images = [smooth(rng, 40, 24, np.uint16, 3), smooth(rng, 16, 48, np.uint16, 3)]
    blobs = compress_tiled_batch(images, TileConfig(tile_h=16, tile_w=16))
    outs = decompress_tiled_batch(blobs)
    for im, out in zip(images, outs):
        np.testing.assert_array_equal(out, im)
        assert out.dtype == np.uint16


def test_jax_scan_decoder_reads_native_flcs(rng):
    img = smooth(rng, 24, 18, np.uint16, 3)
    data = compress_image_bytes(img, backend="native")
    out = decompress_image_bytes(data, backend="jax")
    np.testing.assert_array_equal(out, img)


def test_native_decodes_jax_flcs(rng):
    img = smooth(rng, 31, 17, np.uint8, 3)
    data = compress_image_bytes(img, backend="jax")
    out = decompress_image_bytes(data, backend="native")
    np.testing.assert_array_equal(out, img)


def test_all_four_format_combos_all_backends(rng):
    for dtype in (np.uint8, np.uint16):
        for channels in (None, 3):
            img = smooth(rng, 18, 14, dtype, channels)
            blobs = {
                b: compress_image_bytes(img, backend=b)
                for b in ("oracle", "native", "jax")
            }
            assert len(set(blobs.values())) == 1, (dtype, channels)
            for db in ("oracle", "native", "jax"):
                out = decompress_image_bytes(blobs["native"], backend=db)
                np.testing.assert_array_equal(out, img)


def test_flct_extreme_tile_clamp(rng):
    # tile bigger than the image in one dim only
    img = smooth(rng, 100, 3, np.uint8)
    data = compress_image_bytes(img, container="flct", tile=TileConfig(64, 64))
    np.testing.assert_array_equal(decompress_image_bytes(data), img)


def test_flct_header_probe():
    from felics_tpu.parallel.tiling import read_tiled_header

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    data = compress_image_bytes(img, container="flct", tile=TileConfig(16, 16))
    hdr = read_tiled_header(data)
    assert (hdr.width, hdr.height, hdr.n_tiles) == (56, 40, 12)


def test_version_exported():
    import felics_tpu

    assert felics_tpu.__version__


def test_bfelics_smoke(tmp_path, rng):
    import shutil

    from felics_tpu.cli import bfelics
    from felics_tpu.io.images import save_image

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for i in range(3):
        save_image(str(corpus / f"im{i}.tiff"), smooth(rng, 32, 32))
    rc = bfelics.main(
        ["--corpus", str(corpus), "--out", str(tmp_path / "out"), "--backend", "native"]
    )
    assert rc == 0
    out_fels = list((tmp_path / "out" / "to_felics").glob("*.fel"))
    assert len(out_fels) == 3
    # jp2 column (reference DOC.md:553 compares jp2): present whenever the
    # OpenJPEG codec is built into PIL, and losslessly round-trippable.
    from PIL import Image, features

    if features.check("jpg_2000"):
        out_jp2 = sorted((tmp_path / "out" / "to_jp2").glob("*.jp2"))
        assert len(out_jp2) == 3
        src = np.asarray(Image.open(str(corpus / "im0.tiff")))
        assert np.array_equal(np.asarray(Image.open(str(out_jp2[0]))), src)


def test_probe_both_containers(rng):
    import felics_tpu

    img = smooth(rng, 24, 18, np.uint16, 3)
    flcs = compress_image_bytes(img, backend="native")
    info = felics_tpu.probe(flcs)
    assert info == {
        "container": "flcs", "color_type": "rgb", "pixel_depth": 16,
        "width": 24, "height": 18,
    }
    flct = compress_image_bytes(img, container="flct", tile=TileConfig(16, 16))
    info = felics_tpu.probe(flct)
    assert info["container"] == "flct"
    assert (info["width"], info["height"], info["n_tiles"]) == (24, 18, 4)
    from felics_tpu.parallel import tiling

    hdr = tiling.read_tiled_header(flct)
    assert info["payload_bytes"] == len(flct) - hdr.payload_off
    assert info["payload_bytes"] == int(hdr.tile_lengths.sum())
