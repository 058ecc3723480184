"""CLI tests: compress/decompress/view round trips through the real argv
surface, mirroring the reference binaries' flag contract."""

import os

import numpy as np
import pytest

from felics_tpu.cli import cfelics, dfelics, vfelics
from felics_tpu.io.images import load_image, save_image


@pytest.fixture
def gray_tiff(tmp_path, rng):
    img = rng.integers(0, 256, size=(24, 31)).astype(np.uint8)
    path = str(tmp_path / "in.tiff")
    save_image(path, img)
    return path, img


@pytest.fixture
def rgb16_tiff(tmp_path, rng):
    img = rng.integers(0, 65536, size=(9, 13, 3)).astype(np.uint16)
    path = str(tmp_path / "in16.tiff")
    save_image(path, img)
    return path, img


def test_round_trip_cli(tmp_path, gray_tiff):
    path, img = gray_tiff
    fel = str(tmp_path / "out.fel")
    png = str(tmp_path / "out.png")
    assert cfelics.main(["-i", path, "-o", fel]) == 0
    assert os.path.getsize(fel) > 14
    assert dfelics.main(["-i", fel, "-o", png]) == 0
    np.testing.assert_array_equal(load_image(png), img)


def test_round_trip_cli_rgb16(tmp_path, rgb16_tiff):
    path, img = rgb16_tiff
    fel = str(tmp_path / "out.fel")
    out = str(tmp_path / "out.tiff")
    assert cfelics.main(["-i", path, "-o", fel]) == 0
    assert dfelics.main(["-i", fel, "-o", out]) == 0
    np.testing.assert_array_equal(load_image(out), img)


def test_round_trip_cli_tiled(tmp_path, gray_tiff):
    path, img = gray_tiff
    fel = str(tmp_path / "out.flct")
    png = str(tmp_path / "out.png")
    assert cfelics.main(
        ["-i", path, "-o", fel, "--container", "flct", "--tile-size", "16"]
    ) == 0
    with open(fel, "rb") as f:
        assert f.read(4) == b"FLCT"
    assert dfelics.main(["-i", fel, "-o", png]) == 0
    np.testing.assert_array_equal(load_image(png), img)


def test_cfelics_missing_input(tmp_path, capsys):
    rc = cfelics.main(["-i", str(tmp_path / "nope.tiff"), "-o", str(tmp_path / "x.fel")])
    assert rc == 1
    assert "Cannot open file" in capsys.readouterr().out


def test_dfelics_garbage_input(tmp_path, capsys):
    bad = tmp_path / "bad.fel"
    bad.write_bytes(b"not a felics file at all")
    rc = dfelics.main(["-i", str(bad), "-o", str(tmp_path / "x.png")])
    assert rc == 1
    assert "Error while decompressing" in capsys.readouterr().out


def test_vfelics_export(tmp_path, gray_tiff, capsys):
    path, img = gray_tiff
    fel = str(tmp_path / "v.fel")
    assert cfelics.main(["-i", path, "-o", fel]) == 0
    png = str(tmp_path / "v.png")
    assert vfelics.main([fel, "--export", png]) == 0
    np.testing.assert_array_equal(load_image(png), img)
    assert "24" in capsys.readouterr().out  # prints dims


def test_header_probe_tool(tmp_path, gray_tiff):
    # Metadata read without decompression through the public API.
    import io

    from felics_tpu import read_header

    path, img = gray_tiff
    fel = str(tmp_path / "h.fel")
    assert cfelics.main(["-i", path, "-o", fel]) == 0
    with open(fel, "rb") as f:
        h = read_header(f)
    assert (h.width, h.height) == (31, 24)
