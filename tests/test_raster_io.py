"""ESRI ASCII grid interchange: parse/format round-trip and the
file → tiles → focal → file path against the NumPy kernels."""

from __future__ import annotations

import numpy as np

from engine import fixtures, kernels, raster_io, tiling


def test_ascii_grid_text_roundtrip():
    arr = fixtures.raster_arith(size=32)
    txt = raster_io.format_ascii_grid(arr, xllcorner=-1.5, cellsize=0.25)
    back, hdr = raster_io.parse_ascii_grid(txt)
    assert hdr["ncols"] == 32 and hdr["cellsize"] == 0.25
    np.testing.assert_array_equal(np.isnan(back), np.isnan(arr))
    np.testing.assert_array_equal(back[np.isfinite(back)], arr[np.isfinite(arr)])


def test_ascii_grid_parses_wrapped_body_lines():
    """The ESRI format permits arbitrary line wrapping of body values
    (GRASS wraps at 80 chars) — one body line per row must not be
    assumed."""
    arr = fixtures.raster_arith(size=8)
    txt = raster_io.format_ascii_grid(arr)
    head, body = txt.split("\n", 6)[:6], txt.split("\n")[6:]
    # re-wrap the whole body at ~5 tokens per line
    tokens = " ".join(body).split()
    wrapped = [" ".join(tokens[i : i + 5]) for i in range(0, len(tokens), 5)]
    back, _ = raster_io.parse_ascii_grid("\n".join(head + wrapped) + "\n")
    np.testing.assert_array_equal(
        np.nan_to_num(back, nan=-9), np.nan_to_num(arr, nan=-9)
    )


def test_write_ascii_grid_rejects_multiband(spark):
    """Multi-band rows share tile keys and would silently overwrite
    each other in the assembled array — loud failure instead."""
    import pytest

    arr = fixtures.raster_fixture(seed=3)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16), fixtures.TILES_SCHEMA_DDL
    )
    out = tiling.apply_focal(tiles, 2, "square", ["mean", "max"], 16, level=0)
    with pytest.raises(ValueError, match="single band"):
        raster_io.write_ascii_grid(out, 16, "/tmp/never_written.asc")


def test_ascii_grid_to_focal_roundtrip(spark, tmp_path):
    arr = fixtures.raster_fixture(seed=11)
    src = str(tmp_path / "in.asc")
    with open(src, "w") as f:
        f.write(raster_io.format_ascii_grid(arr))
    tiles = raster_io.read_ascii_grid(spark, src, tile_size=16)
    out = tiling.apply_focal(tiles, 3, "square", ["mean"], 16, level=0)
    dst = str(tmp_path / "out.asc")
    raster_io.write_ascii_grid(out, 16, dst, band="mean")
    with open(dst) as f:
        got, _ = raster_io.parse_ascii_grid(f.read())
    want = kernels.focal_mean(arr, 3, "square")
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12, equal_nan=True)
