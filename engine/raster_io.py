"""Raster interchange I/O (S6 upgrade): ESRI ASCII grid (.asc).

The reference library reads/writes rasters through GDAL
(SURVEY.md §1.1); no GDAL/rasterio exists in this sandbox, so the
engine's native at-scale raster format is the parquet tiles table
(TILES_SCHEMA). This module adds the one raster interchange format
that needs no binary codec — ESRI ASCII grid — so externally produced
rasters can enter the tile pipeline and focal results can leave it in
a GIS-readable form.

Scale note: an .asc file is a single text artifact — inherently a
driver-side interchange path (like any single-file import), parsed
with NumPy and split into tile rows. At 100 TB rasters live as
partitioned parquet tiles; use these helpers at the edges only.
"""

from __future__ import annotations

import numpy as np

try:  # import-safe without Spark (shared with pure-NumPy tests)
    from pyspark.sql import DataFrame, SparkSession
except ImportError:  # pragma: no cover
    DataFrame = SparkSession = None  # type: ignore[assignment]

from engine import fixtures

_HEADER_KEYS = ("ncols", "nrows", "xllcorner", "yllcorner", "cellsize")


def parse_ascii_grid(text: str) -> tuple[np.ndarray, dict]:
    """.asc text → (array float64 with NaN nodata, header dict).

    Header: ncols/nrows/xllcorner/yllcorner/cellsize[/nodata_value],
    case-insensitive, then nrows lines of ncols values, NORTH row
    first (the .asc convention); returned array is row 0 = north."""
    lines = [ln for ln in text.splitlines() if ln.strip()]
    hdr: dict = {}
    body_start = 0
    for k, ln in enumerate(lines):
        parts = ln.split()
        if len(parts) == 2 and parts[0].lower() in (*_HEADER_KEYS, "nodata_value"):
            hdr[parts[0].lower()] = float(parts[1])
            body_start = k + 1
        else:
            break
    missing = [k for k in _HEADER_KEYS if k not in hdr]
    if missing:
        raise ValueError(f"ascii grid header missing {missing}")
    nrows, ncols = int(hdr["nrows"]), int(hdr["ncols"])
    # parse the FLAT token stream, not line-by-line: the ESRI format
    # permits arbitrary line wrapping of body values (GRASS wraps at 80
    # chars), so a row need not be one line
    tokens = " ".join(lines[body_start:]).split()
    if len(tokens) != nrows * ncols:
        raise ValueError(
            f"ascii grid body has {len(tokens)} values != header "
            f"({nrows} x {ncols})"
        )
    arr = np.asarray(tokens, dtype=np.float64).reshape(nrows, ncols)
    if "nodata_value" in hdr:
        arr[arr == hdr["nodata_value"]] = np.nan
    return arr, hdr


def format_ascii_grid(
    arr: np.ndarray,
    xllcorner: float = 0.0,
    yllcorner: float = 0.0,
    cellsize: float = 1.0,
    nodata_value: float = -9999.0,
) -> str:
    H, W = arr.shape
    out = [
        f"ncols {W}",
        f"nrows {H}",
        f"xllcorner {xllcorner!r}",
        f"yllcorner {yllcorner!r}",
        f"cellsize {cellsize!r}",
        f"nodata_value {nodata_value!r}",
    ]
    body = np.where(np.isfinite(arr), arr, nodata_value)
    # repr(float(v)), not repr(v): numpy >= 2.0 reprs scalars as
    # 'np.float64(...)', which would corrupt the file; Python float
    # repr is the same shortest-roundtrip text on every numpy
    out.extend(" ".join(repr(float(v)) for v in row) for row in body)
    return "\n".join(out) + "\n"


def read_ascii_grid(
    spark: "SparkSession", path: str, tile_size: int, level: int = 0,
    band: str = "class",
) -> "DataFrame":
    """.asc file → tiles DataFrame (TILES_SCHEMA), ready for
    apply_focal / build_patches. Row 0 of the file (north) becomes
    tile_y=0, matching the y-down tile convention."""
    with open(path) as f:
        arr, _ = parse_ascii_grid(f.read())
    rows = fixtures.tiles_rows_from_array(arr, tile_size, level=level, band=band)
    return spark.createDataFrame(rows, fixtures.TILES_SCHEMA_DDL)


def write_ascii_grid(
    tiles: "DataFrame", tile_size: int, path: str, band: str | None = None,
    nodata_value: float = -9999.0,
) -> None:
    """Tiles DataFrame (one band) → .asc file (driver-side assemble —
    interchange path, see module docstring)."""
    from pyspark.sql import functions as F

    pdf = tiles.toPandas() if band is None else (
        tiles.filter(F.col("band") == band).toPandas()
    )
    # loud single-band contract: multi-band rows share tile keys and
    # would silently overwrite each other in the assembled array
    if "band" in pdf.columns and pdf["band"].nunique() > 1:
        raise ValueError(
            "write_ascii_grid needs a single band; got "
            f"{sorted(pdf['band'].unique())} — pass band=..."
        )
    if pdf.duplicated(["tile_x", "tile_y"]).any():
        raise ValueError(
            "write_ascii_grid: duplicate tile keys in input "
            "(multi-level tiles? filter to one level first)"
        )
    arr = fixtures.array_from_tiles_rows(pdf, tile_size)
    with open(path, "w") as f:
        f.write(format_ascii_grid(arr, nodata_value=nodata_value))
