"""Local map algebra + point drill vs whole-array NumPy."""

from __future__ import annotations

import numpy as np
import pandas as pd

from engine import algebra, fixtures

RECLASS = {0: 10.0, 1: 20.0, 2: 20.0, 3: 30.0}


def _reclass_np(arr: np.ndarray) -> np.ndarray:
    out = np.full(arr.shape, np.nan)
    for k, v in RECLASS.items():
        out[arr == k] = v
    return out


def test_reclassify(spark):
    arr = fixtures.raster_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="class"),
        fixtures.TILES_SCHEMA_DDL,
    )
    out = algebra.reclassify(tiles, 16, RECLASS).toPandas()
    got = fixtures.array_from_tiles_rows(out, 16)
    np.testing.assert_allclose(got, _reclass_np(arr), rtol=0, equal_nan=True)
    assert (out.band == "reclass").all()


def test_reclassify_unmapped_default(spark):
    arr = np.array([[0.0, 5.0], [np.nan, 3.0]])
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 2, band="class"),
        fixtures.TILES_SCHEMA_DDL,
    )
    out = algebra.reclassify(tiles, 2, RECLASS, default=-1.0).toPandas()
    got = np.asarray(out.iloc[0].data).reshape(2, 2)
    # unmapped finite (5.0) -> default; NaN nodata STAYS NaN (§2 L2)
    np.testing.assert_allclose(
        got, [[10.0, -1.0], [np.nan, 30.0]], rtol=0, equal_nan=True
    )


def test_local_map_normalized_difference(spark):
    dem = fixtures.dem_arith(size=64)
    cls = fixtures.raster_arith(size=64)
    tiles = spark.createDataFrame(
        pd.concat(
            [
                fixtures.tiles_rows_from_array(dem, 16, band="z"),
                fixtures.tiles_rows_from_array(cls, 16, band="class"),
            ],
            ignore_index=True,
        ),
        fixtures.TILES_SCHEMA_DDL,
    )

    # self-contained closure: workers can't import the tests/ module,
    # so no references to module-level helpers here
    reclass = dict(RECLASS)

    def nd(got):
        rc = np.full(got["class"].shape, np.nan)
        for k, v in reclass.items():
            rc[got["class"] == k] = v
        return (got["z"] - rc) / (got["z"] + rc)

    out = algebra.local_map(tiles, 16, "nd", nd, ["z", "class"]).toPandas()
    got = fixtures.array_from_tiles_rows(out, 16)
    want = (dem - _reclass_np(cls)) / (dem + _reclass_np(cls))
    np.testing.assert_allclose(got, want, rtol=1e-12, equal_nan=True)


def test_sample_raster_cogroup(spark):
    arr = fixtures.dem_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    rng = np.random.default_rng(3)
    pts = pd.DataFrame(
        {
            "doc_id": np.arange(500, dtype=np.int64),
            "gi": rng.integers(0, 64, 500),
            "gj": rng.integers(0, 64, 500),
        }
    )
    pts["tile_x"] = pts.gi // 16
    pts["tile_y"] = pts.gj // 16
    pts["ti"] = pts.gi % 16
    pts["tj"] = pts.gj % 16
    pdf = spark.createDataFrame(
        pts.astype({"tile_x": "int32", "tile_y": "int32", "ti": "int32", "tj": "int32"})
    )
    out = algebra.sample_raster(pdf, tiles, 16, "z").toPandas()
    assert len(out) == 500
    merged = out.merge(pts, on="doc_id")
    want = arr[merged.gj.to_numpy(), merged.gi.to_numpy()]
    np.testing.assert_allclose(merged.value.to_numpy(), want, rtol=0, equal_nan=True)


def test_sample_raster_absent_tile_drops_points(spark):
    arr = fixtures.dem_arith(size=32)
    rows = fixtures.tiles_rows_from_array(arr, 16, band="z")
    tiles = spark.createDataFrame(
        rows[(rows.tile_x == 0) & (rows.tile_y == 0)], fixtures.TILES_SCHEMA_DDL
    )
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "tile_x": np.array([0, 1], dtype="int32"),
                "tile_y": np.array([0, 1], dtype="int32"),
                "ti": np.array([3, 3], dtype="int32"),
                "tj": np.array([4, 4], dtype="int32"),
            }
        )
    )
    out = algebra.sample_raster(pts, tiles, 16, "z").toPandas()
    assert out.doc_id.tolist() == [1]
    np.testing.assert_allclose(out.value.iloc[0], arr[4, 3], rtol=0)
