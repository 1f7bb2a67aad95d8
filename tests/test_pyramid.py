"""Overview pyramid: tiled path vs whole-array NumPy block reduction."""

from __future__ import annotations

import numpy as np

from engine import fixtures, pyramid


def _full(arr: np.ndarray, agg: str, n: int) -> list[np.ndarray]:
    out = []
    cur = arr
    for _ in range(n):
        cur = pyramid.block_reduce(cur, agg)
        out.append(cur)
    return out


def test_block_reduce_semantics():
    a = np.array(
        [[1.0, 2.0, np.nan, np.nan],
         [3.0, np.nan, np.nan, np.nan],
         [5.0, 5.0, 7.0, 8.0],
         [5.0, 2.0, 9.0, 10.0]]
    )
    np.testing.assert_allclose(
        pyramid.block_reduce(a, "mean"),
        [[2.0, np.nan], [4.25, 8.5]],
    )
    np.testing.assert_allclose(
        pyramid.block_reduce(a, "max"), [[3.0, np.nan], [5.0, 10.0]]
    )
    # mode: {5,5,5,2} -> 5; {1,2,3,nan} all count 1, tie -> smallest = 1
    np.testing.assert_allclose(
        pyramid.block_reduce(a, "mode"), [[1.0, np.nan], [5.0, 7.0]]
    )


def test_pyramid_two_levels(spark):
    arr = fixtures.dem_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, level=10, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    out = pyramid.build_pyramid(tiles, 16, level=10, n_levels=2, agg="mean").toPandas()
    want9, want8 = _full(arr, "mean", 2)
    got9 = fixtures.array_from_tiles_rows(out[out.level == 9], 16)
    got8 = fixtures.array_from_tiles_rows(out[out.level == 8], 16)
    np.testing.assert_allclose(got9, want9, rtol=1e-12, equal_nan=True)
    # level 8 is a single ragged 32x32 of data inside one T=16 tile? no:
    # 64 -> 32 -> 16 cells = one full 16x16 tile at level 8
    np.testing.assert_allclose(got8, want8, rtol=1e-12, equal_nan=True)


def test_pyramid_mode_classes(spark):
    arr = fixtures.raster_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, level=10, band="class"),
        fixtures.TILES_SCHEMA_DDL,
    )
    out = pyramid.build_overview(tiles, 16, level=10, agg="mode").toPandas()
    got = fixtures.array_from_tiles_rows(out, 16)
    (want,) = _full(arr, "mode", 1)
    np.testing.assert_allclose(got, want, rtol=0, equal_nan=True)


def test_sparse_parent_quadrants(spark):
    """Only one child tile present -> parent tile exists, sized to the
    covered extent (trailing absent quadrants trim; leading absent
    quadrants inside the extent fill NaN)."""
    arr = fixtures.dem_arith(size=32)
    rows = fixtures.tiles_rows_from_array(arr, 16, level=10, band="z")
    rows = rows[(rows.tile_x == 1) & (rows.tile_y == 0)]  # NE child only
    tiles = spark.createDataFrame(rows, fixtures.TILES_SCHEMA_DDL)
    out = pyramid.build_overview(tiles, 16, level=10, agg="mean").toPandas()
    assert len(out) == 1 and out.iloc[0].tile_x == 0 and out.iloc[0].tile_y == 0
    r = out.iloc[0]
    assert (r.nrows, r.ncols) == (8, 16)  # rows trim (no qy=1 child)
    got = np.asarray(r.data).reshape(8, 16)
    assert np.isnan(got[:, :8]).all()  # NW quadrant inside extent: NaN
    want = pyramid.block_reduce(arr[0:16, 16:32], "mean")
    np.testing.assert_allclose(got[:, 8:16], want, rtol=1e-12, equal_nan=True)


def test_pyramid_ragged_odd_edge_tiles(spark):
    """51x45 raster, T=16 → edge tiles 3 and 13 wide (odd ragged): the
    overview must neither crash (odd-dim block_reduce) nor invent NaN
    cells beyond the true extent — the assembled level-down raster
    equals the whole-array NumPy reduction, extent exactly ceil/2."""
    rng = np.random.default_rng(11)
    arr = rng.uniform(0, 10, (45, 51))
    arr[rng.random((45, 51)) < 0.05] = np.nan
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, level=10, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    out = pyramid.build_overview(tiles, 16, level=10, agg="mean").toPandas()
    want = pyramid.block_reduce(arr, "mean")  # (23, 26)
    # stitch ragged parents by offsets (parent tiles are still T=16)
    H = max(int(r.tile_y) * 16 + int(r.nrows) for r in out.itertuples())
    W = max(int(r.tile_x) * 16 + int(r.ncols) for r in out.itertuples())
    assert (H, W) == want.shape
    got = np.full((H, W), np.nan)
    for r in out.itertuples(index=False):
        blk = np.asarray(r.data, dtype=np.float64).reshape(r.nrows, r.ncols)
        got[r.tile_y * 16 : r.tile_y * 16 + r.nrows,
            r.tile_x * 16 : r.tile_x * 16 + r.ncols] = blk
    np.testing.assert_allclose(got, want, rtol=1e-12, equal_nan=True)
