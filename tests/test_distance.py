"""Goldens for the bounded Euclidean distance transform
(engine/distance.py): kernel vs O(cells × features) brute force, and the
distributed tiled path vs the single-array kernel — including ragged
edge tiles, horizontal wrap, and the all-NaN-beyond-cap region."""

from __future__ import annotations

import numpy as np
import pytest

from engine import distance, fixtures


def brute_capped_edt(arr: np.ndarray, cap: int, pred) -> np.ndarray:
    m = np.asarray(pred(arr), dtype=bool)
    fy, fx = np.nonzero(m)
    H, W = arr.shape
    out = np.full((H, W), np.nan)
    for y in range(H):
        for x in range(W):
            if m[y, x]:
                out[y, x] = 0.0
                continue
            if len(fy):
                d2 = (fy - y) ** 2 + (fx - x) ** 2
                best = d2.min()
                if best <= cap * cap:
                    out[y, x] = np.sqrt(best)
    return out


def _cmp(a, b):
    np.testing.assert_allclose(
        np.nan_to_num(a, nan=-1.0), np.nan_to_num(b, nan=-1.0),
        rtol=0, atol=0,
    )


def test_feature_distance_matches_brute():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 5, (40, 37)).astype(np.float64)
    arr[rng.random((40, 37)) < 0.1] = np.nan
    pred = lambda a: np.nan_to_num(a, nan=-1) == 0  # noqa: E731
    for cap in (1, 3, 7):
        _cmp(distance.feature_distance(arr, cap, pred), brute_capped_edt(arr, cap, pred))


def test_feature_distance_no_features():
    arr = np.ones((8, 8))
    got = distance.feature_distance(arr, 4, lambda a: a > 5)
    assert np.isnan(got).all()


def _collect_plane(df, T, H, W):
    out = np.full((H, W), np.nan)
    for r in df.collect():
        a = np.asarray(r.data, dtype=np.float64).reshape(r.nrows, r.ncols)
        out[r.tile_y * T : r.tile_y * T + r.nrows,
            r.tile_x * T : r.tile_x * T + r.ncols] = a
    return out


def test_distance_transform_equals_single_array(spark):
    """Tiled distributed EDT == the kernel run on the whole raster —
    distances crossing tile borders come from the halo, exactly."""
    arr = fixtures.raster_arith(size=64)
    pred = lambda a: np.nan_to_num(a, nan=-1) == 0  # noqa: E731
    cap = 6
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="class"),
        fixtures.TILES_SCHEMA_DDL,
    )
    out = distance.distance_transform(tiles, 16, cap, pred)
    got = _collect_plane(out, 16, 64, 64)
    _cmp(got, distance.feature_distance(arr, cap, pred))


def test_distance_transform_wrap(spark):
    """Horizontal wrap: a feature in the last tile column is 1 cell away
    from the first column, through the wrap seam."""
    H = W = 32
    T = 16
    arr = np.ones((H, W))
    arr[5, W - 1] = 0.0  # single feature at the right edge
    pred = lambda a: a == 0  # noqa: E731
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, T, band="class"),
        fixtures.TILES_SCHEMA_DDL,
    )
    got = _collect_plane(
        distance.distance_transform(tiles, T, 3, pred, wrap_nx=W // T), T, H, W
    )
    assert got[5, 0] == pytest.approx(1.0)  # across the seam
    assert got[5, W - 2] == pytest.approx(1.0)
    assert np.isnan(got[5, 10])  # interior beyond cap


def test_distance_transform_plan_one_exchange(spark):
    """Capped EDT is ONE halo exchange + one applyInPandas — same
    physical shape as every focal stat."""
    arr = fixtures.raster_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="class"),
        fixtures.TILES_SCHEMA_DDL,
    )
    d = distance.distance_transform(tiles, 16, 6, lambda a: a > 0)
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
