"""Zonal statistics: tiled partial+final path vs whole-array NumPy."""

from __future__ import annotations

import numpy as np
import pandas as pd

from engine import fixtures, zonal


def test_zonal_stats_matches_bruteforce(spark):
    zones_arr = fixtures.raster_arith(size=64)
    vals_arr = fixtures.dem_arith(size=64)
    tiles = spark.createDataFrame(
        pd.concat(
            [
                fixtures.tiles_rows_from_array(zones_arr, 16, band="zone"),
                fixtures.tiles_rows_from_array(vals_arr, 16, band="z"),
            ],
            ignore_index=True,
        ),
        fixtures.TILES_SCHEMA_DDL,
    )
    got = (
        zonal.zonal_stats(tiles, 16, zone_band="zone", value_band="z")
        .toPandas()
        .set_index("zone")
        .sort_index()
    )
    ok = np.isfinite(zones_arr) & np.isfinite(vals_arr)
    want = {}
    for z in np.unique(zones_arr[ok]).astype(np.int64):
        v = vals_arr[ok & (zones_arr == z)]
        want[int(z)] = (
            len(v),
            round(float(v.sum()), 4),
            round(float(v.sum()) / len(v), 4),
            round(float(v.min()), 4),
            round(float(v.max()), 4),
        )
    assert sorted(got.index) == sorted(want)
    for z, (n, s, mean, mn, mx) in want.items():
        row = got.loc[z]
        assert row.n_cells == n
        np.testing.assert_allclose(
            [row.z_sum, row.z_mean, row.z_min, row.z_max], [s, mean, mn, mx],
            rtol=0, atol=1e-9,
        )


def test_zonal_missing_band_tiles_ignored(spark):
    """A tile with only one of the two bands contributes nothing."""
    pdf = fixtures.tiles_rows_from_array(fixtures.dem_arith(size=32), 16, band="z")
    half_zones = fixtures.tiles_rows_from_array(
        np.zeros((16, 16)), 16, band="zone"
    )  # zone band only for tile (0, 0)
    tiles = spark.createDataFrame(
        pd.concat([pdf, half_zones], ignore_index=True), fixtures.TILES_SCHEMA_DDL
    )
    got = zonal.zonal_stats(tiles, 16).toPandas()
    assert len(got) == 1 and got.iloc[0].zone == 0
    ok = np.isfinite(fixtures.dem_arith(size=32)[:16, :16])
    assert got.iloc[0].n_cells == int(ok.sum())
