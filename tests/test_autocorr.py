"""Moran's I golden tests: Spark result == brute-force NumPy over the
full raster (cross-tile rook pairs included via the halo exchange)."""

from __future__ import annotations

import numpy as np
import pytest

from engine import autocorr, fixtures


def brute_moran(arr: np.ndarray) -> tuple[int, int, float, float, float]:
    H, W = arr.shape
    valid = np.isfinite(arr)
    v = arr[valid]
    n, xb = int(valid.sum()), v.mean()
    num = cnum = gnum = 0.0
    w = 0
    for y in range(H):
        for x in range(W):
            if not valid[y, x]:
                continue
            for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                yy, xx = y + dy, x + dx
                if 0 <= yy < H and 0 <= xx < W and valid[yy, xx]:
                    num += (arr[y, x] - xb) * (arr[yy, xx] - xb)
                    cnum += (arr[y, x] - arr[yy, xx]) ** 2
                    gnum += arr[y, x] * arr[yy, xx]
                    w += 1
    den = float(((v - xb) ** 2).sum())
    g_den = float(v.sum()) ** 2 - float((v * v).sum())
    return (
        n, w,
        (n / w) * num / den,
        ((n - 1) / (2 * w)) * cnum / den,
        gnum / g_den,
    )


@pytest.mark.parametrize("size,T", [(64, 16), (48, 32)])
def test_moran_matches_bruteforce(spark, size, T):
    arr = fixtures.dem_arith(size=size)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, T, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    got = autocorr.moran_i(tiles, T, band="z").toPandas().iloc[0]
    n, w, i, c, g = brute_moran(arr)
    assert got.n_cells == n
    assert got.w_pairs == w
    np.testing.assert_allclose(got.moran_i, i, atol=2e-6)
    np.testing.assert_allclose(got.geary_c, c, atol=2e-6)
    np.testing.assert_allclose(got.getis_g, g, atol=2e-6)


def test_moran_checkerboard_negative(spark):
    """A perfect checkerboard is maximal negative autocorrelation:
    every neighbor product is -1 x devs, so I < 0 (and with equal
    +1/-1 counts, exactly -1)."""
    y, x = np.mgrid[0:32, 0:32]
    arr = ((y + x) % 2 * 2 - 1).astype(np.float64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    got = autocorr.moran_i(tiles, 16, band="z").toPandas().iloc[0]
    np.testing.assert_allclose(got.moran_i, -1.0, atol=1e-9)
    # every neighbor diff is +-2 -> C = ((n-1)/2W) * 4W / n = 2(n-1)/n
    np.testing.assert_allclose(got.geary_c, 2 * 1023 / 1024, atol=1e-9)
    # gnum = -W (every neighbor product is -1), pair denominator
    # = (sum x)^2 - sum x^2 = 0 - n  ->  G = W / n
    np.testing.assert_allclose(got.getis_g, 3968 / 1024, atol=1e-9)


def test_gi_star_matches_bruteforce(spark):
    """Local Gi* plane (one-exchange focal plan) == brute per-cell
    window scan with global moments, including NaN-hole windows."""
    from engine import autocorr, kernels, tiling

    arr = fixtures.dem_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    n, s, s2 = autocorr.band_moments(tiles, "z")
    xb = s / n
    sd = float(np.sqrt(s2 / n - xb * xb))
    out = tiling.apply_focal(
        tiles, 2, "square",
        {"gi": lambda a, r, sh: kernels.focal_gi_star(a, r, sh, xbar=xb, sd=sd, n=n)},
        16, level=10,
    )
    got = np.full((64, 64), np.nan)
    for row in out.collect():
        block = np.asarray(row.data, dtype=np.float64).reshape(
            row.nrows, row.ncols
        )
        got[
            row.tile_y * 16 : row.tile_y * 16 + row.nrows,
            row.tile_x * 16 : row.tile_x * 16 + row.ncols,
        ] = block

    valid = np.isfinite(arr)
    v = arr[valid]
    bn, bxb = int(valid.sum()), v.mean()
    bsd = float(np.sqrt((v * v).mean() - bxb * bxb))
    want = np.full((64, 64), np.nan)
    for y in range(64):
        for x in range(64):
            if not valid[y, x]:
                continue
            win = arr[max(0, y - 2) : y + 3, max(0, x - 2) : x + 3]
            wv = win[np.isfinite(win)]
            wi = len(wv)
            want[y, x] = (wv.sum() - bxb * wi) / (
                bsd * np.sqrt((bn * wi - wi * wi) / (bn - 1.0))
            )
    np.testing.assert_allclose(got, want, atol=1e-9, equal_nan=True)
