"""Terrain kernels: brute-force 3x3 goldens + tiled-pipeline equality."""

from __future__ import annotations

import math

import numpy as np

from engine import fixtures, terrain, tiling


def _brute_terrain(arr: np.ndarray, cellsize: float = 1.0):
    """Per-cell explicit 3x3 enumeration of the pinned Horn semantics."""
    H, W = arr.shape
    slope = np.full((H, W), np.nan)
    aspect = np.full((H, W), np.nan)
    hill = np.full((H, W), np.nan)
    for j in range(1, H - 1):
        for i in range(1, W - 1):
            win = arr[j - 1 : j + 2, i - 1 : i + 2]
            if not np.all(np.isfinite(win)):
                continue
            nw, n, ne = win[0]
            w, _, e = win[1]
            sw, s, se = win[2]
            gx = ((ne + 2 * e + se) - (nw + 2 * w + sw)) / (8 * cellsize)
            gy = ((sw + 2 * s + se) - (nw + 2 * n + ne)) / (8 * cellsize)
            slope[j, i] = math.degrees(math.atan(math.hypot(gx, gy)))
            if not (gx == 0.0 and gy == 0.0):
                aspect[j, i] = (math.degrees(math.atan2(-gx, gy)) + 360.0) % 360.0
            raw = (
                terrain.C45 + terrain.C45 * (terrain.CAZ * gy - terrain.SAZ * gx)
            ) / math.sqrt(1.0 + gx * gx + gy * gy)
            hill[j, i] = 255.0 * max(0.0, raw)
    return slope, aspect, hill


def test_terrain_golden_bruteforce():
    arr = fixtures.dem_arith(size=32)
    want_slope, want_aspect, want_hill = _brute_terrain(arr)
    np.testing.assert_allclose(
        terrain.focal_slope(arr), want_slope, rtol=1e-12, atol=1e-12, equal_nan=True
    )
    np.testing.assert_allclose(
        terrain.focal_aspect(arr), want_aspect, rtol=1e-12, atol=1e-12, equal_nan=True
    )
    np.testing.assert_allclose(
        terrain.focal_hillshade(arr), want_hill, rtol=1e-12, atol=1e-12, equal_nan=True
    )
    # sanity: the saddle fixture exercises all four aspect quadrants
    q = want_aspect[np.isfinite(want_aspect)]
    assert len({int(b) for b in (q // 90)}) == 4


def test_terrain_nonunit_cellsize():
    arr = fixtures.dem_arith(size=16)
    want, _, _ = _brute_terrain(arr, cellsize=30.0)
    got = terrain.focal_slope(arr, cellsize=30.0)
    np.testing.assert_allclose(got, want, rtol=1e-12, equal_nan=True)


def test_terrain_tiled_pipeline(spark):
    """Tiled halo path == whole-array kernels on every interior cell,
    including across tile seams."""
    arr = fixtures.dem_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    out = tiling.apply_focal(
        tiles, 1, "square", dict(terrain.TERRAIN_KERNELS), 16, level=10
    )
    pdf = out.toPandas()
    for band, fn in terrain.TERRAIN_KERNELS.items():
        got = fixtures.array_from_tiles_rows(pdf[pdf.band == band], 16)
        want = fn(arr)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12, equal_nan=True)


def _brute_round3(arr: np.ndarray, cellsize: float = 1.0):
    """Explicit per-cell TPI / TRI / roughness / curvature (pinned
    round-3 semantics: all-nine-valid rule, ZT/ESRI curvature)."""
    H, W = arr.shape
    tpi = np.full((H, W), np.nan)
    tri = np.full((H, W), np.nan)
    rough = np.full((H, W), np.nan)
    curv = np.full((H, W), np.nan)
    L2 = cellsize * cellsize
    for j in range(1, H - 1):
        for i in range(1, W - 1):
            win = arr[j - 1 : j + 2, i - 1 : i + 2]
            if not np.all(np.isfinite(win)):
                continue
            nw, n, ne = win[0]
            w, c, e = win[1]
            sw, s, se = win[2]
            nbrs = [nw, n, ne, w, e, sw, s, se]
            tpi[j, i] = c - sum(nbrs) / 8.0
            tri[j, i] = math.sqrt(sum((nb - c) ** 2 for nb in nbrs))
            rough[j, i] = max(nbrs + [c]) - min(nbrs + [c])
            D = ((w + e) / 2.0 - c) / L2
            E = ((n + s) / 2.0 - c) / L2
            curv[j, i] = -2.0 * (D + E) * 100.0
    return tpi, tri, rough, curv


def test_terrain_round3_golden_bruteforce():
    arr = fixtures.dem_arith(size=32)
    want = _brute_round3(arr)
    got = (
        terrain.focal_tpi(arr),
        terrain.focal_tri(arr),
        terrain.focal_roughness(arr),
        terrain.focal_curvature(arr),
    )
    for g, w, name in zip(got, want, ("tpi", "tri", "roughness", "curvature")):
        np.testing.assert_allclose(
            g, w, rtol=1e-12, atol=1e-12, equal_nan=True, err_msg=name
        )


def test_terrain_round3_tiled_pipeline(spark):
    """Tiled (halo) computation of the round-3 bands == whole-array
    kernels, interior AND cross-tile cells."""
    arr = fixtures.dem_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    kerns = {
        k: terrain.TERRAIN_KERNELS[k]
        for k in ("tpi", "tri", "roughness", "curvature")
    }
    out = tiling.apply_focal(tiles, 1, "square", kerns, 16, level=0)
    whole = {
        "tpi": terrain.focal_tpi(arr),
        "tri": terrain.focal_tri(arr),
        "roughness": terrain.focal_roughness(arr),
        "curvature": terrain.focal_curvature(arr),
    }
    for r in out.collect():
        got = np.asarray(r.data, dtype=np.float64).reshape(r.nrows, r.ncols)
        want = whole[r.band][
            r.tile_y * 16 : r.tile_y * 16 + r.nrows,
            r.tile_x * 16 : r.tile_x * 16 + r.ncols,
        ]
        np.testing.assert_allclose(
            got, want, rtol=1e-12, atol=1e-12, equal_nan=True,
            err_msg=f"{r.band} tile ({r.tile_x},{r.tile_y})",
        )


def test_convolution_filters_brute():
    """Sobel x/y and the 4-neighbor Laplacian == per-cell brute
    convolution with the all-nine-valid rule, on the speckled DEM."""
    from engine.kernels import focal_laplacian, focal_sobel_x, focal_sobel_y

    arr = fixtures.dem_arith(size=32)
    H, W = arr.shape
    wx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=float)
    wy = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=float)
    wl = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=float)
    for fn, wgt in ((focal_sobel_x, wx), (focal_sobel_y, wy),
                    (focal_laplacian, wl)):
        got = fn(arr)
        want = np.full((H, W), np.nan)
        for j in range(1, H - 1):
            for i in range(1, W - 1):
                win = arr[j - 1 : j + 2, i - 1 : i + 2]
                if np.isfinite(win).all():
                    want[j, i] = float((win * wgt).sum())
        np.testing.assert_allclose(
            np.nan_to_num(got, nan=-9), np.nan_to_num(want, nan=-9),
            rtol=0, atol=1e-12,
        )
        assert np.isfinite(got).sum() > 400


def test_openness_matches_bruteforce(spark):
    """Tiled bounded-ray openness (one r=4 exchange) == explicit
    per-cell ray enumeration, including NaN-hole and raster-edge rays."""
    arr = fixtures.dem_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    out = tiling.apply_focal(
        tiles, 4, "square", {"openness": terrain.focal_openness}, 16, level=0
    )
    sqrt2 = math.sqrt(2.0)
    dirs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    want = np.full((64, 64), np.nan)
    for j in range(64):
        for i in range(64):
            if not np.isfinite(arr[j, i]):
                continue
            q = 0
            for dj, di in dirs:
                dist1 = sqrt2 if dj != 0 and di != 0 else 1.0
                best = -np.inf
                for k in range(1, 5):
                    jj, ii = j + k * dj, i + k * di
                    if 0 <= jj < 64 and 0 <= ii < 64 and np.isfinite(arr[jj, ii]):
                        best = max(best, (arr[jj, ii] - arr[j, i]) / (k * dist1))
                if np.isfinite(best):
                    q += round((90.0 - math.degrees(math.atan(best))) * 1e6)
            want[j, i] = q / 1e6
    for r in out.collect():
        got = np.asarray(r.data, dtype=np.float64).reshape(r.nrows, r.ncols)
        np.testing.assert_allclose(
            got,
            want[
                r.tile_y * 16 : r.tile_y * 16 + r.nrows,
                r.tile_x * 16 : r.tile_x * 16 + r.ncols,
            ],
            atol=1e-9, equal_nan=True,
            err_msg=f"openness tile ({r.tile_x},{r.tile_y})",
        )
