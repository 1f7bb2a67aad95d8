"""Bilinear 2x upsample: tiled pipeline vs whole-array NumPy."""

from __future__ import annotations

import numpy as np

from engine import fixtures, resample


def _global_bilinear(arr: np.ndarray) -> np.ndarray:
    """Reference: pad the WHOLE raster with a NaN halo and run the
    same per-tile kernel once — the tiled result must match exactly."""
    padded = np.full((arr.shape[0] + 2, arr.shape[1] + 2), np.nan)
    padded[1:-1, 1:-1] = arr
    return resample.bilinear_2x(padded, arr.shape[0], arr.shape[1], g=1)


def test_bilinear_weights_exact():
    # child samples sit at parent offsets ±0.25 → weights 0.75/0.25
    a = np.array([[0.0, 4.0], [8.0, 12.0]])
    padded = np.full((4, 4), np.nan)
    padded[1:3, 1:3] = a
    out = resample.bilinear_2x(padded, 2, 2, g=1)
    assert out.shape == (4, 4)
    # center 2x2 of the output interpolates all four parents
    np.testing.assert_allclose(
        out[1:3, 1:3],
        [
            [0.75 * (0.75 * 0 + 0.25 * 4) + 0.25 * (0.75 * 8 + 0.25 * 12),
             0.75 * (0.25 * 0 + 0.75 * 4) + 0.25 * (0.25 * 8 + 0.75 * 12)],
            [0.25 * (0.75 * 0 + 0.25 * 4) + 0.75 * (0.75 * 8 + 0.25 * 12),
             0.25 * (0.25 * 0 + 0.75 * 4) + 0.75 * (0.25 * 8 + 0.75 * 12)],
        ],
    )
    # corner pixel: only the one valid parent contributes (renormalized)
    np.testing.assert_allclose(out[0, 0], 0.0)


def test_nan_renormalization():
    a = np.array([[1.0, np.nan], [3.0, 5.0]])
    padded = np.full((4, 4), np.nan)
    padded[1:3, 1:3] = a
    out = resample.bilinear_2x(padded, 2, 2, g=1)
    # pixel (1,1): corners 1, NaN, 3, 5 with weights .5625/.1875/.1875/.0625
    want = (0.5625 * 1 + 0.1875 * 3 + 0.0625 * 5) / (0.5625 + 0.1875 + 0.0625)
    np.testing.assert_allclose(out[1, 1], want)


def test_tiled_upsample_matches_global(spark):
    arr = fixtures.dem_arith(size=64)  # includes speckle + block NaN
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    out = resample.upsample_bilinear(tiles, 16, level=0, band="z").toPandas()
    assert (out.level == 1).all()
    assert len(out) == 64  # 4x4 parents -> 8x8 children
    got = fixtures.array_from_tiles_rows(out, 16)
    np.testing.assert_allclose(
        got, _global_bilinear(arr), rtol=1e-12, equal_nan=True
    )


def test_ragged_edge_parent(spark):
    arr = fixtures.dem_arith(size=64)[:40, :56]  # ragged 40x56
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    out = resample.upsample_bilinear(tiles, 16, level=0, band="z").toPandas()
    got = fixtures.array_from_tiles_rows(out, 16)
    assert got.shape == (80, 112)
    np.testing.assert_allclose(
        got, _global_bilinear(arr), rtol=1e-12, equal_nan=True
    )


def _brute_bilinear_at(arr: np.ndarray, gx: float, gy: float) -> float:
    """NaN-renormalizing 4-corner sample at one point (pixel centers
    at i+0.5); returns NaN when no valid corner."""
    H, W = arr.shape
    px, py = gx - 0.5, gy - 0.5
    ix0, iy0 = int(np.floor(px)), int(np.floor(py))
    fx, fy = px - ix0, py - iy0
    num = den = 0.0
    for dy, wy in ((0, 1.0 - fy), (1, fy)):
        for dx, wx in ((0, 1.0 - fx), (1, fx)):
            x, y = ix0 + dx, iy0 + dy
            if 0 <= x < W and 0 <= y < H and not np.isnan(arr[y, x]):
                num += wy * wx * arr[y, x]
                den += wy * wx
    return num / den if den > 0 else np.nan


def test_sample_bilinear_matches_bruteforce(spark):
    """Tiled drill == per-point NumPy, including cross-tile corners,
    NaN holes, and outside-border points (gx < 0.5 / > nx - 0.5)."""
    import pandas as pd

    arr = fixtures.dem_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    rng = np.random.default_rng(3)
    gx = np.concatenate([rng.uniform(0, 64, 150),
                         [0.2, 63.9, 15.999, 16.001, 31.5]])
    gy = np.concatenate([rng.uniform(0, 64, 150),
                         [0.1, 63.8, 16.0, 47.999, 0.4]])
    pts = pd.DataFrame({"pt_id": np.arange(len(gx)), "gx": gx, "gy": gy})
    got = (
        resample.sample_bilinear(spark.createDataFrame(pts), tiles, 16, "z")
        .toPandas().set_index("pt_id")["value"]
    )
    for k in range(len(gx)):
        want = _brute_bilinear_at(arr, gx[k], gy[k])
        if np.isnan(want):
            assert k not in got.index, k
        else:
            np.testing.assert_allclose(got[k], want, atol=1e-12, err_msg=str(k))


def test_sample_bilinear_absent_anchor_tile(spark):
    """Sparse raster with tile (1,0) removed: a point anchored in the
    absent tile whose corners reach the present tile (0,0) still gets
    the valid-corner renormalized value (halo strips serve the rim);
    a point deep inside the absent tile yields no row."""
    import pandas as pd

    arr = fixtures.dem_arith(size=32)
    rows = fixtures.tiles_rows_from_array(arr, 16, band="z")
    rows = rows[~((rows.tile_x == 1) & (rows.tile_y == 0))]  # drop (1,0)
    tiles = spark.createDataFrame(rows, fixtures.TILES_SCHEMA_DDL)
    # gx=16.2 -> i0=15 (anchor tile 0) ... pick gx where anchor IS the
    # absent tile: i0 = floor(gx-0.5) in [16, 31] -> gx in (16.5, 32.5);
    # gx=16.6 -> corners i=16,17 both in absent tile BUT i0=16 anchor
    # absent; corner i=16 absent, i=17 absent -> no row... use gx where
    # i0=16 but fractional corner back into col 16? corners are i0 and
    # i0+1 (16, 17) - both absent. The reachable case: gy crossing a
    # present tile below: anchor = (1,0) absent, corners j=15 (absent
    # row? tile (1,0) spans rows 0-15)... use point near tile (1,1)
    # which IS present: gy=16.4 -> j0=15 in tile row 0 -> anchor (1,0).
    masked = arr.copy().astype(float)
    masked[0:16, 16:32] = np.nan  # absent tile reads as NaN
    pts = pd.DataFrame(
        {
            "pt_id": [0, 1],
            "gx": [20.3, 24.0],
            "gy": [16.4, 8.0],  # 0: corners straddle rows 15/16; 1: deep inside absent
        }
    )
    got = (
        resample.sample_bilinear(spark.createDataFrame(pts), tiles, 16, "z")
        .toPandas().set_index("pt_id")["value"]
    )
    want0 = _brute_bilinear_at(masked, 20.3, 16.4)
    assert not np.isnan(want0)
    np.testing.assert_allclose(got[0], want0, atol=1e-12)
    assert 1 not in got.index


def brute_warp(arr, coeffs, out_shape):
    import numpy as np
    a, b, c, d, e, f = coeffs
    H, W = out_shape
    sh, sw = arr.shape
    out = np.full((H, W), np.nan)
    for oj in range(H):
        for oi in range(W):
            si = int(np.floor(a * (oi + 0.5) + b * (oj + 0.5) + c))
            sj = int(np.floor(d * (oi + 0.5) + e * (oj + 0.5) + f))
            if 0 <= si < sw and 0 <= sj < sh:
                out[oj, oi] = arr[sj, si]
    return out


def _plane(df, T, H, W):
    import numpy as np
    out = np.full((H, W), np.nan)
    for r in df.collect():
        a = np.asarray(r.data, dtype=np.float64).reshape(r.nrows, r.ncols)
        out[r.tile_y * T : r.tile_y * T + r.nrows,
            r.tile_x * T : r.tile_x * T + r.ncols] = a
    return out


def test_warp_affine_golden(spark):
    """Rotation+scale+translate warp over the speckled DEM == brute
    per-pixel affine lookup (covers tile fan-out, ragged output edges,
    and out-of-extent NaN)."""
    import numpy as np

    from engine import fixtures, resample

    arr = fixtures.dem_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    # ~30 deg rotation, 0.8 scale, translated: exercises multi-source-tile
    # gathers and out-of-extent corners; output 40x56 (ragged edge tiles)
    coeffs = (0.7, -0.4, 6.0, 0.4, 0.7, -3.0)
    out_shape = (40, 56)
    got = _plane(
        resample.warp_affine(tiles, 16, coeffs, out_shape), 16, *reversed([56, 40])
    )
    want = brute_warp(arr, coeffs, out_shape)
    np.testing.assert_allclose(
        np.nan_to_num(got, nan=-9), np.nan_to_num(want, nan=-9), rtol=0, atol=0
    )
    assert np.isfinite(got).any() and np.isnan(got).any()


def test_warp_affine_identity_and_flip(spark):
    import numpy as np

    from engine import fixtures, resample

    arr = fixtures.dem_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    ident = _plane(
        resample.warp_affine(tiles, 16, (1, 0, 0, 0, 1, 0), (64, 64)), 16, 64, 64
    )
    np.testing.assert_allclose(
        np.nan_to_num(ident, nan=-9), np.nan_to_num(arr, nan=-9)
    )
    # horizontal flip: si = 63.5... use a=-1, c=64 -> floor(64 - (oi+.5))
    flip = _plane(
        resample.warp_affine(tiles, 16, (-1, 0, 64, 0, 1, 0), (64, 64)), 16, 64, 64
    )
    np.testing.assert_allclose(
        np.nan_to_num(flip, nan=-9), np.nan_to_num(arr[:, ::-1], nan=-9)
    )


def test_warp_affine_plan_shape(spark):
    """The planning (metadata) side must BROADCAST onto the tile data
    and the only hash exchange is the output-tile grouping — no
    per-pixel or per-tile shuffle of payloads beyond it."""
    from engine import fixtures, resample

    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(fixtures.dem_arith(size=64), 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    w = resample.warp_affine(tiles, 16, (0.7, -0.4, 6.0, 0.4, 0.7, -3.0), (40, 56))
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastExchange") == 1, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def brute_warp_bilinear(arr, coeffs, out_shape):
    import numpy as np
    a, b, c, d, e, f = coeffs
    H, W = out_shape
    sh, sw = arr.shape
    out = np.full((H, W), np.nan)
    for oj in range(H):
        for oi in range(W):
            p_i = a * (oi + 0.5) + b * (oj + 0.5) + c
            p_j = d * (oi + 0.5) + e * (oj + 0.5) + f
            i0 = int(np.floor(p_i - 0.5))
            j0 = int(np.floor(p_j - 0.5))
            fx = (p_i - 0.5) - i0
            fy = (p_j - 0.5) - j0
            num = den = 0.0
            for dy in (0, 1):
                wy = (1.0 - fy) if dy == 0 else fy
                for dx in (0, 1):
                    wx = (1.0 - fx) if dx == 0 else fx
                    ci, cj = i0 + dx, j0 + dy
                    if 0 <= ci < sw and 0 <= cj < sh and np.isfinite(arr[cj, ci]):
                        num += (wy * wx) * arr[cj, ci]
                        den += wy * wx
            if den > 0.0:
                out[oj, oi] = num / den
    return out


def test_warp_affine_bilinear_golden(spark):
    import numpy as np

    from engine import fixtures, resample

    arr = fixtures.dem_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    coeffs = (0.7, -0.4, 6.0, 0.4, 0.7, -3.0)
    got = _plane(
        resample.warp_affine(tiles, 16, coeffs, (40, 56), method="bilinear"),
        16, 40, 56,
    )
    want = brute_warp_bilinear(arr, coeffs, (40, 56))
    np.testing.assert_allclose(
        np.nan_to_num(got, nan=-9), np.nan_to_num(want, nan=-9),
        rtol=1e-12, atol=1e-12,
    )


def test_warp_affine_minification_routes_through_pyramid(spark):
    """A 16x-per-axis minification (det = 256 source pixels per output
    pixel) must NOT gather ~256 source tiles into one output group
    (r3 VERDICT: executor-memory cliff). The warp pre-reduces through
    the mean overview pyramid to the level whose residual ratio is
    <= max_fanout and samples there — golden: 3x block_reduce('mean')
    then the brute warp with coeffs rescaled by 8."""
    import numpy as np

    from engine import fixtures, resample
    from engine.pyramid import block_reduce

    arr = fixtures.dem_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    stats: dict = {}
    got = _plane(
        resample.warp_affine(
            tiles, 16, (16, 0, 0, 0, 16, 0), (4, 4), stats=stats
        ),
        16, 4, 4,
    )
    # bounded per-group gather: residual source-per-output ratio <= 4
    assert stats == {
        "det": 256.0, "fanout_xy": (16.0, 16.0),
        "overview_levels": 3, "residual_det": 4.0,
    }
    red = arr
    for _ in range(3):
        # method='nearest' (the default) pre-reduces via MODE — mean
        # would fabricate new class codes on categorical rasters
        red = block_reduce(red, "mode")
    want = brute_warp(red, (2, 0, 0, 0, 2, 0), (4, 4))
    assert np.isfinite(want).any()
    np.testing.assert_allclose(
        np.nan_to_num(got, nan=-9), np.nan_to_num(want, nan=-9)
    )
    # modest warps never reroute: the existing goldens stay bit-exact
    stats2: dict = {}
    resample.warp_affine(
        tiles, 16, (0.7, -0.4, 6.0, 0.4, 0.7, -3.0), (40, 56), stats=stats2
    )
    assert stats2["overview_levels"] == 0
    # anisotropic/shear guard (r5): |det|=4 would sneak past an
    # area-only guard while spanning ~257 source tile columns — the
    # per-axis cap must pre-reduce until <= 16 tiles on the long axis
    stats3: dict = {}
    resample.warp_affine(
        tiles, 16, (256.0, 0, 0, 0, 1 / 64.0, 0), (4, 4), stats=stats3
    ).collect()  # must not hit the 256-tile gather backstop
    assert stats3["overview_levels"] == 4
    assert max(stats3["fanout_xy"]) / 2 ** stats3["overview_levels"] <= 16.0


# ---------------------------------------------------------------------------
# warp_transform (general non-affine reprojection, round 4)
# ---------------------------------------------------------------------------


def brute_transform_nearest(arr, inv, out_shape):
    import numpy as np
    H, W = out_shape
    sh, sw = arr.shape
    oj, oi = np.mgrid[0:H, 0:W]
    p_i, p_j = inv((oi + 0.5).astype(float).ravel(),
                   (oj + 0.5).astype(float).ravel())
    out = np.full(H * W, np.nan)
    ok = np.isfinite(p_i) & np.isfinite(p_j)
    si = np.floor(np.where(ok, p_i, -1)).astype(np.int64)
    sj = np.floor(np.where(ok, p_j, -1)).astype(np.int64)
    sel = ok & (si >= 0) & (si < sw) & (sj >= 0) & (sj < sh)
    out[sel] = arr.ravel()[sj[sel] * sw + si[sel]]
    return out.reshape(H, W)


def test_warp_transform_affine_equivalence(spark):
    """warp_transform with an affine inverse must equal warp_affine
    bit-for-bit (shared sampling kernel) — both methods, incl. the
    rotation that exercises multi-tile gathers and out-of-extent NaN."""
    import numpy as np

    from engine import fixtures, resample

    arr = fixtures.dem_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    coeffs = (0.7, -0.4, 6.0, 0.4, 0.7, -3.0)
    a, b, c, d, e, f = coeffs

    def inv(gx, gy):
        return a * gx + b * gy + c, d * gx + e * gy + f

    for method in ("nearest", "bilinear"):
        want = _plane(
            resample.warp_affine(tiles, 16, coeffs, (40, 56), method=method),
            16, 40, 56,
        )
        got = _plane(
            resample.warp_transform(
                tiles, 16, inv, (40, 56), method=method
            ),
            16, 40, 56,
        )
        np.testing.assert_array_equal(got, want)


def test_warp_transform_mercator_golden(spark):
    """Plate-carrée -> Web-Mercator reprojection (the genuinely
    non-affine tile-server warp): distributed == brute per-pixel."""
    import numpy as np

    from engine import fixtures, resample

    arr = fixtures.dem_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    inv = resample.inverse_mercator_to_platecarree((64, 64), (64, 64))
    stats: dict = {}
    got = _plane(
        resample.warp_transform(tiles, 16, inv, (64, 64), stats=stats),
        16, 64, 64,
    )
    want = brute_transform_nearest(arr, inv, (64, 64))
    np.testing.assert_array_equal(
        np.nan_to_num(got, nan=-9), np.nan_to_num(want, nan=-9)
    )
    # the warp really is non-affine: some rows sample compressed,
    # some stretched (Mercator latitude distortion)
    assert stats["max_fanout_tiles"] <= 9  # 3x3 at the compressed poles
    assert np.isfinite(want).sum() > 2000


def test_warp_transform_domain_nan_and_fanout_guard(spark):
    import numpy as np
    import pytest

    from engine import fixtures, resample

    arr = fixtures.dem_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )

    # half the output is outside the transform's domain -> NaN there
    def inv_hole(gx, gy):
        p_i = np.where(gx < 16.0, gx, np.nan)
        return p_i, gy

    got = _plane(
        resample.warp_transform(tiles, 16, inv_hole, (32, 32)), 16, 32, 32
    )
    want = brute_transform_nearest(arr, inv_hole, (32, 32))
    np.testing.assert_array_equal(
        np.nan_to_num(got, nan=-9), np.nan_to_num(want, nan=-9)
    )
    # outside-domain half all NaN; in-domain half real data (the source
    # DEM's nodata speckle remains NaN, so not ALL finite)
    assert np.isnan(got[:, 16:]).all()
    assert np.isfinite(got[:, :16]).sum() > 400

    # a 16x-per-axis minifying transform must refuse the memory cliff
    def inv_minify(gx, gy):
        return gx * 16.0, gy * 16.0

    stats: dict = {}
    with pytest.raises(ValueError, match="max_gather_tiles"):
        resample.warp_transform(
            tiles, 16, inv_minify, (4, 4), max_gather_tiles=4, stats=stats
        )


def test_warp_transform_sinusoidal_golden(spark):
    """Sinusoidal (equal-area) -> plate-carrée reprojection: a second
    genuinely non-affine inverse map exercised end to end. Inverse of
    'output is equirectangular, source is sinusoidal': source column
    depends on cos(latitude) — rows compress toward the poles."""
    import numpy as np

    from engine import fixtures, resample

    arr = fixtures.dem_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )

    def inv_sinu(gx, gy):
        # output pixel -> lat in (-90, 90), lon in (-180, 180)
        lat = 90.0 - gy / 64.0 * 180.0
        lon = gx / 64.0 * 360.0 - 180.0
        # sinusoidal source: x = lon * cos(lat) mapped onto 64 cols
        p_i = (lon * np.cos(np.radians(lat)) + 180.0) / 360.0 * 64.0
        p_j = (90.0 - lat) / 180.0 * 64.0
        return p_i, p_j

    got = _plane(
        resample.warp_transform(tiles, 16, inv_sinu, (64, 64)), 16, 64, 64
    )
    want = brute_transform_nearest(arr, inv_sinu, (64, 64))
    np.testing.assert_array_equal(
        np.nan_to_num(got, nan=-9), np.nan_to_num(want, nan=-9)
    )
    assert np.isfinite(want).sum() > 2000
