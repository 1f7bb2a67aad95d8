"""Depression-filling goldens (engine/fill.py): the Priority-Flood
kernel vs an independent Jacobi minimax relaxation, the tiled bounded
operator vs the global kernel, the documented cap under-fill contract,
the +eps drainage variant, and the full fill -> D8 -> accumulation
conditioning pipeline vs brute NumPy."""

from __future__ import annotations

import numpy as np

from engine import fill, fixtures, flow

_N8 = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))


def jacobi_fill(a: np.ndarray) -> np.ndarray:
    """Independent golden: the minimax fixpoint by plain Jacobi
    relaxation F <- max(z, min over N8 of F), seeds fixed at z. A
    completely different algorithm from the heapq flood."""
    a = np.asarray(a, dtype=np.float64)
    H, W = a.shape
    valid = np.isfinite(a)
    padv = np.zeros((H + 2, W + 2), dtype=bool)
    padv[1:-1, 1:-1] = valid
    near_nodata = np.zeros((H, W), dtype=bool)
    for dj, di in _N8:
        near_nodata |= ~padv[1 + dj : 1 + dj + H, 1 + di : 1 + di + W]
    edge = np.zeros((H, W), dtype=bool)
    edge[0, :] = edge[-1, :] = True
    edge[:, 0] = edge[:, -1] = True
    seeds = valid & (edge | near_nodata)

    F = np.where(seeds, a, np.inf)
    F = np.where(valid, F, np.nan)
    while True:
        Fp = np.full((H + 2, W + 2), np.inf)
        Fp[1:-1, 1:-1] = np.where(valid, F, np.inf)
        m = np.full((H, W), np.inf)
        for dj, di in _N8:
            m = np.minimum(m, Fp[1 + dj : 1 + dj + H, 1 + di : 1 + di + W])
        newF = np.where(seeds, a, np.maximum(a, m))
        newF = np.where(valid, newF, np.nan)
        if np.array_equal(newF, F, equal_nan=True):
            return F
        F = newF


def _plane(df, T, H, W):
    out = np.full((H, W), np.nan)
    for r in df.collect():
        a = np.asarray(r.data, dtype=np.float64).reshape(r.nrows, r.ncols)
        out[r.tile_y * T : r.tile_y * T + r.nrows,
            r.tile_x * T : r.tile_x * T + r.ncols] = a
    return out


def test_priority_flood_matches_jacobi_pitted():
    arr = fixtures.dem_pitted(size=48)
    got = fill.priority_flood(arr)
    np.testing.assert_array_equal(got, jacobi_fill(arr))
    # it actually fills: both carved pits rise to their spill level
    assert (got > arr).sum() > 50
    # fill is conservative: F >= z, F == z outside depressions
    assert np.all(got >= arr)
    assert (got == arr).sum() > got.size // 2


def test_priority_flood_matches_jacobi_with_nodata():
    # speckled DEM: nodata holes act as drains (seeds at the hole rim)
    arr = fixtures.dem_arith(size=48)
    got = fill.priority_flood(arr)
    np.testing.assert_array_equal(
        np.nan_to_num(got, nan=-9), np.nan_to_num(jacobi_fill(arr), nan=-9)
    )
    assert np.array_equal(np.isnan(got), np.isnan(arr))


def test_fill_depressions_tiled_equals_global(spark):
    """T=16, cap=16 on 48x48: every halo window covers the whole
    raster, so the bounded operator is exact everywhere."""
    arr = fixtures.dem_pitted(size=48)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    got = _plane(fill.fill_depressions(tiles, 16, cap=16), 16, 48, 48)
    np.testing.assert_array_equal(got, fill.priority_flood(arr))


def test_fill_bounded_underfills_wide_depression(spark):
    """The documented cap contract: a depression wider than the halo is
    filled only to the window-border level — under-filled, never
    over-filled."""
    size = 64
    yy, xx = np.mgrid[0:size, 0:size]
    d2 = (xx - 32.0) ** 2 + (yy - 32.0) ** 2
    # one huge bowl (radius ~28) on a plane
    arr = 0.01 * xx - 5.0 * np.maximum(0.0, 1.0 - d2 / 784.0)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 32, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    bounded = _plane(fill.fill_depressions(tiles, 32, cap=8), 32, size, size)
    exact = fill.priority_flood(arr)
    assert np.all(bounded <= exact + 1e-12)
    assert np.all(bounded >= arr)
    assert (bounded < exact - 1e-9).any()  # the bowl is under-filled
    # cap = T: every 2x2-grid window covers the raster — exact again
    full = _plane(fill.fill_depressions(tiles, 32, cap=32), 32, size, size)
    np.testing.assert_array_equal(full, exact)


def test_fill_eps_leaves_no_interior_pits():
    """Priority-Flood+eps: filled lakes keep a drainage gradient, so D8
    over the conditioned plane has pits (code 0) only on the raster
    edge (true outlets)."""
    arr = fixtures.dem_pitted(size=48)
    cond = fill.priority_flood(arr, eps=1e-6)
    assert np.all(cond >= arr)
    d8 = flow.flow_direction_kernel(cond)
    pits = np.argwhere(d8 == 0)
    assert len(pits)  # outlets exist
    assert all(
        j in (0, 47) or i in (0, 47) for j, i in pits
    ), "interior pit survived eps conditioning"


def test_fill_then_flow_pipeline(spark):
    """The full conditioning pipeline, distributed vs brute: fill+eps
    -> D8 -> inter-tile flow accumulation on the pitted DEM equals the
    whole-array NumPy pipeline. Conditioning must grow the maximum
    accumulation: formerly pit-absorbed flow now continues over the
    spill to the raster edge (plain eps=0 fill would instead truncate
    paths at the flat lake — that's why the +eps variant exists)."""
    from tests.test_flow import brute_acc, brute_d8

    arr = fixtures.dem_pitted(size=48)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    filled_tiles = fill.fill_depressions(
        tiles, 16, cap=16, eps=1e-6
    ).localCheckpoint(eager=True)
    dir_tiles = flow.flow_direction(filled_tiles, 16)
    acc = _plane(
        flow.flow_accumulation(dir_tiles, 16), 16, 48, 48
    )
    want = brute_acc(brute_d8(fill.priority_flood(arr, eps=1e-6)))
    np.testing.assert_array_equal(acc, want)
    acc_raw = brute_acc(brute_d8(arr))
    assert np.nanmax(acc) > np.nanmax(acc_raw)


def test_fill_plan_one_exchange(spark):
    """Bounded Priority-Flood is ONE halo exchange + one applyInPandas
    — the EDT plan shape (no fixpoint, no plane re-shuffles)."""
    from engine import fill, fixtures

    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(fixtures.dem_pitted(48), 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    f = fill.fill_depressions(tiles, 16, cap=16)
    plan = f._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
