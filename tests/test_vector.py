"""Raster→vector polygonize goldens: the rasterize∘polygonize
round-trip must reproduce the patch-label plane exactly (even-odd
containment of cell centers in each patch's ring set)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from engine import fixtures, patches, vector


def _rings_by_patch(rings_pdf: pd.DataFrame) -> dict[int, list]:
    out: dict[int, list] = {}
    for row in rings_pdf.itertuples(index=False):
        out.setdefault(int(row.patch_id), []).append(
            (np.asarray(row.xs, dtype=np.float64), np.asarray(row.ys, dtype=np.float64))
        )
    return out


def _roundtrip_assert(arr_labels: np.ndarray, rings_pdf: pd.DataFrame) -> None:
    H, W = arr_labels.shape
    yy, xx = np.mgrid[0:H, 0:W]
    px = xx.ravel() + 0.5
    py = yy.ravel() + 0.5
    lab = arr_labels.ravel()
    by_patch = _rings_by_patch(rings_pdf)
    seen = np.zeros(lab.shape, dtype=bool)
    for pid, rings in by_patch.items():
        inside = vector.point_in_rings(px, py, rings)
        expect = np.isfinite(lab) & (lab == pid)
        np.testing.assert_array_equal(
            inside, expect, err_msg=f"patch {pid} containment mismatch"
        )
        seen |= inside
    # every labeled cell is covered by exactly its own patch
    assert (seen == np.isfinite(lab)).all()


def test_polygonize_roundtrip_simple(spark):
    # two patches, one with a hole (class 1 ring around class 2 core)
    arr = np.zeros((8, 8), dtype=np.float64)
    arr[1:6, 1:6] = 1.0
    arr[2:5, 2:5] = 2.0
    arr[0, 7] = np.nan
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 4, band="class"),
        fixtures.TILES_SCHEMA_DDL,
    )
    label_tiles, _ = patches.build_patches(tiles, 4, spark)
    lab_pdf = label_tiles.toPandas()
    full = fixtures.array_from_tiles_rows(lab_pdf, 4)
    rings = vector.polygonize(label_tiles, 4).toPandas()
    # the ring patch (class 1) must carry a hole: 2 rings, one not outer
    ring_pid = int(full[1, 1])
    mine = rings[rings.patch_id == ring_pid]
    assert len(mine) == 2 and mine.is_outer.sum() == 1
    _roundtrip_assert(full, rings)


def test_polygonize_roundtrip_fixture(spark):
    arr = fixtures.raster_fixture(seed=7, size=32)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 8, band="class"),
        fixtures.TILES_SCHEMA_DDL,
    )
    label_tiles, patch_table = patches.build_patches(tiles, 8, spark)
    full = fixtures.array_from_tiles_rows(label_tiles.toPandas(), 8)
    rings = vector.polygonize(label_tiles, 8).toPandas()
    _roundtrip_assert(full, rings)
    # ring count sanity: at least one ring per patch
    n_patches = patch_table.count()
    assert rings[rings.is_outer].patch_id.nunique() == n_patches


@pytest.mark.parametrize("T", [4, 8, 16])
def test_polygonize_tile_size_invariance(spark, T):
    arr = fixtures.raster_fixture(seed=11, size=16)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, T, band="class"),
        fixtures.TILES_SCHEMA_DDL,
    )
    label_tiles, _ = patches.build_patches(tiles, T, spark)
    rings = vector.polygonize(label_tiles, T).toPandas()
    # total boundary length (sum of |signed_area|... use vertex-count-
    # free invariant): total outer area minus holes == # labeled cells
    area = rings.signed_area.sum()
    assert area == np.isfinite(arr).sum()


def _clip_interval(x1, y1, x2, y2, i, j):
    """Liang-Barsky param interval of the segment inside the CLOSED
    unit box [i,i+1]x[j,j+1]; None if empty."""
    t0, t1 = 0.0, 1.0
    dx, dy = x2 - x1, y2 - y1
    for p, q in ((-dx, x1 - i), (dx, i + 1 - x1), (-dy, y1 - j), (dy, j + 1 - y1)):
        if p == 0:
            if q < 0:
                return None
        else:
            t = q / p
            if p < 0:
                t0 = max(t0, t)
            else:
                t1 = min(t1, t)
    return (t0, t1) if t0 <= t1 else None


def test_rasterize_lines_supercover_sandwich(spark):
    """Engine cells sit between the strict-interior hit set and the
    closed-box hit set of an independent Liang-Barsky clip — catches
    both missed cells and spurious sweeps (e.g. the descending-
    sequence trap on clamped-empty ranges)."""
    import pandas as pd
    from engine.vector import rasterize_lines

    rng = np.random.default_rng(5)
    n = 25
    lines = pd.DataFrame(
        {
            "line_id": np.arange(n),
            "x1": rng.uniform(-4, 20, n),
            "y1": rng.uniform(-4, 20, n),
            "x2": rng.uniform(-4, 20, n),
            "y2": rng.uniform(-4, 20, n),
        }
    )
    # add a vertical, a horizontal, and a fully-out-of-bounds segment
    extra = pd.DataFrame(
        {
            "line_id": [n, n + 1, n + 2],
            "x1": [5.3, 1.1, -9.0], "y1": [2.2, 7.7, -9.0],
            "x2": [5.3, 14.6, -3.0], "y2": [13.8, 7.7, -2.0],
        }
    )
    lines = pd.concat([lines, extra], ignore_index=True)
    got = (
        rasterize_lines(spark.createDataFrame(lines), 16, 16)
        .toPandas().groupby("line_id").apply(
            lambda g: set(zip(g.i, g.j)), include_groups=False
        ).to_dict()
    )
    for r in lines.itertuples(index=False):
        cells = got.get(r.line_id, set())
        closed, interior = set(), set()
        for i in range(16):
            for j in range(16):
                t = _clip_interval(r.x1, r.y1, r.x2, r.y2, i, j)
                if t is None:
                    continue
                closed.add((i, j))
                if t[1] - t[0] > 1e-9:
                    mx = r.x1 + (r.x2 - r.x1) * (t[0] + t[1]) / 2
                    my = r.y1 + (r.y2 - r.y1) * (t[0] + t[1]) / 2
                    if i < mx < i + 1 and j < my < j + 1:
                        interior.add((i, j))
        assert interior <= cells <= closed, (
            r.line_id, interior - cells, cells - closed,
        )
    assert got.get(n + 2, set()) == set()  # fully out of bounds


def test_contour_segments_ramp_analytic(spark):
    """Linear ramp z = x: the L=2.5 contour is exactly the x = 2.5
    vertical line, one unit segment per block row."""
    from engine.vector import contour_segments_kernel

    a = np.tile(np.arange(8, dtype=float), (6, 1))
    df = contour_segments_kernel(a, 2.5, 0, 0)
    assert len(df) == 5  # 6 rows of cells -> 5 block rows
    assert np.allclose(df.x0, 2.5) and np.allclose(df.x1, 2.5)
    assert sorted(zip(df.y0, df.y1)) == [(float(k), float(k + 1)) for k in range(5)]


def test_contour_closed_loop_and_nodata(spark):
    """A radial bump's contour is a closed loop (every endpoint has
    degree exactly 2); nodata corners drop their blocks."""
    from collections import Counter

    from engine.vector import contour_segments_kernel

    yy, xx = np.mgrid[0:11, 0:11]
    b = np.exp(-(((xx - 5.0) ** 2 + (yy - 5.0) ** 2) / 7.0))
    df = contour_segments_kernel(b, 0.5, 0, 0)
    deg = Counter()
    for r in df.itertuples(index=False):
        deg[(round(r.x0, 9), round(r.y0, 9))] += 1
        deg[(round(r.x1, 9), round(r.y1, 9))] += 1
    assert set(deg.values()) == {2}
    b2 = b.copy()
    b2[5, 3] = np.nan  # hole ON the contour: loop opens, blocks vanish
    df2 = contour_segments_kernel(b2, 0.5, 0, 0)
    assert 0 < len(df2) < len(df)


def test_contour_distributed_matches_kernel(spark):
    """Tiled extraction (1-halo, blocks owned by their top-left cell)
    == the kernel on the whole array — seam blocks emitted exactly
    once with identical interpolated coordinates."""
    from engine import vector

    arr = fixtures.dem_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    got = {
        (r.bi, r.bj, r.x0, r.y0, r.x1, r.y1)
        for r in vector.contour_segments(tiles, 16, 2.0, band="z").collect()
    }
    want_df = vector.contour_segments_kernel(arr, 2.0, 0, 0)
    want = {
        (r.bi, r.bj, r.x0, r.y0, r.x1, r.y1)
        for r in want_df.itertuples(index=False)
    }
    assert got == want
    assert len(want) > 50  # the level-2 contour really crosses the DEM


def test_contour_plan_one_exchange(spark):
    """Contour extraction is ONE halo exchange + one applyInPandas —
    segments never shuffle."""
    from engine import vector

    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(fixtures.dem_arith(size=64), 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    c = vector.contour_segments(tiles, 16, 2.0, band="z")
    plan = c._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_convex_hull_strict_turn_rules():
    """Pinned hull-vertex rule: collinear boundary points and exact
    duplicates are NOT vertices; degenerate inputs keep extreme
    endpoints."""
    from engine.vector import _monotone_chain

    sq = np.array([
        [0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0],
        [1.0, 0.0],             # collinear on the bottom edge
        [0.0, 0.0],             # duplicate corner
        [1.0, 1.0],             # interior
    ])
    hull = _monotone_chain(sq)
    assert sorted(map(tuple, hull)) == [
        (0.0, 0.0), (0.0, 2.0), (2.0, 0.0), (2.0, 2.0)
    ]
    # degenerate: all points on one segment -> the two endpoints
    seg = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0], [0.5, 0.5]])
    assert sorted(map(tuple, _monotone_chain(seg))) == [
        (0.0, 0.0), (2.0, 2.0)
    ]
    # single / duplicated point
    assert _monotone_chain(np.array([[3.0, 4.0], [3.0, 4.0]])).tolist() == [
        [3.0, 4.0]
    ]


def test_convex_hull_agg_two_phase_matches_single(spark):
    """The distributed two-phase hull (partition partials + final
    chain) == one global chain, under a partitioning that splits every
    group across many partitions."""
    from engine import vector
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    rng = np.random.default_rng(11)
    rows = [
        (str(g), float(x), float(y))
        for g in range(4)
        for x, y in rng.normal(size=(200, 2)) * (g + 1)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double").repartition(16)
    got = {
        r.g: (r.n_hull, r.qx_sum, r.qy_sum)
        for r in vector.convex_hull_agg(df, "g", "x", "y").collect()
    }
    for g in range(4):
        pts = np.array([(x, y) for gg, x, y in rows if gg == str(g)])
        hull = vector._monotone_chain(pts)
        want = (
            len(hull),
            int(np.round(hull[:, 0] * 1e6).sum()),
            int(np.round(hull[:, 1] * 1e6).sum()),
        )
        assert got[str(g)] == want, g
        assert 3 <= len(hull) < 25  # real reduction happened
