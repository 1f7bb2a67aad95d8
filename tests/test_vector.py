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
