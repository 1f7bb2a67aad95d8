"""polygon_measures goldens: the spherical shoelace is EXACT for
lat/lon-aligned rects (area = R²·Δλ·(sin φ2 − sin φ1)), the Δλ wrap
must measure the antimeridian rect at its true width, and perimeter
must equal the scalar haversine edge sum."""

from __future__ import annotations

import numpy as np

from engine import fixtures, grid
from engine.vector import polygon_measures

R = 6371.0088


def _spark_measures(spark):
    rows = [
        (p["poly_id"], [(float(v["lat"]), float(v["lon"])) for v in p["ring"]])
        for p in fixtures.polygons()
    ]
    polys = spark.createDataFrame(
        rows, "poly_id int, ring array<struct<lat:double,lon:double>>"
    )
    return polygon_measures(polys).toPandas().set_index("poly_id")


def _rect_area(lat1, lat2, lon_width_deg):
    return R * R * np.radians(lon_width_deg) * (
        np.sin(np.radians(lat2)) - np.sin(np.radians(lat1))
    )


def test_aligned_rect_areas_exact(spark):
    got = _spark_measures(spark)
    # atol 0.006 = the query's ROUND(.., 2) granularity; the formula
    # itself is exact for aligned rects
    np.testing.assert_allclose(
        got.loc[1, "area_km2"], _rect_area(-5.0, 8.0, 15.0), atol=6e-3
    )
    # P3 crosses the antimeridian: true width 16 deg, not the 344 complement
    np.testing.assert_allclose(
        got.loc[3, "area_km2"], _rect_area(-20.0, -8.0, 16.0), atol=6e-3
    )


def test_perimeter_matches_scalar_haversine(spark):
    got = _spark_measures(spark)
    for p in fixtures.polygons():
        ring = p["ring"]
        want = sum(
            float(grid.haversine_km(a["lat"], a["lon"],
                                    np.array([b["lat"]]), np.array([b["lon"]]))[0])
            for a, b in zip(ring[:-1], ring[1:])
        )
        np.testing.assert_allclose(
            got.loc[p["poly_id"], "perim_km"], want, atol=0.02
        )


def test_centroid_and_star_bounds(spark):
    got = _spark_measures(spark)
    star = fixtures.polygons()[1]["ring"][:-1]
    np.testing.assert_allclose(
        got.loc[2, "c_lat"], np.mean([v["lat"] for v in star]), atol=1e-6
    )
    np.testing.assert_allclose(
        got.loc[2, "c_lon"], np.mean([v["lon"] for v in star]), atol=1e-6
    )
    assert got.loc[2, "n_vertices"] == 10
    # star area: positive, larger than its r=3.5 deg inner circle, smaller
    # than its 8 deg-radius bounding circle (planar small-angle bounds)
    km_per_deg = np.pi * R / 180.0
    inner = np.pi * (3.5 * km_per_deg) ** 2
    outer = np.pi * (8.0 * km_per_deg) ** 2
    assert inner < got.loc[2, "area_km2"] < outer


def test_holed_polygon_area_perimeter(spark):
    """P4 (square with square hole): area = outer rect − hole rect
    (both exact for aligned rects); perimeter = outer + hole edge sums;
    n_vertices / centroid stay outer-only."""
    holed = [p for p in fixtures.polygons_holed() if p["poly_id"] == 4][0]
    rows = [
        (
            4,
            [(float(v["lat"]), float(v["lon"])) for v in holed["ring"]],
            [
                [(float(v["lat"]), float(v["lon"])) for v in h]
                for h in holed["holes"]
            ],
        )
    ]
    polys = spark.createDataFrame(
        rows,
        "poly_id int, ring array<struct<lat:double,lon:double>>, "
        "holes array<array<struct<lat:double,lon:double>>>",
    )
    got = polygon_measures(polys, holes_col="holes").toPandas().iloc[0]
    want_area = _rect_area(15.0, 45.0, 35.0) - _rect_area(24.0, 38.0, 16.0)
    assert abs(got.area_km2 - round(want_area, 2)) < 0.05
    # perimeter: scalar haversine over outer + hole edges
    def ring_perim(ring):
        tot = 0.0
        for a, b in zip(ring[:-1], ring[1:]):
            tot += float(
                grid.haversine_km(a["lat"], a["lon"],
                                  np.array([b["lat"]]), np.array([b["lon"]]))[0]
            )
        return tot
    want_perim = ring_perim(holed["ring"]) + ring_perim(holed["holes"][0])
    assert abs(got.perim_km - round(want_perim, 2)) < 0.05
    assert got.n_vertices == 4
