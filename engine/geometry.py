"""Vectorized polygon geometry (NumPy) — PIP test and cell covers.

No shapely/geos in this environment: ray-casting implemented from
scratch with the pinned semantics (SURVEY.md §5.3.6):

- ray cast toward +lon at the point's latitude;
- vertex-on-ray resolved by the strict upper-endpoint rule
  (an edge is counted iff (lat1 > latp) != (lat2 > latp));
- points exactly ON the boundary count as INSIDE;
- rings are closed (first == last vertex), orientation-insensitive;
- rings crossing the antimeridian are stored with lon continuing past
  ±180 (e.g. 188 = -172); points are re-framed into the ring's lon
  window before testing.
"""

from __future__ import annotations

import numpy as np

BOUNDARY_EPS = 1e-12


def _ring_arrays(ring: list[dict]) -> tuple[np.ndarray, np.ndarray]:
    lat = np.asarray([p["lat"] for p in ring], dtype=np.float64)
    lon = np.asarray([p["lon"] for p in ring], dtype=np.float64)
    if lat[0] != lat[-1] or lon[0] != lon[-1]:
        raise ValueError("ring must be closed")
    return lat, lon


def _reframe_lon(lon: np.ndarray, ring_lon_min: float) -> np.ndarray:
    """Shift point lons into [ring_lon_min, ring_lon_min + 360)."""
    return ring_lon_min + np.mod(lon - ring_lon_min, 360.0)


def point_in_polygon(
    lat: np.ndarray, lon: np.ndarray, ring: list[dict]
) -> np.ndarray:
    """Boolean mask; fully vectorized over points (edges looped — rings
    are small)."""
    rlat, rlon = _ring_arrays(ring)
    lat = np.asarray(lat, dtype=np.float64)
    lon = _reframe_lon(np.asarray(lon, dtype=np.float64), float(rlon.min()))
    inside = np.zeros(lat.shape, dtype=bool)
    on_edge = np.zeros(lat.shape, dtype=bool)
    for k in range(len(rlat) - 1):
        la1, lo1, la2, lo2 = rlat[k], rlon[k], rlat[k + 1], rlon[k + 1]
        # boundary test: colinear within eps AND within the segment box
        cross = (lo2 - lo1) * (lat - la1) - (la2 - la1) * (lon - lo1)
        seg_len = max(np.hypot(lo2 - lo1, la2 - la1), BOUNDARY_EPS)
        near = np.abs(cross) <= BOUNDARY_EPS * max(1.0, seg_len)
        inbox = (
            (lat >= min(la1, la2) - BOUNDARY_EPS)
            & (lat <= max(la1, la2) + BOUNDARY_EPS)
            & (lon >= min(lo1, lo2) - BOUNDARY_EPS)
            & (lon <= max(lo1, lo2) + BOUNDARY_EPS)
        )
        on_edge |= near & inbox
        # ray cast toward +lon, strict upper-endpoint rule
        crosses = (la1 > lat) != (la2 > lat)
        with np.errstate(divide="ignore", invalid="ignore"):
            lon_x = lo1 + (lat - la1) / (la2 - la1) * (lo2 - lo1)
        inside ^= crosses & (lon < lon_x)
    return inside | on_edge


def polygon_bbox(ring: list[dict]) -> tuple[float, float, float, float]:
    rlat, rlon = _ring_arrays(ring)
    return float(rlat.min()), float(rlat.max()), float(rlon.min()), float(rlon.max())


def polygon_cell_cover(ring: list[dict], level: int) -> np.ndarray:
    """C7: conservative superset of level-`level` cells containing any
    point of the polygon's interior/boundary: every cell intersecting
    the ring's bbox (polygons are small relative to cells in practice;
    the exact PIP refine removes false positives). Handles antimeridian
    rings via wrapped i-ranges. Returns sorted unique packed cell ids."""
    from engine import grid

    lat_lo, lat_hi, lon_lo, lon_hi = polygon_bbox(ring)
    nc, nr = grid.grid_shape(level)
    dlon = 360.0 / nc
    dlat = 180.0 / nr
    j_lo = max(0, int(np.floor((lat_lo + 90.0) / dlat)))
    j_hi = min(nr - 1, int(np.floor((lat_hi + 90.0) / dlat)))
    i_lo = int(np.floor((lon_lo + 180.0) / dlon))
    i_hi = int(np.floor((lon_hi + 180.0) / dlon))
    ii = np.arange(i_lo, i_hi + 1, dtype=np.int64) % nc
    jj = np.arange(j_lo, j_hi + 1, dtype=np.int64)
    gi, gj = np.meshgrid(np.unique(ii), jj, indexing="ij")
    ids = grid.cell_id_pack(
        grid._morton_encode(gi.ravel(), gj.ravel(), level), level
    )
    return np.unique(ids)
