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


def _ring_parity_edge(
    lat: np.ndarray, lon: np.ndarray, ring: list[dict]
) -> tuple[np.ndarray, np.ndarray]:
    """(crossing parity, on-any-edge) masks for one ring — the shared
    core of the single-ring and holed tests."""
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
    return inside, on_edge


def point_in_polygon(
    lat: np.ndarray, lon: np.ndarray, ring: list[dict]
) -> np.ndarray:
    """Boolean mask; fully vectorized over points (edges looped — rings
    are small)."""
    inside, on_edge = _ring_parity_edge(lat, lon, ring)
    return inside | on_edge


def point_in_rings(
    lat: np.ndarray, lon: np.ndarray, rings: list[list[dict]]
) -> np.ndarray:
    """Even-odd test over outer ring + holes (``rings[0]`` = outer,
    rest = holes): combined crossing parity (a point inside exactly one
    hole XORs back to outside), with every ring's boundary — hole
    boundaries included — counting as INSIDE (§5.3.6 extended to
    multi-ring polygons)."""
    lat = np.asarray(lat, dtype=np.float64)
    parity = np.zeros(np.shape(lat), dtype=bool)
    on_edge = np.zeros(np.shape(lat), dtype=bool)
    for ring in rings:
        p, e = _ring_parity_edge(lat, lon, ring)
        parity ^= p
        on_edge |= e
    return parity | on_edge


def poly_rings(p: dict) -> list[list[dict]]:
    """[outer] + holes for a polygon dict ({'ring': ..., 'holes':
    optional list of rings})."""
    return [p["ring"]] + list(p.get("holes") or [])


def polygon_bbox(ring: list[dict]) -> tuple[float, float, float, float]:
    rlat, rlon = _ring_arrays(ring)
    return float(rlat.min()), float(rlat.max()), float(rlon.min()), float(rlon.max())


def _edge_supercover(x0: float, y0: float, x1: float, y1: float) -> tuple[np.ndarray, np.ndarray]:
    """All (ix, iy) unit-grid cells a segment passes through or touches
    (conservative supercover: both neighbors at every gridline crossing
    are included, so float rounding can never drop a clipped cell)."""
    ts = [np.array([0.0, 1.0])]
    dx, dy = x1 - x0, y1 - y0
    for p0, d in ((x0, dx), (y0, dy)):
        if d != 0.0:
            lo, hi = sorted((p0, p0 + d))
            ks = np.arange(np.ceil(lo), np.floor(hi) + 1.0)
            ts.append((ks - p0) / d)
    t = np.unique(np.clip(np.concatenate(ts), 0.0, 1.0))
    mids = (t[:-1] + t[1:]) / 2.0
    pts_t = np.concatenate([mids, t])  # midpoints + the crossings themselves
    xs = x0 + pts_t * dx
    ys = y0 + pts_t * dy
    ix = np.floor(xs).astype(np.int64)
    iy = np.floor(ys).astype(np.int64)
    # at a crossing, include both adjacent cells in each dimension
    on_x = xs == np.floor(xs)
    on_y = ys == np.floor(ys)
    ix_all = np.concatenate([ix, ix[on_x] - 1, ix[on_y]])
    iy_all = np.concatenate([iy, iy[on_x], iy[on_y] - 1])
    return ix_all, iy_all


def polygon_cell_cover(
    ring: list[dict], level: int, holes: list[list[dict]] | None = None
) -> np.ndarray:
    """C7: the level-`level` cells intersecting the polygon — refined
    cover (round 2; the round-1 version returned the full bbox cell
    set, inflating J1 candidates by the bbox/polygon area ratio for
    concave shapes): supercover grid traversal of every ring edge ∪
    cells whose center is inside the polygon. Any cell intersecting the
    polygon either contains boundary (→ traversed) or is entirely
    interior (→ center inside), so this stays a strict superset of the
    true intersection set while dropping bbox-only cells. Handles
    antimeridian rings via lon wrap at emission. Returns sorted unique
    packed cell ids."""
    from engine import grid

    lat_lo, lat_hi, lon_lo, lon_hi = polygon_bbox(ring)
    nc, nr = grid.grid_shape(level)
    dlon = 360.0 / nc
    dlat = 180.0 / nr
    # boundary cells: supercover of each edge (outer AND hole rings —
    # a cell straddling a hole edge still intersects the polygon) in
    # continuous grid coords
    all_rings = [ring] + list(holes or [])
    bi: list[np.ndarray] = []
    bj: list[np.ndarray] = []
    for rg in all_rings:
        rlat, rlon = _ring_arrays(rg)
        xs = (rlon + 180.0) / dlon
        ys = (rlat + 90.0) / dlat
        for k in range(len(xs) - 1):
            ix, iy = _edge_supercover(xs[k], ys[k], xs[k + 1], ys[k + 1])
            bi.append(ix)
            bj.append(iy)
    # interior cells: bbox candidates whose CENTER is inside the ring
    j_lo = max(0, int(np.floor((lat_lo + 90.0) / dlat)))
    j_hi = min(nr - 1, int(np.floor((lat_hi + 90.0) / dlat)))
    i_lo = int(np.floor((lon_lo + 180.0) / dlon))
    i_hi = int(np.floor((lon_hi + 180.0) / dlon))
    gi, gj = np.meshgrid(
        np.arange(i_lo, i_hi + 1, dtype=np.int64),
        np.arange(j_lo, j_hi + 1, dtype=np.int64),
        indexing="ij",
    )
    gi, gj = gi.ravel(), gj.ravel()
    c_lat = (gj + 0.5) * dlat - 90.0
    c_lon = (gi + 0.5) * dlon - 180.0
    inside = point_in_rings(c_lat, c_lon, all_rings)
    ii = np.concatenate(bi + [gi[inside]])
    jj = np.concatenate(bj + [gj[inside]])
    ok = (jj >= 0) & (jj < nr)
    ii = np.mod(ii[ok], nc)
    jj = jj[ok]
    ids = grid.cell_id_pack(grid._morton_encode(ii, jj, level), level)
    return np.unique(ids)
