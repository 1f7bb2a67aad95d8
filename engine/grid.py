"""pcq — plate-carrée quadtree cell index (pure NumPy, no Spark imports).

A from-scratch hierarchical discrete global grid standing in for H3/S2
(neither is installed in this environment). Semantics pinned in
SURVEY.md §2.3.1 and §5.3.1:

- Level ``l`` partitions the globe into a ``2**l × 2**(l-1)`` grid of
  cells (lon columns × lat rows); lon spans [-180, 180), lat [-90, 90).
- Cell ``(i, j)`` covers the half-open box
  ``[lon_lo + i*dlon, lon_lo + (i+1)*dlon) × [lat_lo + j*dlat, ...)``.
- 64-bit id packs ``level`` in the top 5 bits and a (2l-1)-bit Morton
  code below: ``id = (level << 58) | morton``. Morton bits high→low are
  ``i_{l-1}, j_{l-2}, i_{l-2}, …, j_0, i_0`` so that the four children
  of a cell are ``morton*4 + {0,1,2,3}`` — descendants of any cell form
  one contiguous id range (enables BETWEEN predicates / partition
  pruning, SURVEY.md §2.2 P3).
- Neighbors wrap in longitude and clamp (drop) in latitude.

Reference parity note: the reference library (ahhz/moving_window) is a
single-raster C++ engine with no global grid; this module implements the
"H3/S2 index" capability mandated by BASELINE.json:14 (north rule).
Everything here is deterministic integer/float arithmetic so the DuckDB
oracle can replicate the un-interleaved ``(level, i, j)`` form in SQL
(SURVEY.md §5.4).

All functions are vectorized over NumPy arrays and are reused verbatim
inside pandas UDFs (engine/udfs.py) — one implementation, shared by
tests, goldens and the Spark runtime.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 29  # 2*29-1 = 57 morton bits < 58 available
_LEVEL_SHIFT = 58

__all__ = [
    "MAX_LEVEL",
    "cell_children",
    "cell_decode",
    "cell_descendant_range",
    "cell_encode",
    "cell_id_pack",
    "cell_id_unpack",
    "cell_parent",
    "cell_to_tile",
    "grid_shape",
    "haversine_km",
    "k_ring",
    "latlon_to_ij",
    "tile_to_cell_origin",
]

EARTH_RADIUS_KM = 6371.0088  # SURVEY.md §5.3.7


def grid_shape(level):
    """(n_cols, n_rows) of the level-``level`` grid."""
    level = int(level)
    if not 1 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [1, {MAX_LEVEL}], got {level}")
    return 1 << level, 1 << (level - 1)


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 so bit k lands at bit 2k."""
    v = v.astype(np.uint64)
    v &= np.uint64(0x00000000FFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact1by1(v: np.ndarray) -> np.ndarray:
    """Inverse of _part1by1: gather the even bits of each uint64."""
    v = v.astype(np.uint64)
    v &= np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def _morton_encode(i: np.ndarray, j: np.ndarray, level: int) -> np.ndarray:
    """(i, j) -> (2*level-1)-bit morton; i has `level` bits, j `level-1`."""
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    low_bits = level - 1
    mask = np.uint64((1 << low_bits) - 1)
    top = (i >> np.uint64(low_bits)) << np.uint64(2 * level - 2)
    body = _part1by1(i & mask) | (_part1by1(j) << np.uint64(1))
    return top | body


def _morton_decode(m: np.ndarray, level: int) -> tuple[np.ndarray, np.ndarray]:
    m = np.asarray(m, dtype=np.uint64)
    low_bits = level - 1
    top = (m >> np.uint64(2 * level - 2)) & np.uint64(1)
    i = _compact1by1(m) | (top << np.uint64(low_bits))
    j = _compact1by1(m >> np.uint64(1))
    return i.astype(np.int64), j.astype(np.int64)


def cell_id_pack(morton: np.ndarray, level: int) -> np.ndarray:
    return (
        (np.uint64(level) << np.uint64(_LEVEL_SHIFT)) | np.asarray(morton, np.uint64)
    ).astype(np.int64)


def cell_id_unpack(cell_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """cell_id -> (morton: uint64 array, level: int64 array)."""
    cid = np.asarray(cell_id, dtype=np.int64).astype(np.uint64)
    level = (cid >> np.uint64(_LEVEL_SHIFT)).astype(np.int64)
    morton = cid & np.uint64((1 << _LEVEL_SHIFT) - 1)
    return morton, level


def latlon_to_ij(
    lat: np.ndarray, lon: np.ndarray, level: int
) -> tuple[np.ndarray, np.ndarray]:
    """Quantize lat/lon to integer grid coords. lon wraps, lat clamps."""
    nc, nr = grid_shape(level)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    i = np.floor((lon + 180.0) / 360.0 * nc).astype(np.int64)
    i = np.mod(i, nc)  # lon wrap (handles lon == 180 and beyond)
    j = np.floor((lat + 90.0) / 180.0 * nr).astype(np.int64)
    j = np.clip(j, 0, nr - 1)  # lat clamp (handles lat == 90)
    return i, j


def cell_encode(lat: np.ndarray, lon: np.ndarray, level: int) -> np.ndarray:
    """(lat, lon, level) -> packed int64 cell id (operator C2)."""
    i, j = latlon_to_ij(lat, lon, level)
    return cell_id_pack(_morton_encode(i, j, level), level)


def cell_decode(cell_id: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """cell_id -> (lat_center, lon_center, i, j, level) (operator C3).

    Vectorized per distinct level present in the batch (levels in one
    batch are nearly always uniform).
    """
    morton, level = cell_id_unpack(cell_id)
    i = np.empty(morton.shape, np.int64)
    j = np.empty(morton.shape, np.int64)
    for lv in np.unique(level):
        sel = level == lv
        ii, jj = _morton_decode(morton[sel], int(lv))
        i[sel], j[sel] = ii, jj
    nc = (np.int64(1) << level).astype(np.float64)
    nr = (np.int64(1) << (level - 1)).astype(np.float64)
    lon = (i + 0.5) * (360.0 / nc) - 180.0
    lat = (j + 0.5) * (180.0 / nr) - 90.0
    return lat, lon, i, j, level


def cell_parent(cell_id: np.ndarray, parent_level: int | None = None) -> np.ndarray:
    """Ancestor at ``parent_level`` (default: one level up) (operator C4)."""
    morton, level = cell_id_unpack(cell_id)
    if parent_level is None:
        target = level - 1
    else:
        target = np.full_like(level, parent_level)
    if np.any(target < 1) or np.any(target > level):
        raise ValueError("parent_level must be in [1, level]")
    shift = (2 * (level - target)).astype(np.uint64)
    return (
        (target.astype(np.uint64) << np.uint64(_LEVEL_SHIFT)) | (morton >> shift)
    ).astype(np.int64)


def cell_children(cell_id: int) -> np.ndarray:
    """The 4 direct children of a single cell id (operator C4)."""
    morton, level = cell_id_unpack(np.asarray([cell_id]))
    lv = int(level[0])
    if lv >= MAX_LEVEL:
        raise ValueError("cannot descend below MAX_LEVEL")
    kids = (morton[0] << np.uint64(2)) + np.arange(4, dtype=np.uint64)
    return cell_id_pack(kids, lv + 1)


def cell_descendant_range(cell_id: int, level: int) -> tuple[int, int]:
    """[lo, hi] inclusive id range of all level-``level`` descendants.

    Range-contiguity property (operator P3): every descendant id of a
    cell is inside this single interval, so a spatial predicate compiles
    to ``cell_id BETWEEN lo AND hi`` and prunes sorted/partitioned data.
    """
    morton, lv = cell_id_unpack(np.asarray([cell_id]))
    lv = int(lv[0])
    if level < lv:
        raise ValueError("target level must be >= cell level")
    d = np.uint64(2 * (level - lv))
    lo = morton[0] << d
    hi = ((morton[0] + np.uint64(1)) << d) - np.uint64(1)
    return int(cell_id_pack(lo, level)), int(cell_id_pack(hi, level))


def bbox_to_ij_bounds(
    lat_lo: float, lat_hi: float, lon_lo: float, lon_hi: float, level: int
) -> tuple[list[tuple[int, int]], tuple[int, int]]:
    """Half-open bbox → the (i, j) bounds of every intersecting cell:
    ([one or two inclusive i-intervals], (j0, j1)). Two i-intervals when
    the box crosses the antimeridian (lon_lo > lon_hi)."""
    nc, nr = grid_shape(level)
    dlon, dlat = 360.0 / nc, 180.0 / nr
    j0 = max(0, int(np.floor((lat_lo + 90.0) / dlat)))
    j1 = min(nr - 1, int(np.floor((lat_hi + 90.0) / dlat - 1e-12)))
    i0 = int(np.floor((lon_lo + 180.0) / dlon)) % nc
    i1 = int(np.floor((lon_hi + 180.0) / dlon - 1e-12)) % nc
    if i0 <= i1:
        iv = [(i0, i1)]
    else:  # antimeridian wrap
        iv = [(i0, nc - 1), (0, i1)]
    return iv, (j0, j1)


def bbox_to_cell_ranges(
    lat_lo: float,
    lat_hi: float,
    lon_lo: float,
    lon_hi: float,
    level: int,
    max_ranges: int = 256,
) -> list[tuple[int, int]]:
    """P3/P4 planner: compile a bbox into a minimal set of contiguous
    cell-id BETWEEN ranges at ``level`` — the range-contiguity payoff
    of the Morton layout (cell-sorted/partitioned tables prune on
    these; SURVEY.md §2.2).

    Quadtree descent: an ancestor cell fully inside the (i, j) box
    emits its whole descendant range (one interval); a partial overlap
    recurses; disjoint prunes. The union of returned ranges covers
    EXACTLY the box's cells when the budget allows; if the
    decomposition would exceed ``max_ranges``, partially-covered
    ancestors emit whole (superset) ranges — callers needing exactness
    keep the residual (i, j) predicate as refine (the standard
    coarse-prune + exact-filter split)."""
    ivs, (j0, j1) = bbox_to_ij_bounds(lat_lo, lat_hi, lon_lo, lon_hi, level)
    if j0 > j1:
        return []
    out: list[tuple[int, int]] = []

    def boxes_overlap(a0, a1, b0, b1):
        return a0 <= b1 and b0 <= a1

    for i0, i1 in ivs:
        # stack of (lvl, i, j) ancestor cells, from the 2×1 level-1 grid
        stack = [(1, i, 0) for i in range(2)]
        while stack:
            lvl, ci, cj = stack.pop()
            shift = level - lvl
            bi0, bi1 = ci << shift, ((ci + 1) << shift) - 1
            bj0, bj1 = cj << shift, ((cj + 1) << shift) - 1
            if not (boxes_overlap(bi0, bi1, i0, i1) and boxes_overlap(bj0, bj1, j0, j1)):
                continue
            full = i0 <= bi0 and bi1 <= i1 and j0 <= bj0 and bj1 <= j1
            if full or lvl == level or len(out) >= max_ranges:
                cid = int(cell_id_pack(_morton_encode(
                    np.asarray([ci]), np.asarray([cj]), lvl)[0], lvl))
                out.append(cell_descendant_range(cid, level))
                continue
            for q in range(4):
                stack.append((lvl + 1, ci * 2 + (q & 1), cj * 2 + (q >> 1)))
    # merge adjacent/overlapping ranges (sibling quadrants are contiguous)
    out.sort()
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged


def k_ring(cell_id: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k (the (2k+1)² block), with
    longitude wrap-around and latitude clamping (operator C5).

    Returned sorted ascending, includes the center cell.
    """
    morton, level = cell_id_unpack(np.asarray([cell_id]))
    lv = int(level[0])
    i0, j0 = _morton_decode(morton, lv)
    nc, nr = grid_shape(lv)
    di = np.arange(-k, k + 1)
    ii, jj = np.meshgrid(i0[0] + di, j0[0] + di, indexing="ij")
    ii = np.mod(ii.ravel(), nc)
    jj = jj.ravel()
    ok = (jj >= 0) & (jj < nr)
    ids = cell_id_pack(_morton_encode(ii[ok], jj[ok], lv), lv)
    return np.unique(ids)


def k_ring_batch(cell_ids: np.ndarray, k: int) -> list[np.ndarray]:
    """Vectorized k_ring over a batch: one (2k+1)²-sized meshgrid for all
    rows at once; returns a list of per-row sorted id arrays."""
    morton, level = cell_id_unpack(np.asarray(cell_ids))
    out: list[np.ndarray] = [np.empty(0, np.int64)] * len(morton)
    offs = np.arange(-k, k + 1)
    doff_i, doff_j = np.meshgrid(offs, offs, indexing="ij")
    doff_i = doff_i.ravel()[None, :]
    doff_j = doff_j.ravel()[None, :]
    for lv in np.unique(level):
        sel = np.nonzero(level == lv)[0]
        lv = int(lv)
        nc, nr = grid_shape(lv)
        i0, j0 = _morton_decode(morton[sel], lv)
        ii = np.mod(i0[:, None] + doff_i, nc)
        jj = j0[:, None] + doff_j
        ok = (jj >= 0) & (jj < nr)
        ids = cell_id_pack(_morton_encode(ii, np.where(ok, jj, 0), lv), lv)
        for row, (id_row, ok_row) in zip(sel, zip(ids, ok)):
            out[row] = np.unique(id_row[ok_row])
    return out


def cell_to_tile(
    cell_id: np.ndarray, tile_size: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """cell -> (tile_x, tile_y, in_tile_i, in_tile_j) for T=tile_size
    (operator C6). Tiles partition the level grid into T×T blocks."""
    morton, level = cell_id_unpack(cell_id)
    i = np.empty(morton.shape, np.int64)
    j = np.empty(morton.shape, np.int64)
    for lv in np.unique(level):
        sel = level == lv
        ii, jj = _morton_decode(morton[sel], int(lv))
        i[sel], j[sel] = ii, jj
    return i // tile_size, j // tile_size, i % tile_size, j % tile_size


def tile_to_cell_origin(tile_x: int, tile_y: int, tile_size: int) -> tuple[int, int]:
    """Grid coords (i, j) of a tile's (0, 0) cell."""
    return tile_x * tile_size, tile_y * tile_size


def haversine_km(
    lat1: np.ndarray, lon1: np.ndarray, lat2: np.ndarray, lon2: np.ndarray
) -> np.ndarray:
    """Great-circle distance, f64, R=6371.0088 km (SURVEY.md §5.3.7)."""
    la1, lo1, la2, lo2 = (np.radians(np.asarray(a, np.float64)) for a in (lat1, lon1, lat2, lon2))
    dlat = la2 - la1
    dlon = lo2 - lo1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(la1) * np.cos(la2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))
