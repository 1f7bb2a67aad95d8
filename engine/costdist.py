"""Cost distance (accumulated-cost raster) — the weighted companion of
the Euclidean distance transform (W18) and the last classic member of
the GIS distance family (ESRI CostDistance / GRASS r.cost), round 4.

Pinned semantics (normative, mirrored by the sq_reclass_algebra
'costd' oracle):

- input band = the per-cell traversal COST raster (positive; NaN =
  impassable barrier); SOURCE cells are ``pred(band)``;
- the accumulated cost of a path v0, v1, ..., vk (v0 a source) is the
  sum of per-step costs ``dist(u, v) · (cost(u) + cost(v)) / 2`` with
  dist = 1 (rook) / 1.4142135623730951 (diag, the engine's pinned
  literal) — the standard GIS cost-distance step;
- D(c) = the minimum accumulated cost over 8-connected paths from any
  source to c; D(source) = 0; cells unreachable within the window →
  NaN;
- BOUNDED contract (same capped-window discipline as the EDT and the
  fill): each tile solves its (T+2·cap)² halo window, and ONLY paths
  contained in the window are considered. Exact wherever the optimal
  path's excursion stays within cap cells of the tile; a path that
  detours farther is a coarser-level question (raise cap or run at a
  pyramid level). Window truncation can only RAISE D or turn it NaN —
  never under-reports cost.

Physical plan (the 100-TB shape): ONE halo exchange (g=cap) + ONE
applyInPandas running Dijkstra per window. No iteration, no driver
traffic — identical to distance_transform/fill_depressions.
"""

from __future__ import annotations

import heapq
from collections.abc import Callable

import numpy as np
from pyspark.sql import DataFrame

from engine import tiling

__all__ = ["cost_distance", "cost_distance_kernel"]

_SQRT2 = 1.4142135623730951
_N8 = (
    (-1, -1, _SQRT2), (-1, 0, 1.0), (-1, 1, _SQRT2),
    (0, -1, 1.0), (0, 1, 1.0),
    (1, -1, _SQRT2), (1, 0, 1.0), (1, 1, _SQRT2),
)


def cost_distance_kernel(
    cost: np.ndarray, pred: Callable[[np.ndarray], np.ndarray]
) -> np.ndarray:
    """Exact Dijkstra over one window: accumulated cost from the
    nearest pred-cell under the pinned step formula. NaN cost =
    barrier; unreachable = NaN."""
    a = np.asarray(cost, dtype=np.float64)
    H, W = a.shape
    valid = np.isfinite(a)
    src = np.asarray(pred(a), dtype=bool) & valid
    D = np.full((H, W), np.inf)
    D[src] = 0.0
    done = np.zeros((H, W), dtype=bool)
    sj, si = np.nonzero(src)
    heap = [(0.0, int(j), int(i)) for j, i in zip(sj, si)]
    heapq.heapify(heap)
    while heap:
        d, j, i = heapq.heappop(heap)
        if done[j, i]:
            continue
        done[j, i] = True
        cu = a[j, i]
        for dj, di, dist in _N8:
            nj, ni = j + dj, i + di
            if 0 <= nj < H and 0 <= ni < W and valid[nj, ni] and not done[nj, ni]:
                nd = d + dist * (cu + a[nj, ni]) / 2.0
                if nd < D[nj, ni]:
                    D[nj, ni] = nd
                    heapq.heappush(heap, (nd, nj, ni))
    D[~valid] = np.nan
    D[np.isinf(D)] = np.nan
    return D


def cost_distance(
    tiles: DataFrame,
    T: int,
    cap: int,
    pred: Callable[[np.ndarray], np.ndarray],
    level: int = 0,
    wrap_nx: int | None = None,
    out_band: str = "costd",
) -> DataFrame:
    """Accumulated-cost raster over a tiled cost band: ONE halo
    exchange (g=cap) + per-window Dijkstra (bounded contract — module
    docstring). ``cap <= T`` (immediate-neighbor halo)."""
    if cap > T:
        raise ValueError(f"cap ({cap}) must be <= tile size T ({T})")
    fn = lambda a, r, shape: cost_distance_kernel(a, pred)  # noqa: E731
    return tiling.apply_focal(
        tiles, cap, "square", {out_band: fn}, T, level=level, wrap_nx=wrap_nx
    )
