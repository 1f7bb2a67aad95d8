"""Raster→vector transfer: polygonize patch-label tiles into boundary
rings (SURVEY.md §7-M6; BASELINE.json:6 "raster-to-vector / vector-to-
raster transfers" — the inverse of A2 rasterize).

Algorithm (distributed, two shuffles):
1. 1-deep halo exchange of the label tiles (reuses J4), so every tile
   sees its neighbors' border labels;
2. per tile, VECTORIZED boundary-segment extraction: each cell side
   whose neighbor carries a different label / nodata / out-of-raster
   emits one unit segment in global grid coordinates, directed so the
   patch interior is on a consistent side (cell boundary traversed
   clockwise in y-down coords) — shared walls between same-patch cells
   cancel by construction;
3. ``groupBy(patch_id)`` ring assembly: directed segments chain
   start→end into closed rings (a patch's segment count ~ its
   perimeter, so groups stay small even when the patch spans many
   tiles); collinear runs are compressed. Outer rings and holes are
   distinguished by signed area (clockwise traversal in y-down coords
   makes outer rings positive).

The golden test round-trips: rasterize(polygonize(labels)) == labels
(even-odd point-in-rings per cell center) — tests/test_vector.py.

Limits (v1, documented): no antimeridian wrap (a seam-crossing patch
yields two rings); coordinates are grid units (callers scale to
lon/lat via grid.tile_to_cell_origin + cell size).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from engine import tiling

SEGMENTS_SCHEMA = "patch_id long, x0 long, y0 long, x1 long, y1 long"
RINGS_SCHEMA = (
    "patch_id long, ring_idx int, n_pts int, signed_area double, "
    "is_outer boolean, xs array<double>, ys array<double>"
)


def _emit_segments(T: int, key, pdf: pd.DataFrame) -> pd.DataFrame:
    got = tiling.assemble_padded(pdf, T, 1)
    if got is None:
        return pd.DataFrame(columns=["patch_id", "x0", "y0", "x1", "y1"])
    bands, nr, nc = got
    (_, padded), = bands.items()
    core = padded[1 : 1 + nr, 1 : 1 + nc]
    tx, ty = int(key[0]), int(key[1])
    gx0, gy0 = tx * T, ty * T
    finite = np.isfinite(core)
    jj, ii = np.mgrid[0:nr, 0:nc]
    out = []
    # side -> (neighbor offset, segment (start, end)) — clockwise cell
    # boundary in y-down coords: top L->R, right T->B, bottom R->L, left B->T
    sides = {
        "top": ((-1, 0), lambda x, y: (x, y, x + 1, y)),
        "right": ((0, 1), lambda x, y: (x + 1, y, x + 1, y + 1)),
        "bottom": ((1, 0), lambda x, y: (x + 1, y + 1, x, y + 1)),
        "left": ((0, -1), lambda x, y: (x, y + 1, x, y)),
    }
    for (dy, dx), seg in sides.values():
        nb = padded[1 + dy : 1 + dy + nr, 1 + dx : 1 + dx + nc]
        boundary = finite & (~np.isfinite(nb) | (nb != core))
        if not boundary.any():
            continue
        x = (gx0 + ii[boundary]).astype(np.int64)
        y = (gy0 + jj[boundary]).astype(np.int64)
        x0, y0, x1, y1 = seg(x, y)
        out.append(
            pd.DataFrame(
                {
                    "patch_id": core[boundary].astype(np.int64),
                    "x0": x0, "y0": y0, "x1": x1, "y1": y1,
                }
            )
        )
    if not out:
        return pd.DataFrame(columns=["patch_id", "x0", "y0", "x1", "y1"])
    return pd.concat(out, ignore_index=True)


def _chain_rings(key, pdf: pd.DataFrame) -> pd.DataFrame:
    """Directed segments of ONE patch → closed rings (deterministic:
    start from the lexicographically smallest unused segment; at pinch
    vertices pop outgoing segments in sorted order)."""
    patch_id = int(key[0])
    segs = pdf[["x0", "y0", "x1", "y1"]].drop_duplicates().sort_values(
        ["x0", "y0", "x1", "y1"]
    )
    # start-vertex -> ordered list of (end-vertex) candidates
    from collections import defaultdict

    outgoing: dict[tuple[int, int], list[tuple[int, int]]] = defaultdict(list)
    for x0, y0, x1, y1 in segs.itertuples(index=False):
        outgoing[(x0, y0)].append((x1, y1))
    for v in outgoing.values():
        v.sort(reverse=True)  # pop() takes the smallest
    starts = sorted(outgoing.keys())
    rows = []
    ring_idx = 0
    for s in starts:
        while outgoing.get(s):
            ring = [s]
            cur = outgoing[s].pop()
            while cur != s:
                ring.append(cur)
                nxt = outgoing.get(cur)
                if not nxt:  # broken chain (shouldn't happen) — drop
                    ring = None
                    break
                cur = nxt.pop()
            if not ring:
                continue
            ring.append(s)
            # compress collinear runs (axis-aligned unit steps)
            comp = [ring[0]]
            for p in ring[1:]:
                if len(comp) >= 2 and (
                    (comp[-1][0] == comp[-2][0] == p[0])
                    or (comp[-1][1] == comp[-2][1] == p[1])
                ):
                    comp[-1] = p
                else:
                    comp.append(p)
            # closing segment may be collinear with the first
            if len(comp) >= 3 and (
                (comp[0][0] == comp[1][0] == comp[-2][0])
                or (comp[0][1] == comp[1][1] == comp[-2][1])
            ):
                comp = comp[1:-1] + [comp[1]]
            xs = np.array([p[0] for p in comp], dtype=np.float64)
            ys = np.array([p[1] for p in comp], dtype=np.float64)
            area2 = float(np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1])) / 2.0
            rows.append(
                {
                    "patch_id": patch_id,
                    "ring_idx": ring_idx,
                    "n_pts": len(comp),
                    "signed_area": area2,
                    # y-down clockwise traversal ⇒ outer rings have
                    # positive shoelace area in (x, y-down)
                    "is_outer": area2 > 0,
                    "xs": xs,
                    "ys": ys,
                }
            )
            ring_idx += 1
    return pd.DataFrame(
        rows,
        columns=["patch_id", "ring_idx", "n_pts", "signed_area", "is_outer", "xs", "ys"],
    )


def polygonize(label_tiles: DataFrame, T: int) -> DataFrame:
    """Patch-label tiles (band='patch', data = patch root ids, NaN =
    nodata) → one row per boundary ring per patch."""
    exchanged = tiling.halo_exchange(label_tiles, T, 1, wrap_nx=None)
    segments = exchanged.groupBy("dst_tx", "dst_ty").applyInPandas(
        partial(_emit_segments, T), SEGMENTS_SCHEMA
    )
    return segments.groupBy("patch_id").applyInPandas(_chain_rings, RINGS_SCHEMA)


def point_in_rings(
    px: np.ndarray, py: np.ndarray, rings: list[tuple[np.ndarray, np.ndarray]]
) -> np.ndarray:
    """Even-odd containment of points in a ring set (outer + holes) —
    test helper for the rasterize∘polygonize round-trip."""
    inside = np.zeros(len(px), dtype=bool)
    for xs, ys in rings:
        x0, y0 = xs[:-1], ys[:-1]
        x1, y1 = xs[1:], ys[1:]
        for k in range(len(x0)):
            cond = (y0[k] > py) != (y1[k] > py)
            if y1[k] == y0[k]:
                continue
            xint = x0[k] + (py - y0[k]) * (x1[k] - x0[k]) / (y1[k] - y0[k])
            inside ^= cond & (px < xint)
    return inside
