"""Hydrology operators: D8 flow direction + distributed flow
accumulation (SURVEY.md §2.6 extension, round 3).

Every raster engine with terrain support ships these two; they are the
canonical NON-focal global raster op — accumulation at a cell depends on
an unbounded upstream region, so no single halo exchange can compute it.
The distributed design mirrors the engine's CCL stitching (W14): local
NumPy solve per tile + an inter-tile fixpoint whose rounds move
information one tile-hop per shuffle.

Pinned semantics (normative, mirrored by the DuckDB oracle):

- D8 direction codes (ESRI): E=1, SE=2, S=4, SW=8, W=16, NW=32, N=64,
  NE=128 on the y-down grid (j increases SOUTH). Steepest drop
  (z_c − z_n)/dist with dist = 1 (rook) or 1.4142135623730951 (diag,
  pinned literal). Neighbors outside the raster or NaN are ineligible.
  Ties: the FIRST direction in the code order above with the maximal
  drop wins (strict > replacement). No positive drop → 0 (pit/flat).
  Output is NaN where the center is NaN.
- Accumulation acc(c) = number of cells (including c itself) whose
  D8 path passes through c; a pit's accumulation absorbs everything
  draining into it. Strict-descent D8 admits no cycles, so acc is
  well-defined.

Distributed accumulation:
1. per tile: Kahn topological waves over the in-tile receiver graph —
   each wave is one vectorized scatter-add (``np.add.at``), #waves =
   longest in-tile flow path;
2. flows whose receiver lies in a neighbor tile are emitted as
   (dst_tile, dst_cell, flow) border contributions;
3. contributions feed back as external inflows and tiles re-solve;
   repeat until the emitted contribution set reaches a fixpoint
   (monotone and bounded above by total cell count, so it terminates in
   ≤ (tile-graph longest chain) rounds — each round is ONE shuffle +
   one cheap driver equality check, the kNN/CCL round pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine import tiling

__all__ = ["D8_OFFSETS", "flow_accumulation", "flow_direction_kernel", "flow_direction"]

_SQRT2 = 1.4142135623730951

# (code, dj, di, dist) in the pinned tie order E, SE, S, SW, W, NW, N, NE
D8_OFFSETS = (
    (1, 0, 1, 1.0),
    (2, 1, 1, _SQRT2),
    (4, 1, 0, 1.0),
    (8, 1, -1, _SQRT2),
    (16, 0, -1, 1.0),
    (32, -1, -1, _SQRT2),
    (64, -1, 0, 1.0),
    (128, -1, 1, _SQRT2),
)


def flow_direction_kernel(
    arr: np.ndarray, r: int = 1, shape: str = "square"
) -> np.ndarray:
    """D8 codes for every valid cell of ``arr`` (NaN-padded halo makes
    out-of-raster neighbors ineligible automatically)."""
    a = np.asarray(arr, dtype=np.float64)
    H, W = a.shape
    best = np.zeros((H, W))
    code = np.zeros((H, W))
    pad = np.full((H + 2, W + 2), np.nan)
    pad[1:-1, 1:-1] = a
    for c, dj, di, dist in D8_OFFSETS:
        nb = pad[1 + dj : 1 + dj + H, 1 + di : 1 + di + W]
        with np.errstate(invalid="ignore"):
            drop = (a - nb) / dist
        take = np.isfinite(drop) & (drop > 0) & (drop > best)
        best = np.where(take, drop, best)
        code = np.where(take, float(c), code)
    return np.where(np.isfinite(a), code, np.nan)


def flow_direction(
    tiles: DataFrame, T: int, level: int = 0, wrap_nx: int | None = None
) -> DataFrame:
    """D8 direction tiles from elevation tiles: ONE 1-deep halo
    exchange + the kernel (band 'flowdir')."""
    return tiling.apply_focal(
        tiles, 1, "square", {"flowdir": flow_direction_kernel}, T,
        level=level, wrap_nx=wrap_nx,
    )


_CODE2OFF = {c: (dj, di) for c, dj, di, _ in D8_OFFSETS}


def _solve_tile(
    dirs: np.ndarray, inflow: np.ndarray
) -> tuple[np.ndarray, list[tuple[int, int, int, float]]]:
    """Kahn-wave accumulation inside one tile. dirs: (nr,nc) D8 codes
    (NaN invalid); inflow: external contributions per cell. Returns
    (acc plane, [(dtx, dty, dst_cell, flow), ...] border emissions with
    dtx/dty in {-1,0,1})."""
    nr, nc = dirs.shape
    n = nr * nc
    d = dirs.ravel()
    valid = np.isfinite(d)
    acc = np.where(valid, 1.0 + inflow.ravel(), 0.0)

    # receiver linear index, -1 if none / outside the tile
    recv = np.full(n, -1, dtype=np.int64)
    out_mask = np.zeros(n, dtype=bool)
    jj, ii = np.divmod(np.arange(n), nc)
    for c, (dj, di) in _CODE2OFF.items():
        sel = valid & (d == c)
        tj, ti = jj[sel] + dj, ii[sel] + di
        inside = (tj >= 0) & (tj < nr) & (ti >= 0) & (ti < nc)
        idx = np.flatnonzero(sel)
        recv[idx[inside]] = tj[inside] * nc + ti[inside]
        out_mask[idx[~inside]] = True

    indeg = np.zeros(n, dtype=np.int64)
    has_recv = recv >= 0
    np.add.at(indeg, recv[has_recv], 1)
    frontier = np.flatnonzero(valid & (indeg == 0))
    while len(frontier):
        fr = frontier[recv[frontier] >= 0]
        if not len(fr):
            break
        tgt = recv[fr]
        np.add.at(acc, tgt, acc[fr])
        np.subtract.at(indeg, tgt, 1)
        done = np.zeros(n, dtype=bool)
        done[tgt] = True
        frontier = np.flatnonzero(done & (indeg == 0))

    emits: list[tuple[int, int, int, float]] = []
    for cell in np.flatnonzero(out_mask):
        dj, di = _CODE2OFF[int(d[cell])]
        tj, ti = jj[cell] + dj, ii[cell] + di
        # destination coordinates in the NEIGHBOR tile's local frame.
        # A border crossing lands on the first/last row/col of the
        # neighbor, i.e. local index 0 or (neighbor dim − 1) — the
        # neighbor's dims are unknown here (ragged tiles!), so row/col
        # are packed as (tj<<16)|ti with 0xFFFF meaning "last": the
        # receiver resolves it against ITS OWN nrows/ncols.
        dty, dtx = 0, 0
        if tj < 0:
            dty, tj = -1, 0xFFFF
        elif tj >= nr:
            dty, tj = 1, tj - nr  # always 0 for a 1-step D8 move
        if ti < 0:
            dtx, ti = -1, 0xFFFF
        elif ti >= nc:
            dtx, ti = 1, ti - nc
        emits.append((dtx, dty, int((tj << 16) | ti), float(acc[cell])))
    return acc, emits


_ACC_ROUND_SCHEMA = (
    "tile_x int, tile_y int, kind string, nrows int, ncols int, "
    "data array<double>, dst_tx int, dst_ty int, cell long, flow double"
)


def flow_accumulation(
    dir_tiles: DataFrame,
    T: int,
    spark: SparkSession,
    level: int = 0,
    wrap_nx: int | None = None,
    max_rounds: int = 64,
) -> DataFrame:
    """D8 flow accumulation over 'flowdir' tiles (tiles schema out,
    band 'flowacc'). Inter-tile fixpoint as described in the module
    docstring; ``max_rounds`` bounds the tile-graph chain length."""
    dirs = dir_tiles.select(
        "tile_x", "tile_y", "nrows", "ncols", "data"
    ).localCheckpoint(eager=True)

    empty_inflow = spark.createDataFrame(
        [], "tile_x int, tile_y int, cell long, flow double"
    )

    def solve_round(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tile = pdf[pdf.kind == "tile"]
        if len(tile) != 1:
            return pd.DataFrame(columns=[c.split()[0] for c in _ACC_ROUND_SCHEMA.split(", ")])
        row = tile.iloc[0]
        nr, nc = int(row.nrows), int(row.ncols)
        d = np.asarray(row.data, dtype=np.float64).reshape(nr, nc)
        inflow = np.zeros(nr * nc)
        infl = pdf[pdf.kind == "in"]
        if len(infl):
            # decode (tj<<16)|ti against THIS tile's dims (0xFFFF = last
            # row/col — the emitter cannot know a ragged neighbor's size)
            packed = infl.cell.to_numpy(dtype=np.int64)
            tj = packed >> 16
            ti = packed & 0xFFFF
            tj = np.where(tj == 0xFFFF, nr - 1, tj)
            ti = np.where(ti == 0xFFFF, nc - 1, ti)
            np.add.at(
                inflow,
                tj * nc + ti,
                infl.flow.to_numpy(dtype=np.float64),
            )
        acc, emits = _solve_tile(d, inflow.reshape(nr, nc))
        tx, ty = int(key[0]), int(key[1])
        rows = [{
            "tile_x": tx, "tile_y": ty, "kind": "acc",
            "nrows": nr, "ncols": nc,
            "data": np.where(np.isfinite(d.ravel()), acc, np.nan),
            "dst_tx": None, "dst_ty": None, "cell": None, "flow": None,
        }]
        for dtx, dty, cell, flow in emits:
            ntx = tx + dtx
            if wrap_nx is not None:
                ntx %= wrap_nx
            rows.append({
                "tile_x": tx, "tile_y": ty, "kind": "out",
                "nrows": None, "ncols": None, "data": None,
                "dst_tx": ntx, "dst_ty": ty + dty, "cell": cell, "flow": flow,
            })
        return pd.DataFrame(
            rows,
            columns=["tile_x", "tile_y", "kind", "nrows", "ncols", "data",
                     "dst_tx", "dst_ty", "cell", "flow"],
        )

    def run_round(inflows: DataFrame) -> DataFrame:
        tile_rows = dirs.select(
            "tile_x", "tile_y", F.lit("tile").alias("kind"),
            "nrows", "ncols", "data",
            F.lit(None).cast("int").alias("dst_tx"),
            F.lit(None).cast("int").alias("dst_ty"),
            F.lit(None).cast("long").alias("cell"),
            F.lit(None).cast("double").alias("flow"),
        )
        in_rows = inflows.select(
            "tile_x", "tile_y", F.lit("in").alias("kind"),
            F.lit(None).cast("int").alias("nrows"),
            F.lit(None).cast("int").alias("ncols"),
            F.lit(None).cast("array<double>").alias("data"),
            F.lit(None).cast("int").alias("dst_tx"),
            F.lit(None).cast("int").alias("dst_ty"),
            "cell", "flow",
        )
        return (
            tile_rows.unionByName(in_rows)
            .groupBy("tile_x", "tile_y")
            .applyInPandas(solve_round, _ACC_ROUND_SCHEMA)
            .localCheckpoint(eager=True)
        )

    inflows = empty_inflow
    prev_out = None
    result = None
    for _ in range(max_rounds):
        result = run_round(inflows)
        out = (
            result.filter(F.col("kind") == "out")
            .groupBy(
                F.col("dst_tx").alias("tile_x"),
                F.col("dst_ty").alias("tile_y"),
                "cell",
            )
            .agg(F.sum("flow").alias("flow"))
        )
        # fixpoint: the TOTAL contribution set stopped changing
        if prev_out is not None and out.exceptAll(prev_out).isEmpty():
            break
        prev_out = out.localCheckpoint(eager=True)
        # drop contributions addressed outside the raster's tile set
        inflows = prev_out.join(
            dirs.select("tile_x", "tile_y"), ["tile_x", "tile_y"], "left_semi"
        )
    else:
        raise RuntimeError(f"flow_accumulation did not converge in {max_rounds} rounds")

    return result.filter(F.col("kind") == "acc").select(
        "tile_x", "tile_y", F.lit(level).alias("level"),
        F.lit("flowacc").alias("band"), "nrows", "ncols", "data",
    )
