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

__all__ = [
    "D8_OFFSETS",
    "flow_accumulation",
    "flow_direction",
    "flow_direction_kernel",
    "watershed",
]

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


def _receivers(dirs: np.ndarray):
    """(recv linear index or -1, exits-the-tile mask, jj, ii) for a
    tile of D8 codes."""
    nr, nc = dirs.shape
    n = nr * nc
    d = dirs.ravel()
    valid = np.isfinite(d)
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
    return recv, out_mask, jj, ii


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

    recv, out_mask, jj, ii = _receivers(dirs)

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


# ---------------------------------------------------------------------------
# Watershed delineation (basin labeling)
# ---------------------------------------------------------------------------

_WS_STAGE1_SCHEMA = (
    "tile_x int, tile_y int, kind string, nrows int, ncols int, "
    "plane binary, cellkey long, okey long, val long"
)


def watershed(
    dir_tiles: DataFrame,
    T: int,
    spark: SparkSession,
    level: int = 0,
    wrap_nx: int | None = None,
    max_rounds: int = 64,
) -> DataFrame:
    """Basin labeling: every valid cell gets the id of the PIT its D8
    path terminates at (pit id = the pit cell's global index
    ``(gy<<32)|gx`` — deterministic and SQL-replicable; flow never
    leaves the raster, so every path ends at an in-raster pit).

    Scale design — the planes are touched exactly TWICE and never
    re-shipped per round:
    1. ONE applyInPandas over the direction tiles: in-tile pointer
       jumping (``t = t[t]``, O(log path) vectorized gathers) resolves
       each cell to its in-tile terminal — a pit (resolved gid) or a
       border-exit cell (pending). Emits the packed int64 terminal
       plane (pending encoded as ``-(okey+1)``), one LINK row per exit
       cell (okey → destination tile/cell), and this tile's EDGE-cell
       classifications (incl. last-row/col sentinel aliases, so a
       ragged neighbor's link can join them without knowing our dims).
    2. links ⋈ edges gives the chain table okey → (gid | next okey);
       pointer-jump the CHAIN TABLE (rows ∝ border-exit cells, not
       cells) with one self-join per round, O(log chain) rounds,
       localCheckpoint-bounded lineage.
    3. ONE paint join maps each tile's pending okeys to final gids
       (searchsorted remap next to the payload — the patches-relabel
       pattern).

    Precision note: output planes are float64 TILES_SCHEMA, exact while
    gid < 2^53 (raster height < 2^21 rows); the internal pipeline is
    int64 throughout.
    """
    dirs = dir_tiles.select(
        "tile_x", "tile_y", "nrows", "ncols", "data"
    ).localCheckpoint(eager=True)

    def stage1(key, pdf: pd.DataFrame) -> pd.DataFrame:
        row = pdf.iloc[0]
        nr, nc = int(row.nrows), int(row.ncols)
        d = np.asarray(row.data, dtype=np.float64).reshape(nr, nc)
        tx, ty = int(key[0]), int(key[1])
        recv, out_mask, jj, ii = _receivers(d)
        n = nr * nc
        valid = np.isfinite(d.ravel())
        # pointer jumping to the in-tile terminal (recv<0 cells fix themselves)
        t = np.where(recv >= 0, recv, np.arange(n))
        while True:
            t2 = t[t]
            if np.array_equal(t2, t):
                break
            t = t2
        gy = np.int64(ty) * T + jj
        gx = np.int64(tx) * T + ii
        gid = (gy.astype(np.int64) << 32) | gx.astype(np.int64)
        term = t  # terminal cell index per cell
        term_is_exit = out_mask[term]
        # plane value: pit gid, or -(okey+1) with okey = exit cell's gid
        plane = np.where(term_is_exit, -(gid[term] + 1), gid[term])
        plane = np.where(valid, plane, np.int64(-(2**62)))  # invalid marker
        rows = [{
            "tile_x": tx, "tile_y": ty, "kind": "plane",
            "nrows": nr, "ncols": nc,
            "plane": plane.astype("<i8").tobytes(),
            "cellkey": None, "okey": None, "val": None,
        }]
        # links: one row per exit cell
        for cell in np.flatnonzero(out_mask):
            dj, di = _CODE2OFF[int(d.ravel()[cell])]
            tj, ti = jj[cell] + dj, ii[cell] + di
            dty, dtx = 0, 0
            if tj < 0:
                dty, tj = -1, 0xFFFF
            elif tj >= nr:
                dty, tj = 1, tj - nr
            if ti < 0:
                dtx, ti = -1, 0xFFFF
            elif ti >= nc:
                dtx, ti = 1, ti - nc
            ntx = tx + dtx
            if wrap_nx is not None:
                ntx %= wrap_nx
            rows.append({
                "tile_x": ntx, "tile_y": ty + dty, "kind": "link",
                "nrows": None, "ncols": None, "plane": None,
                "cellkey": int((int(tj) << 16) | int(ti)),
                "okey": int(gid[cell]), "val": None,
            })
        # edge classifications (with sentinel aliases for last row/col)
        edge_cells = np.flatnonzero(
            valid
            & ((jj == 0) | (jj == nr - 1) | (ii == 0) | (ii == nc - 1))
        )
        for cell in edge_cells:
            v = int(gid[term[cell]]) if not term_is_exit[cell] else -(int(gid[term[cell]]) + 1)
            lj, li = int(jj[cell]), int(ii[cell])
            jkeys = {lj} | ({0xFFFF} if lj == nr - 1 else set())
            ikeys = {li} | ({0xFFFF} if li == nc - 1 else set())
            for kj in jkeys:
                for ki in ikeys:
                    rows.append({
                        "tile_x": tx, "tile_y": ty, "kind": "edge",
                        "nrows": None, "ncols": None, "plane": None,
                        "cellkey": int((kj << 16) | ki),
                        "okey": None, "val": v,
                    })
        return pd.DataFrame(
            rows,
            columns=["tile_x", "tile_y", "kind", "nrows", "ncols",
                     "plane", "cellkey", "okey", "val"],
        )

    s1 = (
        dirs.groupBy("tile_x", "tile_y")
        .applyInPandas(stage1, _WS_STAGE1_SCHEMA)
        .localCheckpoint(eager=True)
    )
    links = s1.filter(F.col("kind") == "link").select(
        "tile_x", "tile_y", "cellkey", "okey"
    )
    edges = s1.filter(F.col("kind") == "edge").select(
        "tile_x", "tile_y", "cellkey", "val"
    )
    # chain table: okey -> val (>=0 final gid; <0 pending on -(val+1))
    chain = links.join(edges, ["tile_x", "tile_y", "cellkey"]).select(
        "okey", "val"
    ).localCheckpoint(eager=True)

    # pointer-jump the chain: follow pending rows one hop per round
    # (each hop doubles resolved prefixes — O(log chain) rounds)
    for _ in range(max_rounds):
        pending = chain.filter(F.col("val") < 0)
        if pending.isEmpty():
            break
        nxt = chain.select(
            F.col("okey").alias("nokey"), F.col("val").alias("nval")
        )
        chain = (
            chain.withColumn(
                "ptr", F.when(F.col("val") < 0, -(F.col("val") + 1))
            )
            .join(nxt, F.col("ptr") == F.col("nokey"), "left")
            .select(
                "okey",
                F.when(F.col("val") >= 0, F.col("val"))
                .otherwise(F.coalesce("nval", "val"))
                .alias("val"),
            )
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(f"watershed chain did not resolve in {max_rounds} rounds")

    # paint: per-tile pending okeys -> final gid, remapped next to the payload
    tile_map = (
        links.select(
            F.col("okey").alias("src_okey")
        )
        .join(chain, F.col("src_okey") == F.col("okey"))
        .select("okey", "val")
    )
    # okey encodes the source cell's global coords -> source tile
    src = tile_map.select(
        (F.shiftrightunsigned("okey", 32) / T).cast("int").alias("tile_y"),
        (F.col("okey").bitwiseAND(F.lit(0xFFFFFFFF)) / T).cast("int").alias("tile_x"),
        "okey", "val",
    ).groupBy("tile_x", "tile_y").agg(
        F.collect_list(F.struct("okey", "val")).alias("m")
    )

    planes = s1.filter(F.col("kind") == "plane").select(
        "tile_x", "tile_y", "nrows", "ncols", "plane"
    ).join(src, ["tile_x", "tile_y"], "left")

    def paint(pdf_iter):
        for pdf in pdf_iter:
            out = []
            for row in pdf.itertuples(index=False):
                nr, nc = int(row.nrows), int(row.ncols)
                plane = np.frombuffer(row.plane, dtype="<i8")
                data = np.full(len(plane), np.nan)
                resolved = plane >= 0
                data[resolved] = plane[resolved].astype(np.float64)
                pend = (plane < 0) & (plane != -(2**62))
                if pend.any():
                    m = row.m if row.m is not None else []
                    pairs = [
                        (e["okey"], e["val"]) if isinstance(e, dict) else (e[0], e[1])
                        for e in m
                    ]
                    m_ok = np.array([p[0] for p in pairs], dtype=np.int64)
                    m_v = np.array([p[1] for p in pairs], dtype=np.int64)
                    order = np.argsort(m_ok)
                    m_ok, m_v = m_ok[order], m_v[order]
                    want = -(plane[pend] + 1)
                    pos = np.searchsorted(m_ok, want)
                    data[pend] = m_v[np.clip(pos, 0, max(len(m_ok) - 1, 0))].astype(
                        np.float64
                    )
                out.append({
                    "tile_x": row.tile_x, "tile_y": row.tile_y,
                    "level": level, "band": "watershed",
                    "nrows": nr, "ncols": nc, "data": data,
                })
            yield pd.DataFrame(
                out,
                columns=["tile_x", "tile_y", "level", "band",
                         "nrows", "ncols", "data"],
            )

    return planes.mapInPandas(paint, tiling.TILES_SCHEMA)
