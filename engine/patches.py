"""Patch operators W11–W14: connected-components labeling across tile
boundaries + edge-corrected patch statistics (SURVEY.md §2.6).

Reference parity: ahhz/moving_window preprocesses a categorical raster
into a patch-attribute table (per-patch area/perimeter/class) consumed
by patch indicators whose edge correction weights each patch by the
fraction of it inside the window (the companion paper's contribution).
Pinned semantics (§5.3.5): rook connectivity, nodata breaks patches,
perimeter counts cell sides facing a different class / nodata / the
raster boundary.

Distributed W14 design:
1. per-tile two-pass CCL (NumPy union-find) with globally-unique
   provisional labels ``tile_seq * T*T + local``;
2. tiles exchange 1-deep halos so per-tile perimeter contributions are
   exact; each tile also emits its boundary label/class strips keyed by
   the shared border;
3. equivalence edges from border strips → union-find. Small edge sets
   resolve driver-side; past ``driver_edge_limit`` the engine switches
   to the distributed fixpoint (iterative min-label propagation via
   self-joins — O(log diameter) rounds);
4. patch table = per-root aggregation of per-tile partials.

Edge-corrected stats reduce to focal sums of per-cell planes (verified
against explicit patch enumeration in tests/test_patches.py):

  W11 mean patch size   Σ_p a_p·w_p / Σ_p w_p  =  count(valid) / sum(1/a_p)
  W12 patch density     Σ_p w_p / #valid        =  sum(1/a_p) / count(valid)
  W13 AWMSI             Σ_p (n_p/N)·SI_p        =  mean(SI plane)

where w_p = (cells of p in W)/a_p and the planes carry 1/a_{patch(c)}
and SI_{patch(c)} per cell c.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine import kernels, tiling

PATCH_ROWS_SCHEMA = (
    "label long, klass double, area long, perimeter long"
)


# ---------------------------------------------------------------------------
# per-tile CCL (pure NumPy, scipy-free two-pass union-find)
# ---------------------------------------------------------------------------

def label_tile(arr: np.ndarray) -> tuple[np.ndarray, int]:
    """Rook-connectivity CCL of equal-valued finite cells. Returns
    (labels int64 with -1 at nodata, n_labels); labels are 0..n-1."""
    H, W = arr.shape
    finite = np.isfinite(arr)
    labels = np.full((H, W), -1, dtype=np.int64)
    parent = np.arange(H * W, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    # union with left/up equal neighbors
    idx = np.arange(H * W).reshape(H, W)
    same_left = finite[:, 1:] & finite[:, :-1] & (arr[:, 1:] == arr[:, :-1])
    same_up = finite[1:, :] & finite[:-1, :] & (arr[1:, :] == arr[:-1, :])
    for a, b in zip(idx[:, 1:][same_left].ravel(), idx[:, :-1][same_left].ravel()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    for a, b in zip(idx[1:, :][same_up].ravel(), idx[:-1, :][same_up].ravel()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = np.array([find(i) for i in idx[finite].ravel()], dtype=np.int64)
    uniq, compact = np.unique(roots, return_inverse=True)
    labels[finite] = compact
    return labels, len(uniq)


def perimeter_contrib(padded: np.ndarray, g: int = 1) -> np.ndarray:
    """Per-cell count of sides facing a different class / nodata /
    out-of-raster, computed from a 1-deep padded plane (NaN outside)."""
    core = padded[g:-g, g:-g]
    finite = np.isfinite(core)
    out = np.zeros(core.shape, dtype=np.int64)
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        nb = padded[g + dy : g + dy + core.shape[0], g + dx : g + dx + core.shape[1]]
        differs = ~np.isfinite(nb) | (nb != core)
        out += np.where(finite & differs, 1, 0)
    out[~finite] = 0
    return out


# ---------------------------------------------------------------------------
# equivalence resolution: driver union-find or distributed fixpoint
# ---------------------------------------------------------------------------

def _driver_union_find(edges: pd.DataFrame, nodes: np.ndarray) -> pd.DataFrame:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(edges["a"].to_numpy(), edges["b"].to_numpy()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return pd.DataFrame(
        {"label": nodes, "root": [find(int(n)) for n in nodes]}
    )


def _distributed_min_label(
    spark: SparkSession, edges_df: DataFrame, nodes_df: DataFrame, max_rounds: int = 30
) -> DataFrame:
    """Iterative min-label propagation (the classic Spark connected-
    components fixpoint): labels converge to the component minimum in
    O(log diameter) rounds. edges: (a, b); nodes: (label)."""
    und = edges_df.union(edges_df.select(F.col("b").alias("a"), F.col("a").alias("b")))
    lab = nodes_df.select(F.col("label"), F.col("label").alias("root"))
    for _ in range(max_rounds):
        nb_min = (
            und.join(lab, und.a == lab.label)
            .groupBy(F.col("b").alias("label"))
            .agg(F.min("root").alias("nb_root"))
        )
        new = (
            lab.join(nb_min, "label", "left")
            .select(
                "label",
                F.least(F.col("root"), F.coalesce("nb_root", "root")).alias("root"),
            )
        )
        new = new.localCheckpoint()  # truncate lineage each round
        changed = (
            new.join(lab.withColumnRenamed("root", "old"), "label")
            .filter(F.col("root") != F.col("old"))
            .limit(1)
            .count()
        )
        lab = new
        if changed == 0:
            break
    return lab


# ---------------------------------------------------------------------------
# W14: the full distributed patch build
# ---------------------------------------------------------------------------

_LABEL_STAGE_SCHEMA = (
    "tile_x int, tile_y int, kind string, "
    "labels array<long>, klass array<double>, area array<long>, perim array<long>, "
    "strip_labels array<long>, strip_klass array<double>, border string"
)


def build_patches(
    tiles: DataFrame,
    T: int,
    spark: SparkSession,
    wrap_nx: int | None = None,
    driver_edge_limit: int = 2_000_000,
    force_distributed: bool = False,
):
    """tiles (band='class') → (label_tiles, patch_table).

    label_tiles: tiles schema, band='patch', data = global patch root id
    (float64-encoded; exact below 2^53) with NaN at nodata.
    patch_table: DataFrame (patch_id, klass, area, perimeter).
    """
    exchanged = tiling.halo_exchange(tiles, T, 1, wrap_nx)

    def stage1(key, pdf: pd.DataFrame):
        got = tiling.assemble_padded(pdf, T, 1)
        if got is None:
            return pd.DataFrame(
                columns=["tile_x", "tile_y", "kind", "labels", "klass",
                         "area", "perim", "strip_labels", "strip_klass", "border"]
            )
        bands, nr, nc = got
        (_, padded), = bands.items()
        core = padded[1 : 1 + nr, 1 : 1 + nc]
        tx, ty = int(key[0]), int(key[1])
        local, n = label_tile(core)
        # globally-unique provisional labels: tile linear index * T*T + local
        base = (np.int64(ty) * np.int64(1 << 20) + np.int64(tx)) * (T * T)
        glab = np.where(local >= 0, base + local, -1).astype(np.int64)
        perim = perimeter_contrib(padded, 1)
        rows = []
        # per-label partials
        finite = local >= 0
        if n:
            areas = np.bincount(local[finite], minlength=n)
            perims = np.bincount(local[finite], weights=perim[finite], minlength=n)
            klass = np.full(n, np.nan)
            klass[local[finite]] = core[finite]
            rows.append(
                {
                    "tile_x": tx, "tile_y": ty, "kind": "attrs",
                    "labels": (base + np.arange(n)).tolist(),
                    "klass": klass.tolist(),
                    "area": areas.astype(np.int64).tolist(),
                    "perim": perims.astype(np.int64).tolist(),
                    "strip_labels": None, "strip_klass": None, "border": None,
                }
            )
        # label plane
        rows.append(
            {
                "tile_x": tx, "tile_y": ty, "kind": "plane",
                "labels": glab.ravel().tolist(), "klass": None,
                "area": [nr, nc], "perim": None,
                "strip_labels": None, "strip_klass": None, "border": None,
            }
        )
        # border strips: right column → border v:(tx,ty); left column →
        # border v:(tx-1,ty); bottom row → h:(tx,ty); top row → h:(tx,ty-1)
        def strip(sl_lab, sl_k, border):
            rows.append(
                {
                    "tile_x": tx, "tile_y": ty, "kind": "strip",
                    "labels": None, "klass": None, "area": None, "perim": None,
                    "strip_labels": sl_lab.tolist(),
                    "strip_klass": sl_k.tolist(),
                    "border": border,
                }
            )

        left_tx = tx - 1
        if wrap_nx is not None:
            left_tx %= wrap_nx
        strip(glab[:, -1], core[:, -1], f"v:{tx}:{ty}")
        if left_tx >= 0:
            strip(glab[:, 0], core[:, 0], f"v:{left_tx}:{ty}")
        strip(glab[-1, :], core[-1, :], f"h:{tx}:{ty}")
        if ty - 1 >= 0:
            strip(glab[0, :], core[0, :], f"h:{tx}:{ty-1}")
        return pd.DataFrame(rows)

    stage1_df = exchanged.groupBy("dst_tx", "dst_ty").applyInPandas(
        stage1, _LABEL_STAGE_SCHEMA
    )
    stage1_df.persist()

    # equivalence edges: group the two strips of each border, pair up
    strips = stage1_df.filter(F.col("kind") == "strip")

    def border_edges(key, pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) != 2:
            return pd.DataFrame(columns=["a", "b"])
        # owner side first (the tile named in the border key)
        border = str(key[0])
        _, bx, by = border.split(":")
        own = pdf[(pdf.tile_x == int(bx)) & (pdf.tile_y == int(by))]
        other = pdf[~((pdf.tile_x == int(bx)) & (pdf.tile_y == int(by)))]
        if len(own) != 1 or len(other) != 1:
            return pd.DataFrame(columns=["a", "b"])
        la = np.asarray(own.iloc[0].strip_labels, dtype=np.int64)
        ka = np.asarray(own.iloc[0].strip_klass, dtype=np.float64)
        lb = np.asarray(other.iloc[0].strip_labels, dtype=np.int64)
        kb = np.asarray(other.iloc[0].strip_klass, dtype=np.float64)
        m = min(len(la), len(lb))
        la, ka, lb, kb = la[:m], ka[:m], lb[:m], kb[:m]
        ok = (la >= 0) & (lb >= 0) & np.isfinite(ka) & np.isfinite(kb) & (ka == kb)
        e = pd.DataFrame({"a": la[ok], "b": lb[ok]}).drop_duplicates()
        return e

    edges_df = strips.groupBy("border").applyInPandas(border_edges, "a long, b long")
    attrs = stage1_df.filter(F.col("kind") == "attrs").select(
        F.explode(F.arrays_zip("labels", "klass", "area", "perim")).alias("z")
    ).select(
        F.col("z.labels").alias("label"),
        F.col("z.klass").alias("klass"),
        F.col("z.area").alias("area"),
        F.col("z.perim").alias("perimeter"),
    )

    n_edges = edges_df.count()
    if force_distributed or n_edges > driver_edge_limit:
        nodes = attrs.select("label").distinct()
        mapping = _distributed_min_label(spark, edges_df, nodes)
    else:
        edges_pd = edges_df.toPandas()
        nodes = attrs.select("label").distinct().toPandas()["label"].to_numpy()
        mapping = spark.createDataFrame(
            _driver_union_find(edges_pd, nodes), "label long, root long"
        )

    patch_table = (
        attrs.join(mapping, "label")
        .groupBy(F.col("root").alias("patch_id"))
        .agg(
            F.first("klass").alias("klass"),
            F.sum("area").alias("area"),
            F.sum("perimeter").alias("perimeter"),
        )
    )

    planes = stage1_df.filter(F.col("kind") == "plane")
    mapping_pd = mapping.toPandas()
    root_of = dict(zip(mapping_pd.label, mapping_pd.root))
    b_root = spark.sparkContext.broadcast(root_of)

    def relabel(pdf_iter):
        for pdf in pdf_iter:
            out = []
            ro = b_root.value
            for row in pdf.itertuples(index=False):
                nr, nc = int(row.area[0]), int(row.area[1])
                lab = np.asarray(row.labels, dtype=np.int64)
                mapped = np.array(
                    [ro.get(int(x), x) if x >= 0 else -1 for x in lab],
                    dtype=np.int64,
                )
                data = np.where(mapped >= 0, mapped.astype(np.float64), np.nan)
                out.append(
                    {
                        "tile_x": row.tile_x, "tile_y": row.tile_y,
                        "level": 0, "band": "patch",
                        "nrows": nr, "ncols": nc, "data": data,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["tile_x", "tile_y", "level", "band", "nrows", "ncols", "data"],
            )

    label_tiles = planes.mapInPandas(relabel, tiling.TILES_SCHEMA)
    return label_tiles, patch_table


# ---------------------------------------------------------------------------
# W11–W13: edge-corrected focal patch statistics
# ---------------------------------------------------------------------------

def _mps_kernel(plane: np.ndarray, r: int, shape: str) -> np.ndarray:
    """W11 on the inv-area plane: count(valid)/sum(1/a)."""
    c = kernels.focal_count(plane, r, shape)
    s = kernels.focal_sum(plane, r, shape)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = c / s
    out[(c == 0) | (s <= 0)] = np.nan
    return out


def _pdens_kernel(plane: np.ndarray, r: int, shape: str) -> np.ndarray:
    """W12 on the inv-area plane: sum(1/a)/count(valid) — fractional
    patch count per valid cell."""
    c = kernels.focal_count(plane, r, shape)
    s = kernels.focal_sum(plane, r, shape)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = s / c
    out[c == 0] = np.nan
    return out


PATCH_STAT_KERNELS = {
    "mean_patch_size": ("inv_area", _mps_kernel),
    "patch_density": ("inv_area", _pdens_kernel),
    "awmsi": ("si", kernels.focal_mean),  # Σ (n_p/N)·SI_p == mean of SI plane
}


def derive_patch_planes(
    label_tiles: DataFrame, patch_table: DataFrame, spark: SparkSession
) -> DataFrame:
    """label tiles + patch table → per-cell derived bands 'inv_area'
    (1/patch area) and 'si' (0.25·perimeter/√area of the cell's patch).
    Patch table is broadcast (scale path: replace with an equi-join of
    exploded plane pixels on patch_id — same result, one shuffle)."""
    pt = patch_table.toPandas()
    inv_area = dict(zip(pt.patch_id, 1.0 / pt.area))
    si = dict(zip(pt.patch_id, 0.25 * pt.perimeter / np.sqrt(pt.area)))
    b = spark.sparkContext.broadcast((inv_area, si))

    def derive(pdf_iter):
        for pdf in pdf_iter:
            inv_a, si_m = b.value
            out = []
            for row in pdf.itertuples(index=False):
                lab = np.asarray(row.data, dtype=np.float64)
                finite = np.isfinite(lab)
                ids = lab[finite].astype(np.int64)
                ia = np.full(lab.shape, np.nan)
                sv = np.full(lab.shape, np.nan)
                ia[finite] = [inv_a[int(x)] for x in ids]
                sv[finite] = [si_m[int(x)] for x in ids]
                for band, data in (("inv_area", ia), ("si", sv)):
                    out.append(
                        {
                            "tile_x": row.tile_x, "tile_y": row.tile_y,
                            "level": row.level, "band": band,
                            "nrows": row.nrows, "ncols": row.ncols,
                            "data": data,
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=["tile_x", "tile_y", "level", "band", "nrows", "ncols", "data"],
            )

    return label_tiles.mapInPandas(derive, tiling.TILES_SCHEMA)


def apply_patch_stats(
    class_tiles: DataFrame,
    T: int,
    r: int,
    shape: str,
    spark: SparkSession,
    stats: list[str] | None = None,
    wrap_nx: int | None = None,
    force_distributed: bool = False,
) -> DataFrame:
    """Full W11–W13 pipeline: W14 build → derived planes → focal."""
    stats = stats or list(PATCH_STAT_KERNELS)
    label_tiles, patch_table = build_patches(
        class_tiles, T, spark, wrap_nx, force_distributed=force_distributed
    )
    planes = derive_patch_planes(label_tiles, patch_table, spark)
    by_band: dict[str, dict] = {}
    for s in stats:
        band, fn = PATCH_STAT_KERNELS[s]
        by_band.setdefault(band, {})[s] = fn
    outs = [
        tiling.apply_focal(
            planes.filter(F.col("band") == band), r, shape, fns, T,
            level=0, wrap_nx=wrap_nx,
        )
        for band, fns in by_band.items()  # one halo exchange per band
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out
