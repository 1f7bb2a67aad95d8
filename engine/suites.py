"""Driver-window consolidation suites (round 5).

The driver's correctness gate checks the FIRST 50 ``queries()``
entries; the round-4 registry had grown to 69, leaving 19 spatial
queries without a driver CORRECTNESS row (the exact defect round 3
fixed once before — VERDICT r4 §"What's wrong" №1). This module merges
family-aligned queries into union suites so the whole surface fits in
the window with headroom, WITHOUT touching the proven single-query
implementations or their oracles: each suite reshapes the existing
DataFrames to a shared long schema and UNION ALLs the existing oracle
SQL strings reshaped the same way. Every value of every sub-query
still reaches the driver's order-insensitive value hash — nothing is
summarized away; reshapes are injective (literal part tags + lossless
casts).

Column-name contract: the driver sorts columns by name before hashing,
so Spark/oracle column names match exactly by construction (the SQL
aliases mirror the DataFrame aliases).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Query = Callable[[SparkSession, str], DataFrame]



def _ship(spark: SparkSession) -> None:
    """Workers need the engine package for pandas-UDF stages — a suite
    may be the FIRST query a fresh external session runs, so it cannot
    rely on an earlier single query having shipped it."""
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)


def _wrap_sql(inner: str, projection: str) -> str:
    """Reshape one existing oracle to the suite schema. DuckDB accepts
    WITH-bearing statements as parenthesized subqueries."""
    return f"SELECT {projection} FROM ({inner})\n"


def _union_sql(parts: list[str]) -> str:
    return "\nUNION ALL\n".join(parts)


# ---------------------------------------------------------------------------
# raster suite: tile-format queries (tile_x, tile_y, band, n_valid, tile_sum)
# ---------------------------------------------------------------------------


def _build_raster_suite() -> tuple[Query, str]:
    """sq_raster_suite = openness + flowlen + upsample/warp + reclass/
    algebra + pyramid. All five already emit the quantized tile long
    format; band tags are prefixed per family (pyramid folds its level
    into the band tag) so identical tile keys from different families
    stay distinct rows."""
    from engine.spatial_queries import SPATIAL_QUERIES as SPATIAL_SINGLES

    tagged = [
        ("opn", "sq_openness"),
        ("flen", "sq_flowlen"),
        ("ups", "sq_upsample"),
        ("rca", "sq_reclass_algebra"),
    ]

    def run(spark: SparkSession, sf: str) -> DataFrame:
        _ship(spark)
        out = None
        for tag, name in tagged:
            fn, _ = SPATIAL_SINGLES[name]
            df = fn(spark, sf).select(
                "tile_x", "tile_y",
                F.concat(F.lit(f"{tag}:"), F.col("band")).alias("band"),
                "n_valid", "tile_sum",
            )
            out = df if out is None else out.unionByName(df)
        fn, _ = SPATIAL_SINGLES["sq_pyramid"]
        pyr = fn(spark, sf).select(
            "tile_x", "tile_y",
            F.concat(
                F.lit("pyr"), F.col("level").cast("string"),
                F.lit(":"), F.col("band"),
            ).alias("band"),
            "n_valid", "tile_sum",
        )
        return out.unionByName(pyr)

    parts = [
        _wrap_sql(
            SPATIAL_SINGLES[name][1],
            f"tile_x, tile_y, '{tag}:' || band AS band, n_valid, tile_sum",
        )
        for tag, name in tagged
    ]
    parts.append(
        _wrap_sql(
            SPATIAL_SINGLES["sq_pyramid"][1],
            "tile_x, tile_y, 'pyr' || CAST(level AS VARCHAR) || ':' || band"
            " AS band, n_valid, tile_sum",
        )
    )
    return run, _union_sql(parts)


# ---------------------------------------------------------------------------
# global stats suite: (metric, key, n, v) long format
# ---------------------------------------------------------------------------


def _build_global_stats() -> tuple[Query, str]:
    """sq_global_stats = global summary/histogram/quantiles (already
    long format) + Moran/Geary/Getis (one row → three metric rows) +
    C8 compact-cells (per-level count + morton checksum)."""
    from engine.spatial_queries import SPATIAL_QUERIES as SPATIAL_SINGLES

    def run(spark: SparkSession, sf: str) -> DataFrame:
        _ship(spark)
        gs = SPATIAL_SINGLES["sq_global_summary"][0](spark, sf).select(
            F.concat(F.lit("g:"), F.col("metric")).alias("metric"),
            "key", "n", "v",
        )
        mor = SPATIAL_SINGLES["sq_moran"][0](spark, sf).selectExpr(
            "stack(3,"
            " 'moran_i', CAST(0 AS BIGINT), n_cells, moran_i,"
            " 'geary_c', CAST(0 AS BIGINT), n_cells, geary_c,"
            " 'getis_g', CAST(0 AS BIGINT), w_pairs, getis_g"
            ") AS (metric, key, n, v)"
        )
        cc = SPATIAL_SINGLES["sq_compact_cells"][0](spark, sf).select(
            F.lit("compact").alias("metric"),
            F.col("level").cast("long").alias("key"),
            F.col("n_cells").alias("n"),
            F.col("morton_sum").cast("double").alias("v"),
        )
        return gs.unionByName(mor).unionByName(cc)

    # ONE scan of the (heavy) autocorrelation oracle unpivoted to the
    # three metric rows — three _wrap_sql copies re-executed the whole
    # WITH-bearing query per metric on every correctness pass
    moran_part = (
        "SELECT m.metric, CAST(0 AS BIGINT) AS key,\n"
        "       CASE m.metric WHEN 'getis_g' THEN t.w_pairs"
        " ELSE t.n_cells END AS n,\n"
        "       CASE m.metric WHEN 'moran_i' THEN t.moran_i"
        " WHEN 'geary_c' THEN t.geary_c ELSE t.getis_g END AS v\n"
        f"FROM ({SPATIAL_SINGLES['sq_moran'][1]}) t\n"
        "CROSS JOIN (VALUES ('moran_i'), ('geary_c'), ('getis_g'))"
        " m(metric)\n"
    )
    parts = [
        _wrap_sql(
            SPATIAL_SINGLES["sq_global_summary"][1],
            "'g:' || metric AS metric, key, n, v",
        ),
        moran_part,
        _wrap_sql(
            SPATIAL_SINGLES["sq_compact_cells"][1],
            "'compact' AS metric, CAST(level AS BIGINT) AS key,"
            " n_cells AS n, CAST(morton_sum AS DOUBLE) AS v",
        ),
    ]
    return run, _union_sql(parts)


# ---------------------------------------------------------------------------
# per-tile cell statistics suite: hotspot + trend
# ---------------------------------------------------------------------------


def _build_cellstats() -> tuple[Query, str]:
    """sq_cellstats = Gi* hotspot tiles + per-cell temporal trend tiles
    in one (part, tile_x, tile_y, n_a, n_b, n_c, v) frame."""
    from engine.spatial_queries import SPATIAL_QUERIES as SPATIAL_SINGLES

    def run(spark: SparkSession, sf: str) -> DataFrame:
        _ship(spark)
        hot = SPATIAL_SINGLES["sq_hotspot"][0](spark, sf).select(
            F.lit("hotspot").alias("part"), "tile_x", "tile_y",
            F.col("n_valid").alias("n_a"),
            F.col("n_hot").alias("n_b"),
            F.col("n_cold").alias("n_c"),
            F.col("z_sum").alias("v"),
        )
        tr = SPATIAL_SINGLES["sq_trend"][0](spark, sf).select(
            F.lit("trend").alias("part"), "tile_x", "tile_y",
            F.col("n_cells").alias("n_a"),
            F.col("n_events").alias("n_b"),
            F.lit(0).cast("long").alias("n_c"),
            F.col("slope_sum").alias("v"),
        )
        return hot.unionByName(tr)

    parts = [
        _wrap_sql(
            SPATIAL_SINGLES["sq_hotspot"][1],
            "'hotspot' AS part, tile_x, tile_y, n_valid AS n_a,"
            " n_hot AS n_b, n_cold AS n_c, z_sum AS v",
        ),
        _wrap_sql(
            SPATIAL_SINGLES["sq_trend"][1],
            "'trend' AS part, tile_x, tile_y, n_cells AS n_a,"
            " n_events AS n_b, CAST(0 AS BIGINT) AS n_c, slope_sum AS v",
        ),
    ]
    return run, _union_sql(parts)


# ---------------------------------------------------------------------------
# zonal order suite: categorical + geometry + percentiles
# ---------------------------------------------------------------------------


def _build_zonal_order() -> tuple[Query, str]:
    """sq_zonal_order = zonal majority/minority/variety + zone
    area/perimeter/compactness + exact zonal percentiles, one
    (part, zone, a, b, c, v) frame. Percentile q rides as exact
    per-myriad (ROUND(q·10000)) so no float key reaches the hash."""
    from engine.spatial_queries import SPATIAL_QUERIES as SPATIAL_SINGLES

    def run(spark: SparkSession, sf: str) -> DataFrame:
        _ship(spark)
        cat = SPATIAL_SINGLES["sq_zonal_cat"][0](spark, sf).select(
            F.lit("cat").alias("part"), "zone",
            F.col("n_cells").alias("a"),
            F.col("majority").alias("b"),
            F.col("minority").alias("c"),
            F.col("variety").cast("double").alias("v"),
        )
        geo = SPATIAL_SINGLES["sq_zonal_geom"][0](spark, sf).select(
            F.lit("geom").alias("part"), "zone",
            F.col("area_cells").alias("a"),
            F.col("perimeter").alias("b"),
            F.lit(0).cast("long").alias("c"),
            F.col("compactness").alias("v"),
        )
        pct = SPATIAL_SINGLES["sq_zonal_pct"][0](spark, sf).select(
            F.lit("pct").alias("part"), "zone",
            F.round(F.col("q") * 10000).cast("long").alias("a"),
            F.col("pct_value").alias("b"),
            F.lit(0).cast("long").alias("c"),
            F.lit(0.0).alias("v"),
        )
        return cat.unionByName(geo).unionByName(pct)

    parts = [
        _wrap_sql(
            SPATIAL_SINGLES["sq_zonal_cat"][1],
            "'cat' AS part, zone, n_cells AS a, majority AS b,"
            " minority AS c, CAST(variety AS DOUBLE) AS v",
        ),
        _wrap_sql(
            SPATIAL_SINGLES["sq_zonal_geom"][1],
            "'geom' AS part, zone, area_cells AS a, perimeter AS b,"
            " CAST(0 AS BIGINT) AS c, compactness AS v",
        ),
        _wrap_sql(
            SPATIAL_SINGLES["sq_zonal_pct"][1],
            "'pct' AS part, zone, CAST(ROUND(q * 10000) AS BIGINT) AS a,"
            " pct_value AS b, CAST(0 AS BIGINT) AS c,"
            " CAST(0.0 AS DOUBLE) AS v",
        ),
    ]
    return run, _union_sql(parts)


# ---------------------------------------------------------------------------
# vector suite: contour + overlay + hull + vector measures
# ---------------------------------------------------------------------------


def _build_vector_suite() -> tuple[Query, str]:
    """sq_vector_suite = marching-squares contours + polygon×polygon
    overlay + distributed convex hull + line-rasterize/polygon-measure
    ops, one (part, k1, k2, n, v1..v4) frame."""
    from engine.spatial_queries import SPATIAL_QUERIES as SPATIAL_SINGLES

    def run(spark: SparkSession, sf: str) -> DataFrame:
        _ship(spark)
        z = F.lit(0.0)
        con = SPATIAL_SINGLES["sq_contour"][0](spark, sf).select(
            F.lit("contour").alias("part"),
            F.col("tile_x").cast("long").alias("k1"),
            F.col("tile_y").cast("long").alias("k2"),
            F.col("n_segs").alias("n"),
            F.col("len_q").alias("v1"),
            F.col("vsum_q").cast("double").alias("v2"),
            z.alias("v3"), z.alias("v4"),
        )
        ovl = SPATIAL_SINGLES["sq_overlay"][0](spark, sf).select(
            F.lit("overlay").alias("part"),
            F.col("a_id").alias("k1"), F.col("b_id").alias("k2"),
            F.col("n_pts").alias("n"),
            F.col("area_q").alias("v1"),
            F.col("vsum_q").cast("double").alias("v2"),
            z.alias("v3"), z.alias("v4"),
        )
        hull = SPATIAL_SINGLES["sq_hull"][0](spark, sf).select(
            F.concat(F.lit("hull:"), F.col("g")).alias("part"),
            F.lit(0).cast("long").alias("k1"),
            F.lit(0).cast("long").alias("k2"),
            F.col("n_hull").alias("n"),
            F.col("qx_sum").cast("double").alias("v1"),
            F.col("qy_sum").cast("double").alias("v2"),
            z.alias("v3"), z.alias("v4"),
        )
        vec = SPATIAL_SINGLES["sq_vector_ops"][0](spark, sf).select(
            F.concat(F.lit("vec:"), F.col("kind")).alias("part"),
            F.col("gid").alias("k1"),
            F.lit(0).cast("long").alias("k2"),
            F.col("n"),
            F.col("m1").alias("v1"), F.col("m2").alias("v2"),
            F.col("m3").alias("v3"), F.col("m4").alias("v4"),
        )
        return con.unionByName(ovl).unionByName(hull).unionByName(vec)

    parts = [
        _wrap_sql(
            SPATIAL_SINGLES["sq_contour"][1],
            "'contour' AS part, CAST(tile_x AS BIGINT) AS k1,"
            " CAST(tile_y AS BIGINT) AS k2, n_segs AS n, len_q AS v1,"
            " CAST(vsum_q AS DOUBLE) AS v2, CAST(0.0 AS DOUBLE) AS v3,"
            " CAST(0.0 AS DOUBLE) AS v4",
        ),
        _wrap_sql(
            SPATIAL_SINGLES["sq_overlay"][1],
            "'overlay' AS part, a_id AS k1, b_id AS k2, n_pts AS n,"
            " area_q AS v1, CAST(vsum_q AS DOUBLE) AS v2,"
            " CAST(0.0 AS DOUBLE) AS v3, CAST(0.0 AS DOUBLE) AS v4",
        ),
        _wrap_sql(
            SPATIAL_SINGLES["sq_hull"][1],
            "'hull:' || g AS part, CAST(0 AS BIGINT) AS k1,"
            " CAST(0 AS BIGINT) AS k2, n_hull AS n,"
            " CAST(qx_sum AS DOUBLE) AS v1, CAST(qy_sum AS DOUBLE) AS v2,"
            " CAST(0.0 AS DOUBLE) AS v3, CAST(0.0 AS DOUBLE) AS v4",
        ),
        _wrap_sql(
            SPATIAL_SINGLES["sq_vector_ops"][1],
            "'vec:' || kind AS part, gid AS k1, CAST(0 AS BIGINT) AS k2,"
            " n, m1 AS v1, m2 AS v2, m3 AS v3, m4 AS v4",
        ),
    ]
    return run, _union_sql(parts)


# ---------------------------------------------------------------------------
# surface points suite: cost path + IDW + point sampling
# ---------------------------------------------------------------------------


def _build_surface_points() -> tuple[Query, str]:
    """sq_surface_points = least-cost-path backtrack + IDW surface +
    nearest/bilinear point sampling, one (part, k1, k2, n, v1..v3)
    frame."""
    from engine.spatial_queries import SPATIAL_QUERIES as SPATIAL_SINGLES

    def run(spark: SparkSession, sf: str) -> DataFrame:
        _ship(spark)
        z = F.lit(0.0)
        cp = SPATIAL_SINGLES["sq_cost_path"][0](spark, sf).select(
            F.lit("costpath").alias("part"),
            F.col("dest_i").alias("k1"), F.col("dest_j").alias("k2"),
            F.col("n_steps").alias("n"),
            F.col("total_cost").alias("v1"),
            F.col("sum_i").cast("double").alias("v2"),
            F.col("sum_j").cast("double").alias("v3"),
        )
        idw = SPATIAL_SINGLES["sq_idw"][0](spark, sf).select(
            F.lit("idw").alias("part"),
            F.col("tile_x").cast("long").alias("k1"),
            F.col("tile_y").cast("long").alias("k2"),
            F.col("n_cells").alias("n"),
            F.col("v_sum").alias("v1"), z.alias("v2"), z.alias("v3"),
        )
        sp = SPATIAL_SINGLES["sq_sample_points"][0](spark, sf).select(
            F.concat(F.lit("sample:"), F.col("method")).alias("part"),
            F.col("bx").cast("long").alias("k1"),
            F.col("by").cast("long").alias("k2"),
            F.col("n_pts").alias("n"),
            F.col("v_sum").alias("v1"), z.alias("v2"), z.alias("v3"),
        )
        return cp.unionByName(idw).unionByName(sp)

    parts = [
        _wrap_sql(
            SPATIAL_SINGLES["sq_cost_path"][1],
            "'costpath' AS part, dest_i AS k1, dest_j AS k2,"
            " n_steps AS n, total_cost AS v1,"
            " CAST(sum_i AS DOUBLE) AS v2, CAST(sum_j AS DOUBLE) AS v3",
        ),
        _wrap_sql(
            SPATIAL_SINGLES["sq_idw"][1],
            "'idw' AS part, CAST(tile_x AS BIGINT) AS k1,"
            " CAST(tile_y AS BIGINT) AS k2, n_cells AS n, v_sum AS v1,"
            " CAST(0.0 AS DOUBLE) AS v2, CAST(0.0 AS DOUBLE) AS v3",
        ),
        _wrap_sql(
            SPATIAL_SINGLES["sq_sample_points"][1],
            "'sample:' || method AS part, CAST(bx AS BIGINT) AS k1,"
            " CAST(by AS BIGINT) AS k2, n_pts AS n, v_sum AS v1,"
            " CAST(0.0 AS DOUBLE) AS v2, CAST(0.0 AS DOUBLE) AS v3",
        ),
    ]
    return run, _union_sql(parts)


# ---------------------------------------------------------------------------
# grid suite: cell-encode histogram + bbox + range pruning
# ---------------------------------------------------------------------------


def _build_grid_suite() -> tuple[Query, str]:
    """q_grid_suite = cell-encode histogram + bbox predicate filter +
    cell-range pruning scan, one (part, i, j, n_docs, id_sum) frame.
    The q30 pruning PLAN is still pinned by its own plan-shape test."""
    from engine.queries import SQL_QUERIES

    def run(spark: SparkSession, sf: str) -> DataFrame:
        _ship(spark)
        zl = F.lit(0).cast("long")
        enc = SQL_QUERIES["q09_cell_encode_histogram"][0](spark, sf).select(
            F.lit("encode").alias("part"), "i", "j", "n_docs",
            zl.alias("id_sum"),
        )
        bbx = SQL_QUERIES["q10_bbox_filter"][0](spark, sf).select(
            F.lit("bbox").alias("part"), "i", "j", "n_docs",
            zl.alias("id_sum"),
        )
        prn = SQL_QUERIES["q30_cell_range_pruning"][0](spark, sf).select(
            F.lit("prune").alias("part"), "i", "j", "n_docs", "id_sum",
        )
        return enc.unionByName(bbx).unionByName(prn)

    parts = [
        _wrap_sql(
            SQL_QUERIES["q09_cell_encode_histogram"][1],
            "'encode' AS part, i, j, n_docs, CAST(0 AS BIGINT) AS id_sum",
        ),
        _wrap_sql(
            SQL_QUERIES["q10_bbox_filter"][1],
            "'bbox' AS part, i, j, n_docs, CAST(0 AS BIGINT) AS id_sum",
        ),
        _wrap_sql(
            SQL_QUERIES["q30_cell_range_pruning"][1],
            "'prune' AS part, i, j, n_docs, id_sum",
        ),
    ]
    return run, _union_sql(parts)


# ---------------------------------------------------------------------------
# sampling suite: hash split + stratified + balanced mixture
# ---------------------------------------------------------------------------


def _build_sampling_suite() -> tuple[Query, str]:
    """q_sampling_suite = portable hash split + stratified sample +
    balanced mixture rebalance, one (part, split, lang, n_a, n_b,
    checksum, frac) frame."""
    from engine.queries import SQL_QUERIES

    def run(spark: SparkSession, sf: str) -> DataFrame:
        _ship(spark)
        zl = F.lit(0).cast("long")
        zd = F.lit(0.0)
        hs = SQL_QUERIES["q34_hash_split_sample"][0](spark, sf).select(
            F.lit("hash").alias("part"), "split", "lang",
            F.col("n_docs").alias("n_a"), zl.alias("n_b"),
            "checksum", zd.alias("frac"),
        )
        st = SQL_QUERIES["q35_stratified_sample"][0](spark, sf).select(
            F.lit("strat").alias("part"), F.lit("").alias("split"), "lang",
            F.col("n_sampled").alias("n_a"), zl.alias("n_b"),
            F.col("id_checksum").alias("checksum"), zd.alias("frac"),
        )
        mx = SQL_QUERIES["q43_balanced_mixture"][0](spark, sf).select(
            F.lit("mix").alias("part"), F.lit("").alias("split"), "lang",
            F.col("n_before").alias("n_a"), F.col("n_after").alias("n_b"),
            F.col("id_checksum").alias("checksum"),
            F.col("realized_frac").alias("frac"),
        )
        return hs.unionByName(st).unionByName(mx)

    parts = [
        _wrap_sql(
            SQL_QUERIES["q34_hash_split_sample"][1],
            "'hash' AS part, split, lang, n_docs AS n_a,"
            " CAST(0 AS BIGINT) AS n_b, checksum,"
            " CAST(0.0 AS DOUBLE) AS frac",
        ),
        _wrap_sql(
            SQL_QUERIES["q35_stratified_sample"][1],
            "'strat' AS part, '' AS split, lang, n_sampled AS n_a,"
            " CAST(0 AS BIGINT) AS n_b, id_checksum AS checksum,"
            " CAST(0.0 AS DOUBLE) AS frac",
        ),
        _wrap_sql(
            SQL_QUERIES["q43_balanced_mixture"][1],
            "'mix' AS part, '' AS split, lang, n_before AS n_a,"
            " n_after AS n_b, id_checksum AS checksum,"
            " realized_frac AS frac",
        ),
    ]
    return run, _union_sql(parts)


# ---------------------------------------------------------------------------
# near-dup suite: token jaccard + MinHash LSH + embedding cosine
# ---------------------------------------------------------------------------


def _build_neardup_suite() -> tuple[Query, str]:
    """q_neardup_suite = n-gram Jaccard pairs + banded MinHash-LSH
    candidate pairs + embedding-cosine near-dup pairs, one
    (part, a, b, n, v) frame."""
    from engine.text_queries import TEXT_QUERIES

    def run(spark: SparkSession, sf: str) -> DataFrame:
        _ship(spark)
        jac = TEXT_QUERIES["q17_token_jaccard"][0](spark, sf).select(
            F.lit("jaccard").alias("part"),
            F.col("doc_a").alias("a"), F.col("doc_b").alias("b"),
            F.col("n_inter").alias("n"), F.col("jaccard").alias("v"),
        )
        lsh = TEXT_QUERIES["q18_minhash_lsh"][0](spark, sf).select(
            F.lit("lsh").alias("part"),
            F.col("doc_a").alias("a"), F.col("doc_b").alias("b"),
            F.col("n_shared_bands").alias("n"), F.lit(0.0).alias("v"),
        )
        emb = TEXT_QUERIES["q25_embedding_neardup"][0](spark, sf).select(
            F.lit("embed").alias("part"),
            F.col("vec_a").alias("a"), F.col("vec_b").alias("b"),
            F.lit(0).cast("long").alias("n"), F.col("cos_sim").alias("v"),
        )
        return jac.unionByName(lsh).unionByName(emb)

    parts = [
        _wrap_sql(
            TEXT_QUERIES["q17_token_jaccard"][1],
            "'jaccard' AS part, doc_a AS a, doc_b AS b, n_inter AS n,"
            " jaccard AS v",
        ),
        _wrap_sql(
            TEXT_QUERIES["q18_minhash_lsh"][1],
            "'lsh' AS part, doc_a AS a, doc_b AS b, n_shared_bands AS n,"
            " CAST(0.0 AS DOUBLE) AS v",
        ),
        _wrap_sql(
            TEXT_QUERIES["q25_embedding_neardup"][1],
            "'embed' AS part, vec_a AS a, vec_b AS b,"
            " CAST(0 AS BIGINT) AS n, cos_sim AS v",
        ),
    ]
    return run, _union_sql(parts)


# ---------------------------------------------------------------------------
# kNN suite: brute force + k-ring + radius join
# ---------------------------------------------------------------------------


def _build_knn_suite() -> tuple[Query, str]:
    """q_knn_suite = brute-force kNN + k-ring kNN (same answers — both
    kept so the driver hash pins the equivalence) + radius join, one
    (part, q_id, rank, idn, v1, v2) frame."""
    from engine.queries import SQL_QUERIES
    from engine.text_queries import TEXT_QUERIES

    def run(spark: SparkSession, sf: str) -> DataFrame:
        _ship(spark)
        z = F.lit(0.0)
        br = SQL_QUERIES["q11_knn_bruteforce"][0](spark, sf).select(
            F.lit("brute").alias("part"),
            F.col("q_id").cast("long").alias("q_id"),
            F.col("rank").cast("long").alias("rank"),
            F.col("doc_id").alias("idn"),
            F.col("dist_km").alias("v1"), z.alias("v2"),
        )
        kr = TEXT_QUERIES["q24_knn_kring"][0](spark, sf).select(
            F.lit("kring").alias("part"),
            F.col("q_id").cast("long").alias("q_id"),
            F.col("rank").cast("long").alias("rank"),
            F.col("doc_id").alias("idn"),
            F.col("dist_km").alias("v1"), z.alias("v2"),
        )
        rj = SQL_QUERIES["q36_radius_join"][0](spark, sf).select(
            F.lit("radius").alias("part"),
            F.col("q_id").cast("long").alias("q_id"),
            F.lit(0).cast("long").alias("rank"),
            F.col("n_within").alias("idn"),
            F.col("dist_sum").alias("v1"), F.col("dist_min").alias("v2"),
        )
        return br.unionByName(kr).unionByName(rj)

    parts = [
        _wrap_sql(
            SQL_QUERIES["q11_knn_bruteforce"][1],
            "'brute' AS part, CAST(q_id AS BIGINT) AS q_id,"
            " CAST(rank AS BIGINT) AS rank, doc_id AS idn,"
            " dist_km AS v1, CAST(0.0 AS DOUBLE) AS v2",
        ),
        _wrap_sql(
            TEXT_QUERIES["q24_knn_kring"][1],
            "'kring' AS part, CAST(q_id AS BIGINT) AS q_id,"
            " CAST(rank AS BIGINT) AS rank, doc_id AS idn,"
            " dist_km AS v1, CAST(0.0 AS DOUBLE) AS v2",
        ),
        _wrap_sql(
            SQL_QUERIES["q36_radius_join"][1],
            "'radius' AS part, CAST(q_id AS BIGINT) AS q_id,"
            " CAST(0 AS BIGINT) AS rank, n_within AS idn,"
            " dist_sum AS v1, dist_min AS v2",
        ),
    ]
    return run, _union_sql(parts)


# ---------------------------------------------------------------------------
# ANN suite: brute-force embedding top-k + IVF
# ---------------------------------------------------------------------------


def _build_ann_suite() -> tuple[Query, str]:
    """q_ann_suite = brute-force cosine top-k baseline + IVF variant in
    q22's existing (part, a, b, c, v) long format."""
    from engine.queries import SQL_QUERIES
    from engine.text_queries import TEXT_QUERIES

    def run(spark: SparkSession, sf: str) -> DataFrame:
        _ship(spark)
        ivf = TEXT_QUERIES["q22_ivf"][0](spark, sf).select(
            F.concat(F.lit("ivf:"), F.col("part")).alias("part"),
            "a", "b", "c", "v",
        )
        br = SQL_QUERIES["q15_embedding_topk"][0](spark, sf).select(
            F.lit("brute").alias("part"),
            F.col("q_vec").alias("a"),
            F.col("rank").cast("long").alias("b"),
            F.col("vec_id").alias("c"),
            F.col("cos_sim").alias("v"),
        )
        return ivf.unionByName(br)

    parts = [
        _wrap_sql(
            TEXT_QUERIES["q22_ivf"][1],
            "'ivf:' || part AS part, a, b, c, v",
        ),
        _wrap_sql(
            SQL_QUERIES["q15_embedding_topk"][1],
            "'brute' AS part, q_vec AS a, CAST(rank AS BIGINT) AS b,"
            " vec_id AS c, cos_sim AS v",
        ),
    ]
    return run, _union_sql(parts)


# ---------------------------------------------------------------------------


#: queries absorbed into suites — removed from the top-level registry
MERGED_AWAY: frozenset[str] = frozenset(
    {
        # spatial tail → suites
        "sq_openness", "sq_flowlen", "sq_upsample", "sq_reclass_algebra",
        "sq_pyramid",
        "sq_global_summary", "sq_moran", "sq_compact_cells",
        "sq_hotspot", "sq_trend",
        "sq_zonal_cat", "sq_zonal_geom", "sq_zonal_pct",
        "sq_contour", "sq_overlay", "sq_hull", "sq_vector_ops",
        "sq_cost_path", "sq_idw", "sq_sample_points",
        # head families → suites
        "q09_cell_encode_histogram", "q10_bbox_filter",
        "q30_cell_range_pruning",
        "q34_hash_split_sample", "q35_stratified_sample",
        "q43_balanced_mixture",
        "q17_token_jaccard", "q18_minhash_lsh", "q25_embedding_neardup",
        "q11_knn_bruteforce", "q24_knn_kring", "q36_radius_join",
        "q15_embedding_topk", "q22_ivf",
    }
)


def build_suites() -> dict[str, tuple[Query, str]]:
    return {
        "q_grid_suite": _build_grid_suite(),
        "q_knn_suite": _build_knn_suite(),
        "q_ann_suite": _build_ann_suite(),
        "q_neardup_suite": _build_neardup_suite(),
        "q_sampling_suite": _build_sampling_suite(),
        "sq_raster_suite": _build_raster_suite(),
        "sq_cellstats": _build_cellstats(),
        "sq_zonal_order": _build_zonal_order(),
        "sq_vector_suite": _build_vector_suite(),
        "sq_surface_points": _build_surface_points(),
        "sq_global_stats": _build_global_stats(),
    }
