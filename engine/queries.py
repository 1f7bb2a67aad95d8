"""Driver-contract query suite (SURVEY.md §2 coverage) with DuckDB
oracle SQL. Every Spark query aliases its computed columns identically
to the SQL so the driver's order-insensitive value-hash compare passes
(column names are the join key of the comparison).

Numeric discipline:
- aggregates of doubles are ROUND()ed the same on both sides (sum order
  differs between engines; rounding well above the ~1e-9 relative FP
  noise makes the hash stable);
- counts/keys stay integral (exact);
- haversine/cosine use the identical formula text on both sides.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine import grid, shim, udfs

Query = Callable[[SparkSession, str], DataFrame]

_T = lambda spark, sf_dir, name: spark.read.parquet(f"{sf_dir}/{name}.parquet")  # noqa: E731


# ---------------------------------------------------------------------------
# relational suite (A1/A3/A4, J6–J10, Q1–Q8): the oracle-checkable rows
# ---------------------------------------------------------------------------

def q01_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """Money columns are exact 2-decimal values: aggregate in integer
    cents so the sums are order-independent and bitwise-reproducible in
    any engine, then derive doubles with ONE identical division."""
    li = _T(spark, sf, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_bp = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .withColumn("_cents", cents)
        .withColumn("_disc", cents * (100 - disc_bp))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            (F.sum("_cents").cast("double") / 100.0).alias("sum_base_price"),
            (F.sum("_disc").cast("double") / 10000.0).alias("sum_disc_price"),
            (F.sum(F.col("l_quantity").cast("long")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum("_cents").cast("double") / 100.0 / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)                   AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
                                                                          AS sum_base_price,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0
                                                                          AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)         AS avg_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*)
                                                                          AS avg_price,
       COUNT(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q02_topk_orders_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    o = _T(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rn")
    )


Q02_SQL = """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""


def q03_region_rollup(spark: SparkSession, sf: str) -> DataFrame:
    c = _T(spark, sf, "customer")
    n = _T(spark, sf, "nation")
    r = _T(spark, sf, "region")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return j.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_cust"),
        (F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).cast("double") / 100.0).alias("total_acctbal"),
    )


Q03_SQL = """
SELECT r_name, n_name, COUNT(*) AS n_cust,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q04_customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    c = _T(spark, sf, "customer")
    o = _T(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


Q04_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q05_supplier_part_semi(spark: SparkSession, sf: str) -> DataFrame:
    """Parts that ship (semi join through lineitem) with price stats."""
    p = _T(spark, sf, "part")
    li = _T(spark, sf, "lineitem")
    shipped = p.join(li, p.p_partkey == li.l_partkey, "left_semi")
    return shipped.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        (F.sum(F.round(F.col("p_retailprice") * 100).cast("long")).cast("double") / 100.0 / F.count(F.lit(1))).alias("avg_price"),
    )


Q05_SQL = """
SELECT p_brand, COUNT(*) AS n_parts,
       CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price
FROM part WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
GROUP BY p_brand
"""


def q06_events_moving_avg(spark: SparkSession, sf: str) -> DataFrame:
    """1-D window-frame sibling of the 2-D focal ops (SURVEY.md §5.4):
    centered ±3 moving mean per user over event time."""
    e = _T(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 3)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return e.withColumn("_c", cents).select(
        "event_id",
        "user_id",
        (F.sum("_c").over(w).cast("double") / 100.0 / F.count(F.lit(1)).over(w)).alias("mov_avg"),
        F.count(F.lit(1)).over(w).alias("win_n"),
    )


Q06_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS DOUBLE) / 100.0
         / COUNT(*) OVER w AS mov_avg,
       COUNT(*) OVER w AS win_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
"""


def q07_events_asof_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join (J10): per event, the value of the user's most recent
    purchase at-or-before the event's timestamp."""
    e = _T(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "event_id",
        F.round(F.last(purchase_val, ignorenulls=True).over(w), 6).alias(
            "asof_purchase_value"
        ),
    )


Q07_SQL = """
SELECT event_id,
       ROUND(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
         AS asof_purchase_value
FROM events
"""


def q08_events_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Range/interval join (J9): per event, how many LATER events the
    same user produced within the next 10 minutes (exclusive of self)."""
    e = _T(spark, sf, "events").select("event_id", "user_id", "ts")
    a, b = e.alias("a"), e.alias("b")
    joined = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 10 MINUTES")),
        "left",
    )
    return joined.groupBy(F.col("a.event_id").alias("event_id")).agg(
        F.count(F.col("b.event_id")).alias("n_next_10m")
    )


Q08_SQL = """
SELECT a.event_id AS event_id, COUNT(b.event_id) AS n_next_10m
FROM events a
LEFT JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
GROUP BY a.event_id
"""


# ---------------------------------------------------------------------------
# spatial encode suite (C1/C2/C6/P3/P4) — un-interleaved (level, i, j)
# form so plain SQL replicates the arithmetic (SURVEY.md §5.4)
# ---------------------------------------------------------------------------

def _doc_points(spark: SparkSession, sf: str) -> DataFrame:
    d = _T(spark, sf, "documents")
    return d.select(
        "doc_id",
        shim.shim_lat_col(F.col("doc_id")).alias("lat"),
        shim.shim_lon_col(F.col("doc_id")).alias("lon"),
    )


_DOC_POINTS_SQL = f"""
SELECT doc_id, {shim.SHIM_LAT_SQL} AS lat, {shim.SHIM_LON_SQL} AS lon
FROM documents
"""


def q09_cell_encode_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Geocode (shim) → level-6 cell (i, j) → docs per cell. The packed
    Morton id itself is tested separately (not SQL-friendly); (i, j) is
    the oracle-checkable un-interleaved form."""
    level = 6
    pts = _doc_points(spark, sf)
    i, j = udfs.latlon_to_ij_cols(F.col("lat"), F.col("lon"), level)
    return (
        pts.withColumn("i", i)
        .withColumn("j", j)
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


Q09_SQL = f"""
WITH pts AS ({_DOC_POINTS_SQL}),
cells AS (
  SELECT ((CAST(FLOOR((lon + 180) / 360 * 64) AS BIGINT) % 64) + 64) % 64 AS i,
         GREATEST(0, LEAST(31, CAST(FLOOR((lat + 90) / 180 * 32) AS BIGINT))) AS j
  FROM pts
)
SELECT i, j, COUNT(*) AS n_docs FROM cells GROUP BY i, j
"""


def q10_bbox_filter(spark: SparkSession, sf: str) -> DataFrame:
    """P4 bbox predicate: docs inside lat [10,40) lon [-20,60), counted
    per level-8 cell."""
    level = 8
    pts = _doc_points(spark, sf).filter(
        (F.col("lat") >= 10) & (F.col("lat") < 40) & (F.col("lon") >= -20) & (F.col("lon") < 60)
    )
    i, j = udfs.latlon_to_ij_cols(F.col("lat"), F.col("lon"), level)
    return (
        pts.withColumn("i", i)
        .withColumn("j", j)
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


Q10_SQL = f"""
WITH pts AS ({_DOC_POINTS_SQL})
SELECT ((CAST(FLOOR((lon + 180) / 360 * 256) AS BIGINT) % 256) + 256) % 256 AS i,
       GREATEST(0, LEAST(127, CAST(FLOOR((lat + 90) / 180 * 128) AS BIGINT))) AS j,
       COUNT(*) AS n_docs
FROM pts
WHERE lat >= 10 AND lat < 40 AND lon >= -20 AND lon < 60
GROUP BY 1, 2
"""


def q30_cell_range_pruning(spark: SparkSession, sf: str) -> DataFrame:
    """P3+P4 compiled: the bbox lat [5,35) × lon [100,140) becomes a
    set of contiguous Morton cell-id BETWEEN ranges at level 8
    (grid.bbox_to_cell_ranges — quadtree descent over the
    range-contiguous id layout). The filter here is the OR of those
    ranges, nothing else — the ranges cover the box's cells EXACTLY,
    and on a cell-sorted parquet table the same predicate pushes down
    to row-group pruning (tests/test_grid.py::test_range_pruning_plan
    asserts PushedFilters + skipped row groups). Oracle: the
    equivalent un-interleaved (i, j) box."""
    level = 8
    pts = _doc_points(spark, sf)
    i, j = udfs.latlon_to_ij_cols(F.col("lat"), F.col("lon"), level)
    # Arrow-batched Morton encode: the 55-range OR below references the
    # cell_id ATTRIBUTE; inlining the Catalyst bit-interleave here would
    # duplicate its (already self-duplicating) expression tree per range
    # and blow codegen past the JIT method limit (engine/udfs.py)
    d = (
        pts.withColumn("i", i)
        .withColumn("j", j)
        .withColumn(
            "cell_id", udfs.cell_encode_pudf(F.col("lat"), F.col("lon"), F.lit(level))
        )
    )
    pred = None
    for lo, hi in grid.bbox_to_cell_ranges(5.0, 35.0, 100.0, 140.0, level):
        c = F.col("cell_id").between(lo, hi)
        pred = c if pred is None else (pred | c)
    return (
        d.filter(pred)
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("id_sum"))
    )


Q30_SQL = f"""
WITH pts AS ({_DOC_POINTS_SQL}),
cells AS (
  SELECT doc_id,
         ((CAST(FLOOR((lon + 180) / 360 * 256) AS BIGINT) % 256) + 256) % 256 AS i,
         GREATEST(0, LEAST(127, CAST(FLOOR((lat + 90) / 180 * 128) AS BIGINT))) AS j
  FROM pts
)
SELECT i, j, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM cells
WHERE i BETWEEN 199 AND 227 AND j BETWEEN 67 AND 88
GROUP BY i, j
"""


_KNN_QUERIES = [(0, 10.0, 20.0), (1, -30.0, -60.0), (2, 55.0, 150.0)]


def q11_knn_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    """kNN oracle variant (J3 baseline): haversine top-5 per fixed query
    point, ties broken by (distance, doc_id) (§5.3.7)."""
    pts = _doc_points(spark, sf)
    qdf = spark.createDataFrame(_KNN_QUERIES, "q_id int, q_lat double, q_lon double")
    d = udfs.haversine_col(F.col("q_lat"), F.col("q_lon"), F.col("lat"), F.col("lon"))
    j = qdf.crossJoin(pts).withColumn("dist_km", d)
    w = Window.partitionBy("q_id").orderBy(F.col("dist_km"), F.col("doc_id"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "rank", "doc_id", F.round("dist_km", 6).alias("dist_km"))
    )


_KNN_Q_SQL = " UNION ALL ".join(
    f"SELECT {q} AS q_id, CAST({la} AS DOUBLE) AS q_lat, CAST({lo} AS DOUBLE) AS q_lon"
    for q, la, lo in _KNN_QUERIES
)

Q11_SQL = f"""
WITH pts AS ({_DOC_POINTS_SQL}),
q AS ({_KNN_Q_SQL}),
d AS (
  SELECT q.q_id, pts.doc_id,
         2 * 6371.0088 * ASIN(SQRT(
           LEAST(1.0, GREATEST(0.0,
             POW(SIN(RADIANS(pts.lat - q.q_lat) / 2), 2)
             + COS(RADIANS(q.q_lat)) * COS(RADIANS(pts.lat))
               * POW(SIN(RADIANS(pts.lon - q.q_lon) / 2), 2)))
         )) AS dist_km
  FROM q CROSS JOIN pts
)
SELECT q_id, rank, doc_id, ROUND(dist_km, 6) AS dist_km
FROM (
  SELECT q_id, doc_id, dist_km,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist_km, doc_id) AS rank
  FROM d
) WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# text-analysis / dedup suite over documents
# ---------------------------------------------------------------------------

def q12_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    d = _T(spark, sf, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    return (
        d.withColumn("n_tokens", toks)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
            (F.sum("n_chars").cast("double") / F.sum("n_tokens")).alias("chars_per_token"),
        )
    )


Q12_SQL = r"""
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens,
       CAST(SUM(n_chars) AS DOUBLE) / SUM(n_tokens) AS chars_per_token
FROM (
  SELECT lang, n_chars, CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
  FROM documents
)
GROUP BY lang
"""


def q13_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup by content hash: per source, docs vs distinct texts."""
    d = _T(spark, sf, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(F.col("text"))).alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5(F.col("text")))).alias("n_dupes"),
    )


Q13_SQL = """
SELECT source, COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(text)) AS n_distinct,
       COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dupes
FROM documents GROUP BY source
"""


def q14_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """Text-quality heuristics: length band + alpha ratio, per lang."""
    d = _T(spark, sf, "documents")
    alpha = F.length(F.regexp_replace(F.col("text"), r"[^a-zA-Z]", ""))
    ratio = alpha / F.greatest(F.length("text"), F.lit(1))
    band = (
        F.when(F.col("n_chars") < 100, "short")
        .when(F.col("n_chars") < 300, "medium")
        .otherwise("long")
    )
    return (
        d.withColumn("band", band)
        .withColumn("_alpha", alpha.cast("long"))
        .withColumn("_len", F.greatest(F.length("text"), F.lit(1)).cast("long"))
        .groupBy("lang", "band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("_alpha").cast("double") / F.sum("_len")).alias("alpha_ratio"),
        )
    )


Q14_SQL = """
SELECT lang,
       CASE WHEN n_chars < 100 THEN 'short'
            WHEN n_chars < 300 THEN 'medium'
            ELSE 'long' END AS band,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT)) AS DOUBLE)
         / SUM(CAST(GREATEST(len(text), 1) AS BIGINT)) AS alpha_ratio
FROM documents
GROUP BY 1, 2
"""


def q12_doc_stats(spark: SparkSession, sf: str) -> DataFrame:
    """D7+D8 consolidated (one driver row, both operators exercised):
    per-language token stats (band='<tok>') unioned with per-(lang,
    length-band) quality heuristics — same registry semantics as the
    former q12_token_stats / q14_quality_score entries."""
    a = q12_token_stats(spark, sf).select(
        "lang",
        F.lit("<tok>").alias("band"),
        "n_docs",
        "total_tokens",
        "avg_tokens",
        F.col("chars_per_token").alias("ratio"),
    )
    b = q14_quality_score(spark, sf).select(
        "lang",
        "band",
        "n_docs",
        F.lit(0).cast("long").alias("total_tokens"),
        F.lit(0.0).alias("avg_tokens"),
        F.col("alpha_ratio").alias("ratio"),
    )
    return a.unionAll(b)


Q12_DOC_STATS_SQL = f"""
SELECT lang, '<tok>' AS band, n_docs, total_tokens, avg_tokens,
       chars_per_token AS ratio
FROM ({Q12_SQL})
UNION ALL
SELECT lang, band, n_docs, CAST(0 AS BIGINT), 0.0, alpha_ratio
FROM ({Q14_SQL})
"""


def q15_embedding_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-k similarity search (ANN baseline) — dot
    products via built-in higher-order functions, JVM-side."""
    e = _T(spark, sf, "embeddings")
    qv = e.filter(F.col("vec_id").isin([0, 1, 2])).select(
        F.col("vec_id").alias("q_vec"), F.col("embedding").alias("q_emb")
    )
    dot = F.aggregate(
        F.zip_with("q_emb", "embedding", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    j = (
        qv.crossJoin(e)
        .filter(F.col("q_vec") != F.col("vec_id"))
        .withColumn("cos_sim", dot / (nrm(F.col("q_emb")) * nrm(F.col("embedding"))))
    )
    w = Window.partitionBy("q_vec").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_vec", "rank", "vec_id", F.round("cos_sim", 6).alias("cos_sim"))
    )


Q15_SQL = """
WITH q AS (SELECT vec_id AS q_vec, embedding AS q_emb FROM embeddings WHERE vec_id IN (0, 1, 2)),
d AS (
  SELECT q.q_vec, e.vec_id,
         list_sum(list_transform(list_zip(q.q_emb, e.embedding),
                                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / (SQRT(list_sum(list_transform(q.q_emb, x -> CAST(x AS DOUBLE) * x)))
            * SQRT(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x))))
           AS cos_sim
  FROM q CROSS JOIN embeddings e WHERE q.q_vec <> e.vec_id
)
SELECT q_vec, rank, vec_id, ROUND(cos_sim, 6) AS cos_sim
FROM (
  SELECT q_vec, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_vec ORDER BY cos_sim DESC, vec_id) AS rank
  FROM d
) WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# §2.9 UDF-surface rows: grouped-agg pandas UDF (U5), iterator-scalar
# heavy-init pandas UDF (U4), plus the A3 approx_count_distinct row.
# ---------------------------------------------------------------------------

def q31_grouped_agg_rms(spark: SparkSession, sf: str) -> DataFrame:
    """U5 GROUPED_AGG pandas_udf: per-language RMS of document length.
    Integer sum-of-squares keeps the aggregation order-independent and
    bitwise cross-engine; one sqrt at extract."""
    import math

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def rms_udaf(v: pd.Series) -> float:
        a = v.to_numpy(dtype=np.int64)
        return math.sqrt(int((a * a).sum()) / len(a))

    @pandas_udf("long")
    def count_udaf(v: pd.Series) -> int:
        # GROUPED_AGG UDFs cannot mix with JVM aggregates in one agg —
        # the row count rides as a second pandas aggregation
        return len(v)

    d = _T(spark, sf, "documents")
    return d.groupBy("lang").agg(
        count_udaf("n_chars").alias("n_docs"),
        F.round(rms_udaf("n_chars"), 6).alias("rms_chars"),
    )


Q31_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       ROUND(SQRT(CAST(SUM(n_chars * n_chars) AS DOUBLE) / COUNT(*)), 6) AS rms_chars
FROM documents GROUP BY lang
"""


def q32_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """A3 approx_count_distinct (HLL++): per-source exact distinct
    content hashes plus a cross-checked 'approx within 5% of exact'
    verdict — the exact count is the hash-compared value; the approx
    path is exercised on both engines (different HLL implementations,
    same accuracy contract)."""
    d = _T(spark, sf, "documents")
    exact = F.countDistinct(F.md5("text"))
    approx = F.approx_count_distinct(F.md5("text"), rsd=0.02)
    return d.groupBy("source").agg(
        exact.alias("n_exact"),
        (F.abs(approx - exact) <= 0.05 * exact).alias("approx_ok"),
    )


Q32_SQL = """
SELECT source, COUNT(DISTINCT md5(text)) AS n_exact,
       ABS(approx_count_distinct(md5(text)) - COUNT(DISTINCT md5(text)))
         <= 0.05 * COUNT(DISTINCT md5(text)) AS approx_ok
FROM documents GROUP BY source
"""


_STOPWORD_WEIGHTS = [
    ("the", 1.0), ("a", 0.5), ("of", 1.0 / 3), ("and", 0.25),
    ("to", 0.2), ("in", 1.0 / 6), ("is", 1.0 / 7), ("it", 0.125),
]


def q33_heavy_init_score(spark: SparkSession, sf: str) -> DataFrame:
    """U4 iterator-scalar pandas_udf (Iterator[pd.Series] →
    Iterator[pd.Series]): the weight table is built ONCE per Python
    worker before the batch loop (the §2.9 heavy-init form —
    stand-in for precomputed FFT plans / disk masks), then every Arrow
    batch reuses it."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def stopword_score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        weights = dict(_STOPWORD_WEIGHTS)  # heavy init: once per worker
        for s in batches:
            yield s.map(
                lambda txt: sum(weights.get(t, 0.0) for t in str(txt).split())
                / max(len(str(txt).split()), 1)
            )

    d = _T(spark, sf, "documents")
    return d.withColumn("score", stopword_score("text")).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("score"), 4).alias("score_sum"),
    )


def _q33_sql() -> str:
    cases = " ".join(f"WHEN '{w}' THEN {v!r}" for w, v in _STOPWORD_WEIGHTS)
    return rf"""
WITH s AS (
  SELECT lang,
         list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
                                 t -> CASE t {cases} ELSE 0.0 END))
         / GREATEST(len(regexp_split_to_array(trim(text), '\s+')), 1) AS score
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs, ROUND(SUM(score), 4) AS score_sum
FROM s GROUP BY lang
"""


# SAME query points as the kNN family by design (q36 radius-joins the
# geography q11/q24 rank) — alias, don't copy, so an edit cannot
# silently diverge the workloads
_RADIUS_QUERIES = _KNN_QUERIES
_RADIUS_KM = 1500.0


def q36_radius_join(spark: SparkSession, sf: str) -> DataFrame:
    """Within-distance spatial join (engine/joins.radius_join): all doc
    points within 1500 km of each fixed center, one k-ring candidate
    round + haversine refine; per-center count / distance checksums."""
    from engine import joins

    pts = _doc_points(spark, sf)
    qdf = spark.createDataFrame(_RADIUS_QUERIES, "q_id int, lat double, lon double")
    out = joins.radius_join(qdf, pts, _RADIUS_KM, level=7)
    return out.groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n_within"),
        F.round(F.sum("dist_km"), 4).alias("dist_sum"),
        F.round(F.min("dist_km"), 6).alias("dist_min"),
    )


_RADIUS_Q_SQL = " UNION ALL ".join(
    f"SELECT {q} AS q_id, CAST({la} AS DOUBLE) AS q_lat, CAST({lo} AS DOUBLE) AS q_lon"
    for q, la, lo in _RADIUS_QUERIES
)

Q36_SQL = f"""
WITH pts AS ({_DOC_POINTS_SQL}),
q AS ({_RADIUS_Q_SQL}),
d AS (
  SELECT q.q_id,
         2 * 6371.0088 * ASIN(SQRT(
           LEAST(1.0, GREATEST(0.0,
             POW(SIN(RADIANS(pts.lat - q.q_lat) / 2), 2)
             + COS(RADIANS(q.q_lat)) * COS(RADIANS(pts.lat))
               * POW(SIN(RADIANS(pts.lon - q.q_lon) / 2), 2)))
         )) AS dist_km
  FROM q CROSS JOIN pts
)
SELECT q_id, COUNT(*) AS n_within, ROUND(SUM(dist_km), 4) AS dist_sum,
       ROUND(MIN(dist_km), 6) AS dist_min
FROM d WHERE dist_km <= {_RADIUS_KM} GROUP BY q_id
"""


_SPLIT_WEIGHTS = {"train": 0.90, "val": 0.05, "test": 0.05}


def q34_hash_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic train/val/test carve (engine/sampling.hash_split):
    shuffle-free hash-threshold split on doc_id, summarized per
    (split, lang). The split is a map-only projection — stable under
    reruns, repartitions, and cluster resizes, unlike rand()-based
    sampling."""
    from engine import sampling

    d = sampling.hash_split(_T(spark, sf, "documents"), "doc_id", _SPLIT_WEIGHTS)
    return d.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars_sum"),
    )


def _q34_sql() -> str:
    from engine import sampling

    case = sampling.split_case_sql("doc_id", _SPLIT_WEIGHTS)
    return f"""
SELECT {case} AS split, lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_sum
FROM documents GROUP BY 1, 2
"""


def q35_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Exact stratified subsample (engine/sampling.stratified_exact):
    exactly ceil(10% · n) docs per language, deterministically chosen
    by lowest hash bucket; per-language count + doc_id checksum proves
    both engines picked the IDENTICAL rows."""
    from engine import sampling

    s = sampling.stratified_exact(
        _T(spark, sf, "documents"), ["lang"], "doc_id", 0.10
    )
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("doc_id").alias("id_checksum"),
    )


def _q35_sql() -> str:
    from engine import sampling

    b = sampling.bucket_sql("doc_id")
    return f"""
WITH ranked AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY {b}, doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM ranked WHERE rk <= CEIL(0.10 * n) GROUP BY lang
"""


def q37_hash_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Nested deterministic subsamples (engine/sampling.sample_fraction):
    the 5% hash sample is BY CONSTRUCTION a subset of the 20% one
    (bucket thresholds nest) — one row per fraction with count +
    id checksum; the nesting shows up as identical intersection counts
    in both engines."""
    from engine import sampling

    docs = _T(spark, sf, "documents")
    out = None
    for frac in (0.05, 0.20):
        s = sampling.sample_fraction(docs, "doc_id", frac).agg(
            F.lit(frac).alias("frac"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_checksum"),
        )
        out = s if out is None else out.unionAll(s)
    return out


def _q37_sql() -> str:
    from engine import sampling

    b = sampling.bucket_sql("doc_id")
    parts = [
        f"SELECT {frac} AS frac, COUNT(*) AS n_docs, "
        f"CAST(SUM(doc_id) AS BIGINT) AS id_checksum "
        f"FROM documents WHERE ({b}) < {int(round(frac * 10000))}"
        for frac in (0.05, 0.20)
    ]
    return " UNION ALL ".join(parts)


def q34_hash_split_sample(spark: SparkSession, sf: str) -> DataFrame:
    """D19 consolidated (one driver row, both operators exercised):
    the deterministic train/val/test hash split unioned with the
    nested 5%/20% hash subsamples (former q34_hash_split /
    q37_hash_sample entries) — checksum column proves identical row
    choice cross-engine for both."""
    a = q34_hash_split(spark, sf).select(
        "split", "lang", "n_docs", F.col("chars_sum").alias("checksum")
    )
    b = q37_hash_sample(spark, sf).select(
        F.concat(
            F.lit("frac_"),
            F.round(F.col("frac") * 100).cast("int").cast("string"),
        ).alias("split"),
        F.lit("<all>").alias("lang"),
        "n_docs",
        F.col("id_checksum").alias("checksum"),
    )
    return a.unionAll(b)


def _q34s_sql() -> str:
    return f"""
SELECT split, lang, n_docs, chars_sum AS checksum FROM ({_q34_sql()})
UNION ALL
SELECT 'frac_' || CAST(CAST(ROUND(frac * 100) AS INT) AS VARCHAR) AS split,
       '<all>' AS lang, n_docs, id_checksum AS checksum
FROM ({_q37_sql()})
"""


def q43_balanced_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Mixture rebalancing (engine/sampling.balanced_downsample, D27):
    every LANGUAGE deterministically downsampled to ≈ the smallest
    language's size (the corpus is genuinely imbalanced by lang: en is
    ~3.4× fr) — per-lang before/after counts, an id checksum
    proving both engines kept the IDENTICAL rows, and the realized
    fraction."""
    from engine import sampling

    docs = _T(spark, sf, "documents")
    kept = sampling.balanced_downsample(docs, "lang", "doc_id")
    before = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_before"))
    after = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_after"),
        F.sum("doc_id").alias("id_checksum"),
    )
    return before.join(after, "lang", "left").select(
        "lang",
        F.col("n_before").cast("long").alias("n_before"),
        F.coalesce("n_after", F.lit(0)).cast("long").alias("n_after"),
        F.coalesce("id_checksum", F.lit(0)).cast("long")
         .alias("id_checksum"),
        F.round(
            F.coalesce("n_after", F.lit(0))
            / F.col("n_before").cast("double"),
            6,
        ).alias("realized_frac"),
    )


def _q43_sql() -> str:
    from engine import sampling

    b = sampling.bucket_sql("doc_id")
    return f"""
WITH cnt AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
mn AS (SELECT MIN(n) AS mn FROM cnt),
thr AS (
  -- GREATEST(1, ...) mirrors engine/sampling.balanced_downsample's
  -- >=1-bucket clamp (sampling.py): a group more than 10000x the
  -- smallest still keeps ~1/10000 of its rows, never zero (r4 ADVICE)
  SELECT lang, n, CAST(GREATEST(1, FLOOR(mn * 10000 / n)) AS INT) AS t
  FROM cnt, mn
),
kept AS (
  SELECT d.lang, d.doc_id
  FROM documents d JOIN thr ON thr.lang = d.lang
  WHERE ({b}) < thr.t
)
SELECT t.lang, CAST(t.n AS BIGINT) AS n_before,
       CAST(COUNT(k.doc_id) AS BIGINT) AS n_after,
       CAST(COALESCE(SUM(k.doc_id), 0) AS BIGINT) AS id_checksum,
       ROUND(COUNT(k.doc_id) / CAST(t.n AS DOUBLE), 6) AS realized_frac
FROM thr t LEFT JOIN kept k ON k.lang = t.lang
GROUP BY t.lang, t.n
"""


SQL_QUERIES: dict[str, tuple[Query, str]] = {
    "q01_pricing_summary": (q01_pricing_summary, Q01_SQL),
    "q02_topk_orders_per_customer": (q02_topk_orders_per_customer, Q02_SQL),
    "q03_region_rollup": (q03_region_rollup, Q03_SQL),
    "q04_customers_without_orders": (q04_customers_without_orders, Q04_SQL),
    "q05_supplier_part_semi": (q05_supplier_part_semi, Q05_SQL),
    "q06_events_moving_avg": (q06_events_moving_avg, Q06_SQL),
    "q07_events_asof_purchase": (q07_events_asof_purchase, Q07_SQL),
    "q08_events_range_join": (q08_events_range_join, Q08_SQL),
    "q09_cell_encode_histogram": (q09_cell_encode_histogram, Q09_SQL),
    "q10_bbox_filter": (q10_bbox_filter, Q10_SQL),
    "q11_knn_bruteforce": (q11_knn_bruteforce, Q11_SQL),
    "q12_doc_stats": (q12_doc_stats, Q12_DOC_STATS_SQL),
    "q13_exact_dedup": (q13_exact_dedup, Q13_SQL),
    "q15_embedding_topk": (q15_embedding_topk, Q15_SQL),
    "q30_cell_range_pruning": (q30_cell_range_pruning, Q30_SQL),
    "q31_grouped_agg_rms": (q31_grouped_agg_rms, Q31_SQL),
    "q32_approx_distinct": (q32_approx_distinct, Q32_SQL),
    "q33_heavy_init_score": (q33_heavy_init_score, _q33_sql()),
    "q34_hash_split_sample": (q34_hash_split_sample, _q34s_sql()),
    "q35_stratified_sample": (q35_stratified_sample, _q35_sql()),
    "q36_radius_join": (q36_radius_join, Q36_SQL),
    "q43_balanced_mixture": (q43_balanced_mixture, _q43_sql()),
}
