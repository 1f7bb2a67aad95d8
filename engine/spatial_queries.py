"""Spatial-engine queries for the driver contract (focal kernels, PIP
on real polygons, patch statistics, polygonize, multimodal decode).

Round 1 shipped these as rows-only checks; round 2 gives each a full
DuckDB oracle: at contract scale every one of these pipelines IS
SQL-expressible —

- the rasterize→halo→focal path is a contribution-style join: every
  pixel with ≥1 doc contributes (value, weight) to the window centers
  it serves (offset sets are symmetric), grouped by center; output
  tiles are exactly the tiles with ≥1 point (only those have a center
  payload after the halo groupBy);
- PIP is ray-cast arithmetic over inlined ring vertices (same strict
  upper-endpoint + boundary-eps rules as engine/geometry.py);
- patch CCL is a recursive-CTE reachability closure (component id =
  MIN cell id);
- the fixture raster for patch/vector queries is an *arithmetic*
  Voronoi raster (``raster_arith``) so DuckDB regenerates the identical
  grid with integer/double arithmetic — no RNG.

Each entry is (fn, sql | None); None keeps the driver's rows-only
check (golden-tested in tests/ instead)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine import shim

Query = Callable[[SparkSession, str], DataFrame]


def _tile_summary(out: DataFrame) -> DataFrame:
    # nodata pixels surface as NULL (Arrow) or NaN — exclude both;
    # note isnan(NULL) is false in Spark, so the null check is required
    valid = F.filter("data", lambda x: x.isNotNull() & ~F.isnan(x))
    return out.select(
        "tile_x",
        "tile_y",
        "band",
        F.size(valid).cast("long").alias("n_valid"),
        F.round(F.aggregate(valid, F.lit(0.0), lambda a, x: a + x), 4).alias("tile_sum"),
    )


def _tile_summary_quantized(out: DataFrame) -> DataFrame:
    """_tile_summary with ORDER-FREE summation: each valid cell rounds
    to integer micro-units (×1e6) and the tile sum is exact int64
    addition — immune to sum-order ulp noise landing ON a 4-decimal
    rounding boundary (bit-identical per-cell values are guaranteed by
    the pinned fold orders; TPI on the quadratic DEM is exactly
    −0.00375/cell, putting every odd-count tile sum exactly on a
    boundary). Oracle mirror: SUM(CAST(ROUND(v*1e6) AS BIGINT))/1e6."""
    valid = F.filter("data", lambda x: x.isNotNull() & ~F.isnan(x))
    micro = F.transform(valid, lambda x: F.round(x * 1e6).cast("long"))
    return out.select(
        "tile_x",
        "tile_y",
        "band",
        F.size(valid).cast("long").alias("n_valid"),
        F.round(
            F.aggregate(micro, F.lit(0).cast("long"), lambda a, x: a + x) / 1e6, 4
        ).alias("tile_sum"),
    )


# ---------------------------------------------------------------------------
# shared oracle CTEs: documents → shim lat/lon → level-9 pixel counts,
# exactly mirroring udfs.latlon_to_ij_cols + tiling.rasterize(count).
# Level 9, T=32: global grid 512×256 px, 16×8 tiles, x wraps mod 512.
# ---------------------------------------------------------------------------

_CNT_SQL = f"""
pts AS (
  SELECT {shim.SHIM_LAT_SQL} AS lat, {shim.SHIM_LON_SQL} AS lon FROM documents
),
cnt AS (
  SELECT CAST(FLOOR((lon + 180) / 360 * 512) AS BIGINT) AS gi,
         CAST(FLOOR((lat + 90) / 180 * 256) AS BIGINT) AS gj,
         CAST(COUNT(*) AS DOUBLE) AS v
  FROM pts GROUP BY 1, 2
),
tiles AS (SELECT DISTINCT gi // 32 AS tx, gj // 32 AS ty FROM cnt),
px AS (
  SELECT t.tx, t.ty, t.tx * 32 + x.i AS gi, t.ty * 32 + y.j AS gj
  FROM tiles t, range(0, 32) x(i), range(0, 32) y(j)
)
"""


def sq_focal_mean_circle(spark: SparkSession, sf: str) -> DataFrame:
    """W2: circular-kernel (r=7) focal mean of doc density per cell."""
    from engine import tiling, udfs
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    level, T = 9, 32
    docs = shim.documents_interleaved(spark, sf)
    pts = udfs.with_cell_and_tile(udfs.geocode_cols(docs), level, T)
    tiles = tiling.rasterize(pts, T, level, stat="count")
    out = tiling.apply_focal(
        tiles, 7, "circle", ["mean"], T, level=level, wrap_nx=(2**level) // T
    )
    return _tile_summary(out)


# Focal mean, contribution form: each counted pixel serves the window
# centers at symmetric circle offsets (di²+dj² ≤ 49); mean = Σv/n over
# contributing pixels; a center with no contribution is NaN (excluded).
SQ_FOCAL_MEAN_CIRCLE_SQL = f"""
WITH {_CNT_SQL},
offs AS (
  SELECT a.di AS di, b.dj AS dj FROM range(-7, 8) a(di), range(-7, 8) b(dj)
  WHERE a.di * a.di + b.dj * b.dj <= 49
),
contrib AS MATERIALIZED (
  SELECT (((c.gi + o.di) % 512) + 512) % 512 AS gi, c.gj + o.dj AS gj,
         SUM(c.v) AS s, COUNT(*) AS n
  FROM cnt c CROSS JOIN offs o
  GROUP BY 1, 2
),
focal AS MATERIALIZED (
  SELECT p.tx, p.ty, c.s / c.n AS fv
  FROM px p LEFT JOIN contrib c ON c.gi = p.gi AND c.gj = p.gj
)
SELECT CAST(tx AS INT) AS tile_x, CAST(ty AS INT) AS tile_y, 'mean' AS band,
       COUNT(fv) AS n_valid, ROUND(COALESCE(SUM(fv), 0.0), 4) AS tile_sum
FROM focal GROUP BY 1, 2
"""


def sq_focal_multi(spark: SparkSession, sf: str) -> DataFrame:
    """W1/W3/W4 family in one halo exchange: square sum, gaussian
    weighted mean, max."""
    from engine import kernels, tiling, udfs
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    level, T = 9, 32
    docs = shim.documents_interleaved(spark, sf)
    pts = udfs.with_cell_and_tile(udfs.geocode_cols(docs), level, T)
    tiles = tiling.rasterize(pts, T, level, stat="count")
    stats = {
        "sum": kernels.focal_sum,
        "max": lambda a, r, s: kernels.focal_extremum(a, r, s, "max"),
        "wmean_gauss": lambda a, r, s: kernels.focal_weighted_mean(a, r, "gaussian"),
        # round 4: population std — exact on this integer-count raster
        # (SAT partial sums of ints are order-free), so the oracle's
        # contribution-form sums land bit-identically
        "std": kernels.focal_std,
        # round 4 (W33): exact focal MEDIAN — rank ceil(n/2) over the
        # window's valid integer counts, zero float arithmetic
        "median": lambda a, r, s: kernels.focal_percentile(a, r, 0.5, s),
    }
    out = tiling.apply_focal(
        tiles, 5, "square", stats, T, level=level, wrap_nx=(2**level) // T
    )
    return _tile_summary(out)


# Three bands in one statement. 'sum' over the square r=5 window is 0
# (never NaN) on empty windows — all 1024 px/tile are valid; 'max' is
# NaN on empty windows; 'wmean_gauss' has CIRCULAR support d ≤ 5 with
# w = exp(-d²/12.5), where d is sqrt-then-squared to match the NumPy
# weight-mask arithmetic bit-for-bit (kernels.weight_mask).
SQ_FOCAL_MULTI_SQL = f"""
WITH {_CNT_SQL},
sq AS (
  SELECT a.di AS di, b.dj AS dj FROM range(-5, 6) a(di), range(-5, 6) b(dj)
),
dk AS (
  SELECT di, dj,
         EXP(-(SQRT(CAST(di * di + dj * dj AS DOUBLE))
               * SQRT(CAST(di * di + dj * dj AS DOUBLE))) / 12.5) AS w
  FROM sq WHERE di * di + dj * dj <= 25
),
csq AS (
  SELECT (((c.gi + o.di) % 512) + 512) % 512 AS gi, c.gj + o.dj AS gj,
         SUM(c.v) AS s, MAX(c.v) AS mx, SUM(c.v * c.v) AS s2,
         COUNT(*) AS n
  FROM cnt c CROSS JOIN sq o GROUP BY 1, 2
),
cwt AS (
  SELECT (((c.gi + o.di) % 512) + 512) % 512 AS gi, c.gj + o.dj AS gj,
         SUM(o.w * c.v) AS num, SUM(o.w) AS den
  FROM cnt c CROSS JOIN dk o GROUP BY 1, 2
),
medc AS (
  SELECT (((c.gi + o.di) % 512) + 512) % 512 AS gi, c.gj + o.dj AS gj,
         c.v AS v, COUNT(*) AS nv
  FROM cnt c CROSS JOIN sq o GROUP BY 1, 2, 3
),
medp AS (
  SELECT gi, gj, v,
         SUM(nv) OVER (PARTITION BY gi, gj ORDER BY v) AS cum,
         SUM(nv) OVER (PARTITION BY gi, gj) AS tot
  FROM medc
),
med AS (
  SELECT gi, gj, MIN(v) AS mv
  FROM medp WHERE cum >= CEIL(0.5 * tot) GROUP BY 1, 2
)
SELECT CAST(p.tx AS INT) AS tile_x, CAST(p.ty AS INT) AS tile_y, 'sum' AS band,
       COUNT(*) AS n_valid, ROUND(SUM(COALESCE(c.s, 0.0)), 4) AS tile_sum
FROM px p LEFT JOIN csq c ON c.gi = p.gi AND c.gj = p.gj GROUP BY 1, 2
UNION ALL
SELECT CAST(p.tx AS INT), CAST(p.ty AS INT), 'max',
       COUNT(c.mx), ROUND(COALESCE(SUM(c.mx), 0.0), 4)
FROM px p LEFT JOIN csq c ON c.gi = p.gi AND c.gj = p.gj GROUP BY 1, 2
UNION ALL
SELECT CAST(p.tx AS INT), CAST(p.ty AS INT), 'wmean_gauss',
       COUNT(c.num), ROUND(COALESCE(SUM(c.num / c.den), 0.0), 4)
FROM px p LEFT JOIN cwt c ON c.gi = p.gi AND c.gj = p.gj GROUP BY 1, 2
UNION ALL
-- std over VALID cells only (docless pixels are nodata in the engine's
-- sparse count raster, NOT zeros): n = contributing doc pixels in the
-- window; a center with an empty window is invalid (NULL-excluded)
SELECT CAST(p.tx AS INT), CAST(p.ty AS INT), 'std',
       COUNT(c.n),
       ROUND(COALESCE(SUM(
         SQRT(GREATEST(c.s2 / c.n - (c.s / c.n) * (c.s / c.n), 0.0))
       ), 0.0), 4)
FROM px p LEFT JOIN csq c ON c.gi = p.gi AND c.gj = p.gj
GROUP BY 1, 2
UNION ALL
-- W33 focal median: rank ceil(n/2) over valid window cells — integer
-- values, so the tile sum is exact in both engines
SELECT CAST(p.tx AS INT), CAST(p.ty AS INT), 'median',
       COUNT(m.mv), ROUND(COALESCE(SUM(m.mv), 0.0), 4)
FROM px p LEFT JOIN med m ON m.gi = p.gi AND m.gj = p.gj
GROUP BY 1, 2
"""


def sq_pip_polygons(spark: SparkSession, sf: str) -> DataFrame:
    """J1+J2 on the full fixture polygon set (convex quad, concave
    star, antimeridian-crossing rect, square-with-HOLE) through the
    generic engine path (cell cover + vectorized ray-cast refine); the
    oracle replicates the pinned §5.3.6 semantics as edge-table
    arithmetic — hole edges join the same per-(doc, poly) parity sum,
    so even-odd hole exclusion falls out of the identical SQL."""
    from engine import fixtures, joins
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    d = spark.read.parquet(f"{sf}/documents.parquet")
    pts = d.select(
        "doc_id",
        shim.shim_lat_col(F.col("doc_id")).alias("lat"),
        shim.shim_lon_col(F.col("doc_id")).alias("lon"),
    )
    hits = joins.pip_join(pts, fixtures.polygons_holed(), level=6, spark=spark)
    return hits.groupBy("poly_id").agg(
        F.count(F.lit(1)).alias("n_pts"), F.sum("doc_id").alias("docid_sum")
    )


def _pip_oracle_sql() -> str:
    """Ray-cast PIP as SQL over an inlined edge table — the identical
    arithmetic (and operation order) as geometry.point_in_polygon:
    strict upper-endpoint crossing rule, boundary-eps = inside, point
    lon reframed into [ring_lon_min, ring_lon_min+360) via the exact
    fmod-then-conditional-add numpy remainder semantics."""
    from engine import fixtures

    rows = []
    for p in fixtures.polygons_holed():
        # every ring (outer + holes) contributes edges; each ring
        # reframes point lons by ITS OWN lon minimum, so the summed
        # parity is the XOR of per-ring parities (even-odd with holes)
        for ring in [p["ring"]] + list(p.get("holes") or []):
            lo_min = min(v["lon"] for v in ring)
            for k in range(len(ring) - 1):
                a, b = ring[k], ring[k + 1]
                rows.append(
                    f"({p['poly_id']}, {lo_min!r}, {a['lat']!r}, {a['lon']!r}, "
                    f"{b['lat']!r}, {b['lon']!r})"
                )
    edges = ",\n    ".join(rows)
    return f"""
WITH pts AS (
  SELECT doc_id, {shim.SHIM_LAT_SQL} AS lat, {shim.SHIM_LON_SQL} AS lon
  FROM documents
),
edges(poly_id, lo_min, la1, lo1, la2, lo2) AS (
  VALUES
    {edges}
),
t AS (
  SELECT p.doc_id, e.poly_id, e.la1, e.lo1, e.la2, e.lo2, p.lat,
         e.lo_min + (CASE WHEN (p.lon - e.lo_min) % 360.0 < 0
                          THEN (p.lon - e.lo_min) % 360.0 + 360.0
                          ELSE (p.lon - e.lo_min) % 360.0 END) AS lon
  FROM pts p CROSS JOIN edges e
),
j AS (
  SELECT doc_id, poly_id,
         ABS((lo2 - lo1) * (lat - la1) - (la2 - la1) * (lon - lo1))
           <= 1e-12 * GREATEST(1.0, SQRT((lo2 - lo1) * (lo2 - lo1)
                                         + (la2 - la1) * (la2 - la1)))
         AND lat >= LEAST(la1, la2) - 1e-12 AND lat <= GREATEST(la1, la2) + 1e-12
         AND lon >= LEAST(lo1, lo2) - 1e-12 AND lon <= GREATEST(lo1, lo2) + 1e-12
           AS on_edge,
         CASE WHEN (la1 > lat) <> (la2 > lat)
                   AND lon < lo1 + (lat - la1) / (la2 - la1) * (lo2 - lo1)
              THEN 1 ELSE 0 END AS crossed
  FROM t
),
hits AS (
  SELECT doc_id, poly_id FROM j GROUP BY doc_id, poly_id
  HAVING BOOL_OR(on_edge) OR SUM(crossed) % 2 = 1
)
SELECT CAST(poly_id AS BIGINT) AS poly_id, COUNT(*) AS n_pts,
       CAST(SUM(doc_id) AS BIGINT) AS docid_sum
FROM hits GROUP BY 1
"""


def sq_patch_stats(spark: SparkSession, sf: str) -> DataFrame:
    """W11–W14: distributed CCL + edge-corrected patch statistics over
    the ARITHMETIC raster fixture (fixtures.raster_arith — DuckDB
    regenerates the identical grid), summarized per tile. Also
    golden-tested per cell in tests/test_patches.py."""
    from engine import fixtures, patches
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    arr = fixtures.raster_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="class"),
        fixtures.TILES_SCHEMA_DDL,
    )
    out = patches.apply_patch_stats(tiles, 16, r=3, shape="square", spark=spark)
    return _tile_summary(out)


# Shared oracle CTEs regenerating fixtures.raster_arith (Voronoi of 12
# hash-placed sites, class = site mod 4, hash speckle + solid nodata
# block) and its rook CCL as a recursive reachability closure: a
# component's label is its MIN cell id — exactly the engine's canonical
# patch id (engine/patches.py build_patches).
_RASTER_ARITH_SQL = """
sites AS (
  SELECT k,
         ((k * 2654435761) % 4294967296) / 4294967296 * 64 AS sx,
         ((k * 2246822519) % 4294967296) / 4294967296 * 64 AS sy,
         (k - 1) % 4 AS klass
  FROM range(1, 13) t(k)
),
grid0 AS (SELECT x.i AS i, y.j AS j FROM range(0, 64) x(i), range(0, 64) y(j)),
vor AS MATERIALIZED (
  SELECT i, j, klass FROM (
    SELECT g.i, g.j, s.klass,
           ROW_NUMBER() OVER (
             PARTITION BY g.i, g.j
             ORDER BY (g.i + 0.5 - s.sx) * (g.i + 0.5 - s.sx)
                      + (g.j + 0.5 - s.sy) * (g.j + 0.5 - s.sy), s.k
           ) AS rn
    FROM grid0 g CROSS JOIN sites s
  ) WHERE rn = 1
),
cells AS MATERIALIZED (
  SELECT i, j, klass, j * 64 + i AS id
  FROM vor
  WHERE NOT (((i * 2654435761 + j * 40503 + 7) % 4294967296) < 0.05 * 4294967296)
    AND NOT (i BETWEEN 30 AND 33 AND j BETWEEN 14 AND 17)
),
adj AS (
  SELECT a.id AS a, b.id AS b
  FROM cells a JOIN cells b ON a.klass = b.klass
   AND ((ABS(a.i - b.i) = 1 AND a.j = b.j) OR (a.i = b.i AND ABS(a.j - b.j) = 1))
)
"""

_RASTER_CCL_SQL = f"""{_RASTER_ARITH_SQL},
runs AS MATERIALIZED (
  -- gaps-and-islands: maximal same-class horizontal runs; run_id =
  -- MIN cell id of the run. Propagating over the run graph instead of
  -- the cell graph shrinks the closure ~10x (a 64x64 fixture has
  -- ~4k cells but only ~hundreds of runs) — the cell-level closure
  -- made this oracle the 20 s outlier of the correctness gate.
  SELECT i, j, klass, id,
         MIN(id) OVER (PARTITION BY j, klass, i - rn) AS run_id
  FROM (
    SELECT c.*, ROW_NUMBER() OVER (PARTITION BY j, klass ORDER BY i) AS rn
    FROM cells c
  )
),
redge AS MATERIALIZED (
  SELECT DISTINCT a.run_id AS a, b.run_id AS b
  FROM runs a JOIN runs b
    ON b.i = a.i AND b.j = a.j + 1 AND b.klass = a.klass
   AND a.run_id <> b.run_id
),
und AS MATERIALIZED (SELECT a, b FROM redge UNION SELECT b AS a, a AS b FROM redge),
reach AS (
  SELECT run_id AS id, run_id AS lab FROM (SELECT DISTINCT run_id FROM runs)
  UNION
  SELECT e.b AS id, r.lab FROM reach r JOIN und e ON e.a = r.id
),
rroots AS (SELECT id AS run_id, MIN(lab) AS root FROM reach GROUP BY id),
roots AS (SELECT r.id, rr.root FROM runs r JOIN rroots rr USING (run_id))
"""

# W11–W13 edge-corrected focal stats, contribution form over the
# derived planes (inv_area = 1/patch area, si = 0.25·perim/√area):
#   mean_patch_size = n/Σinv_area, patch_density = Σinv_area/n,
#   awmsi = Σsi/n over valid cells in the Chebyshev-3 window.
SQ_PATCH_STATS_SQL = f"""
WITH RECURSIVE {_RASTER_CCL_SQL},
deg AS (
  SELECT c.id, COUNT(e.b) AS d FROM cells c LEFT JOIN adj e ON e.a = c.id GROUP BY c.id
),
pt AS (
  SELECT r.root, COUNT(*) AS area, SUM(4 - d.d) AS perimeter
  FROM roots r JOIN deg d ON d.id = r.id GROUP BY r.root
),
planes AS MATERIALIZED (
  SELECT c.i, c.j, 1.0 / pt.area AS inv_area,
         0.25 * pt.perimeter / SQRT(CAST(pt.area AS DOUBLE)) AS si
  FROM cells c JOIN roots r ON r.id = c.id JOIN pt ON pt.root = r.root
),
offs AS (SELECT a.di AS di, b.dj AS dj FROM range(-3, 4) a(di), range(-3, 4) b(dj)),
contrib AS MATERIALIZED (
  SELECT p.i + o.di AS ci, p.j + o.dj AS cj,
         COUNT(*) AS n, SUM(p.inv_area) AS s_inv, SUM(p.si) AS s_si
  FROM planes p CROSS JOIN offs o
  GROUP BY 1, 2
),
focal AS MATERIALIZED (
  SELECT g.i // 16 AS tx, g.j // 16 AS ty, c.n AS n, c.s_inv AS s_inv, c.s_si AS s_si
  FROM grid0 g LEFT JOIN contrib c ON c.ci = g.i AND c.cj = g.j
)
SELECT CAST(tx AS INT) AS tile_x, CAST(ty AS INT) AS tile_y,
       'mean_patch_size' AS band, COUNT(n) AS n_valid,
       ROUND(COALESCE(SUM(n / s_inv), 0.0), 4) AS tile_sum
FROM focal GROUP BY 1, 2
UNION ALL
SELECT CAST(tx AS INT), CAST(ty AS INT), 'patch_density',
       COUNT(n), ROUND(COALESCE(SUM(s_inv / n), 0.0), 4)
FROM focal GROUP BY 1, 2
UNION ALL
SELECT CAST(tx AS INT), CAST(ty AS INT), 'awmsi',
       COUNT(n), ROUND(COALESCE(SUM(s_si / n), 0.0), 4)
FROM focal GROUP BY 1, 2
"""


def sq_raster_to_vector(spark: SparkSession, sf: str) -> DataFrame:
    """M6 raster→vector: polygonize patch labels into boundary rings
    (round-trip golden in tests/test_vector.py). Per patch: total
    corner count Σ(n_pts−1) over all rings (holes included) and net
    signed area (= the patch's cell count) — both SQL-predictable:
    corners are the 2×2 vertex patterns with 1/3 patch cells (+2 for a
    diagonal pinch), verified against the chained rings in tests."""
    from engine import fixtures, patches, vector
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    arr = fixtures.raster_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="class"),
        fixtures.TILES_SCHEMA_DDL,
    )
    label_tiles, _ = patches.build_patches(tiles, 16, spark)
    rings = vector.polygonize(label_tiles, 16)
    return rings.groupBy("patch_id").agg(
        F.sum(F.col("n_pts").cast("long") - 1).alias("n_corners"),
        F.round(F.sum("signed_area"), 1).alias("net_area"),
    )


SQ_RASTER_TO_VECTOR_SQL = f"""
WITH RECURSIVE {_RASTER_CCL_SQL},
labelled AS (SELECT c.i, c.j, r.root FROM cells c JOIN roots r ON r.id = c.id),
quads AS (
  SELECT root, i + 1 AS vx, j + 1 AS vy, 1 AS q FROM labelled  -- cell NW of vertex
  UNION ALL SELECT root, i, j + 1, 2 FROM labelled             -- cell NE
  UNION ALL SELECT root, i + 1, j, 4 FROM labelled             -- cell SW
  UNION ALL SELECT root, i, j, 8 FROM labelled                 -- cell SE
),
verts AS (
  SELECT root, vx, vy, COUNT(*) AS cnt, SUM(q) AS qsum
  FROM quads GROUP BY 1, 2, 3
),
corners AS (
  SELECT root,
         SUM(CASE WHEN cnt IN (1, 3) THEN 1
                  WHEN cnt = 2 AND qsum IN (9, 6) THEN 2
                  ELSE 0 END) AS n_corners
  FROM verts GROUP BY root
),
areas AS (SELECT root, COUNT(*) AS area FROM labelled GROUP BY root)
SELECT CAST((c.root // 64) * 4294967296 + c.root % 64 AS BIGINT) AS patch_id,
       CAST(c.n_corners AS BIGINT) AS n_corners,
       ROUND(CAST(a.area AS DOUBLE), 1) AS net_area
FROM corners c JOIN areas a ON a.root = c.root
"""


def sq_multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal span decode (REAL decode, round 4 — see
    engine/multimodal.py): the shim-interleaved corpus gets an extra
    'image' and 'audio' span per doc; deterministic REAL media bytes
    (binary PPM images, RIFF/WAV PCM16 audio) are synthesized per
    media row, the mapInPandas decoder PARSES them (headers, strides,
    chunk walks — no knowledge of the generator), and per-kind
    aggregates of the decoded width/frames/features are hash-checked
    against an oracle that mirrors the generation+decode arithmetic
    (md5-seeded dimensions, linear byte/sample ramps summed over a
    range join)."""
    from engine import multimodal
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    docs = shim.documents_interleaved(spark, sf)
    img_span = F.struct(
        F.lit("image").alias("kind"),
        F.lit("").alias("text"),
        F.concat(F.lit("img:"), F.substring(F.md5("doc_id"), 1, 12)).alias("media_ref"),
        F.lit(0).cast("int").alias("offset"),
    )
    aud_span = F.struct(
        F.lit("audio").alias("kind"),
        F.lit("").alias("text"),
        F.concat(F.lit("aud:"), F.substring(F.md5("doc_id"), 13, 12)).alias("media_ref"),
        F.lit(0).cast("int").alias("offset"),
    )
    docs = docs.withColumn(
        "spans", F.concat("spans", F.array(img_span, aud_span))
    )
    feats = multimodal.extract_media_features(
        docs, kinds=("image", "geo", "audio")
    )
    return feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.col("width").cast("long")).alias("width_sum"),
        F.sum(F.col("n_frames").cast("long")).alias("frames_sum"),
        F.round(F.sum(F.aggregate("feat", F.lit(0.0), lambda a, x: a + x)), 4).alias("feat_sum"),
    )


def _md5_byte_sql(expr: str, k: int) -> str:
    """SQL for byte k of md5(expr) (hex-digit expansion — no unhex in
    the pinned DuckDB)."""
    d1 = f"(strpos('0123456789abcdef', substr(md5({expr}), {2 * k + 1}, 1)) - 1)"
    d2 = f"(strpos('0123456789abcdef', substr(md5({expr}), {2 * k + 2}, 1)) - 1)"
    return f"({d1} * 16 + {d2})"


def _multimodal_oracle_sql() -> str:
    # md5 bytes of the REF seed the fixture generator
    # (engine/multimodal.synth_payload); the oracle mirrors the
    # generation + REAL-decode arithmetic: image bytes are the ramp
    # (seed + 5m) % 256 over m = 3k + channel, audio samples the ramp
    # ((seed + 11k) % 4096) - 2048 — both summed via a range join
    # (DuckDB range() takes no lateral params). float32 casts mirror
    # the decoder's per-element np.float32 exactly; the per-row fold
    # order matches the engine's left-assoc array aggregate.
    b0, b1, b3, b4, b5, b6 = (
        _md5_byte_sql("ref", k) for k in (0, 1, 3, 4, 5, 6)
    )
    return f"""
WITH pts AS (
  SELECT doc_id, {shim.SHIM_LAT_SQL} AS lat, {shim.SHIM_LON_SQL} AS lon
  FROM documents
),
media AS (
  SELECT 'geo' AS kind,
         'geo:' || printf('%.6f', lat) || ',' || printf('%.6f', lon) AS ref,
         CAST(printf('%.6f', lat) AS DOUBLE) AS lat6,
         CAST(printf('%.6f', lon) AS DOUBLE) AS lon6
  FROM pts
  UNION ALL
  SELECT 'image', 'img:' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12),
         NULL, NULL
  FROM pts
  UNION ALL
  SELECT 'audio', 'aud:' || substr(md5(CAST(doc_id AS VARCHAR)), 13, 12),
         NULL, NULL
  FROM pts
),
dims AS (
  SELECT kind, ref, lat6, lon6,
         4 + {b0} % 13 AS w, 3 + {b1} % 11 AS h, {b3} AS iseed,
         64 + {b4} % 64 AS n, {b5} * 256 + {b6} AS aseed
  FROM media
),
rng AS (SELECT k FROM range(0, 256) t(k)),
sums AS (
  SELECT d.kind, d.ref, d.lat6, d.lon6, d.w, d.h, d.n,
         SUM(CASE WHEN d.kind = 'image' AND r.k < d.w * d.h
             THEN (d.iseed + 15 * r.k) % 256 END) AS sr,
         SUM(CASE WHEN d.kind = 'image' AND r.k < d.w * d.h
             THEN (d.iseed + 15 * r.k + 5) % 256 END) AS sg,
         SUM(CASE WHEN d.kind = 'image' AND r.k < d.w * d.h
             THEN (d.iseed + 15 * r.k + 10) % 256 END) AS sb,
         SUM(CASE WHEN d.kind = 'audio' AND r.k < d.n
             THEN ((d.aseed + 11 * r.k) % 4096) - 2048 END) AS ss
  FROM dims d JOIN rng r ON r.k < CASE WHEN d.kind = 'image' THEN d.w * d.h
                                       WHEN d.kind = 'audio' THEN d.n
                                       ELSE 1 END
  GROUP BY ALL
),
rowfeat AS (
  SELECT kind,
         CASE kind WHEN 'image' THEN w WHEN 'audio' THEN 8000 ELSE 0 END
           AS width,
         CASE kind WHEN 'audio' THEN n ELSE 1 END AS n_frames,
         CASE kind
           WHEN 'image' THEN
             CAST(CAST((CAST(sr AS DOUBLE) / (w * h)) / 255.0 AS REAL) AS DOUBLE)
             + CAST(CAST((CAST(sg AS DOUBLE) / (w * h)) / 255.0 AS REAL) AS DOUBLE)
             + CAST(CAST((CAST(sb AS DOUBLE) / (w * h)) / 255.0 AS REAL) AS DOUBLE)
             + CAST(CAST(w / 256.0 AS REAL) AS DOUBLE)
             + CAST(CAST(h / 256.0 AS REAL) AS DOUBLE)
           WHEN 'audio' THEN
             CAST(CAST((CAST(ss AS DOUBLE) / n) / 2048.0 AS REAL) AS DOUBLE)
             + CAST(CAST(n / 4096.0 AS REAL) AS DOUBLE)
             + CAST(CAST(8000 / 48000.0 AS REAL) AS DOUBLE)
           ELSE
             CAST(CAST(lat6 / 90.0 AS REAL) AS DOUBLE)
             + CAST(CAST(lon6 / 180.0 AS REAL) AS DOUBLE)
         END AS feat
  FROM sums
)
SELECT kind, COUNT(*) AS n_media,
       CAST(SUM(width) AS BIGINT) AS width_sum,
       CAST(SUM(n_frames) AS BIGINT) AS frames_sum,
       ROUND(SUM(feat), 4) AS feat_sum
FROM rowfeat GROUP BY kind
"""


def sq_terrain(spark: SparkSession, sf: str) -> DataFrame:
    """Terrain surface in one driver row: slope / aspect / hillshade
    (Horn 3x3), the round-3 TPI / TRI / roughness / curvature bands,
    PLUS hydrology — D8 flow direction, the distributed inter-tile
    flow ACCUMULATION fixpoint, watershed, Strahler (engine/flow.py),
    and the round-4 conditioning pipeline (engine/fill.py: pitted DEM
    -> bounded Priority-Flood fill -> D8 -> accumulation, bands
    'fill'/'fillacc') — per-tile quantized summary. Pinned semantics in the
    terrain/flow module docstrings; the oracle regenerates the DEM,
    differentiates it with a 9-offset neighbor join, and replays the
    flow paths with a recursive CTE."""
    from engine import fixtures, flow, kernels, terrain, tiling
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    arr = fixtures.dem_arith(size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    # round 4: the generic 3x3 convolution filters ride the SAME halo
    # pass as the terrain family (one exchange, one applyInPandas)
    out = tiling.apply_focal(
        tiles, 1, "square",
        {
            **terrain.TERRAIN_KERNELS,
            "sobelx": kernels.focal_sobel_x,
            "sobely": kernels.focal_sobel_y,
            "laplace": kernels.focal_laplacian,
        },
        16, level=10,
    )
    dir_tiles = flow.flow_direction(tiles, 16, level=10)
    acc_tiles = flow.flow_accumulation(
        dir_tiles, 16, level=10
    ).localCheckpoint(eager=True)
    # WEIGHTED accumulation (round 4, upstream runoff routing): each
    # cell contributes a small exact-integer weight, so the float
    # accumulation is exact and the micro-unit tile sums match the
    # oracle's closure SUM bit-for-bit
    import numpy as np

    yy, xx = np.mgrid[0:64, 0:64]
    warr = ((xx * 7 + yy * 3) % 5 + 1).astype(np.float64)
    w_tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(warr, 16, band="w"),
        fixtures.TILES_SCHEMA_DDL,
    )
    accw_tiles = flow.flow_accumulation(
        dir_tiles, 16, level=10,
        weight_tiles=w_tiles, band="flowaccw",
    )
    # Strahler stream order over the acc >= 8 network (round 4): orders
    # are small exact integers, so the micro-unit tile sum is exact
    strahler_tiles = flow.strahler(
        dir_tiles, acc_tiles, 16, threshold=8.0, level=10
    )
    # watershed ids are pit global indices (gy<<32|gx) — too large for
    # the micro-unit integer sum, so its summary is the DISTINCT BASIN
    # COUNT per tile instead (exact integers in both engines)
    ws_tiles = flow.watershed(dir_tiles, 16, level=10)
    ws_valid = F.filter("data", lambda x: x.isNotNull() & ~F.isnan(x))
    ws_rows = ws_tiles.select(
        "tile_x",
        "tile_y",
        "band",
        F.size(ws_valid).cast("long").alias("n_valid"),
        F.size(F.array_distinct(ws_valid)).cast("double").alias("tile_sum"),
    )
    # hydrological conditioning (round 4, engine/fill.py): pitted DEM
    # -> bounded Priority-Flood fill -> D8 -> accumulation, end to end
    # driver-visible. cap = T = 16 on the 48x48 fixture makes every
    # halo window cover the raster, so the bounded fill is exact and
    # the oracle can mirror the GLOBAL minimax fixpoint (Jacobi
    # relaxation in a recursive CTE).
    from engine import fill

    pit = fixtures.dem_pitted(size=48)
    pit_tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(pit, 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )
    fill_tiles = fill.fill_depressions(
        pit_tiles, 16, cap=16, level=10
    ).localCheckpoint(eager=True)
    facc_tiles = flow.flow_accumulation(
        flow.flow_direction(fill_tiles, 16, level=10), 16, level=10
    ).withColumn("band", F.lit("fillacc"))
    return _tile_summary_quantized(
        out.unionByName(dir_tiles)
        .unionByName(acc_tiles)
        .unionByName(accw_tiles)
        .unionByName(strahler_tiles)
        .unionByName(fill_tiles)
        .unionByName(facc_tiles)
    ).unionByName(ws_rows)


# regenerates fixtures.dem_arith exactly (quadratic saddle, 3% hash
# speckle, solid 4x4 block) — shared by the terrain and zonal oracles
_DEM_SQL = """
dem AS MATERIALIZED (
  SELECT i, j,
         0.002 * (i - 20.0) * (i - 35.0)
         + 0.003 * (j - 10.0) * (j - 50.0)
         + 0.0004 * i * j AS z
  FROM (SELECT x.i AS i, y.j AS j FROM range(0, 64) x(i), range(0, 64) y(j))
  WHERE NOT (((i * 2654435761 + j * 40503 + 13) % 4294967296) < 0.03 * 4294967296)
    AND NOT (i BETWEEN 8 AND 11 AND j BETWEEN 40 AND 43)
)
"""

SQ_TERRAIN_SQL = f"""
WITH RECURSIVE {_DEM_SQL},
offs(dx, dy, wx, wy) AS (VALUES
  (-1, -1, -1.0, -1.0), (0, -1, 0.0, -2.0), (1, -1, 1.0, -1.0),
  (-1,  0, -2.0,  0.0), (0,  0, 0.0,  0.0), (1,  0, 2.0,  0.0),
  (-1,  1, -1.0,  1.0), (0,  1, 0.0,  2.0), (1,  1, 1.0,  1.0)
),
grad AS MATERIALIZED (
  SELECT c.i, c.j,
         SUM(o.wx * d.z) / 8.0 AS gx,
         SUM(o.wy * d.z) / 8.0 AS gy,
         COUNT(d.z) AS nn,
         -- the nine window cells individually (y-down: n = dy -1), for
         -- the round-3 bands — combined with LEFT-ASSOCIATIVE sums
         -- below to match NumPy's fold order bit-for-bit
         SUM(CASE WHEN o.dx =  0 AND o.dy =  0 THEN d.z END) AS z,
         SUM(CASE WHEN o.dx = -1 AND o.dy = -1 THEN d.z END) AS nwz,
         SUM(CASE WHEN o.dx =  0 AND o.dy = -1 THEN d.z END) AS nz,
         SUM(CASE WHEN o.dx =  1 AND o.dy = -1 THEN d.z END) AS nez,
         SUM(CASE WHEN o.dx = -1 AND o.dy =  0 THEN d.z END) AS wz,
         SUM(CASE WHEN o.dx =  1 AND o.dy =  0 THEN d.z END) AS ez,
         SUM(CASE WHEN o.dx = -1 AND o.dy =  1 THEN d.z END) AS swz,
         SUM(CASE WHEN o.dx =  0 AND o.dy =  1 THEN d.z END) AS sz,
         SUM(CASE WHEN o.dx =  1 AND o.dy =  1 THEN d.z END) AS sez
  FROM dem c
  JOIN offs o ON TRUE
  LEFT JOIN dem d ON d.i = c.i + o.dx AND d.j = c.j + o.dy
  WHERE c.i + o.dx BETWEEN 0 AND 63 AND c.j + o.dy BETWEEN 0 AND 63
  GROUP BY 1, 2
),
vals AS MATERIALIZED (
  SELECT i // 16 AS tx, j // 16 AS ty,
         DEGREES(ATAN(SQRT(gx * gx + gy * gy))) AS slope,
         CASE WHEN gx = 0 AND gy = 0 THEN NULL
              ELSE (DEGREES(ATAN2(-gx, gy)) + 360.0) % 360.0 END AS aspect,
         255.0 * GREATEST(0.0,
           (0.7071067811865476
            + 0.7071067811865476
              * (0.7071067811865476 * gy - (-0.7071067811865476) * gx))
           / SQRT(1.0 + gx * gx + gy * gy)) AS hillshade,
         -- TPI: c − mean8, neighbor sum folded [nw,n,ne,w,e,sw,s,se]
         z - (((((((nwz + nz) + nez) + wz) + ez) + swz) + sz) + sez) / 8.0
           AS tpi,
         -- TRI (Riley): sqrt of left-folded Σ (nb − c)², same order
         SQRT((((((((nwz-z)*(nwz-z) + (nz-z)*(nz-z)) + (nez-z)*(nez-z))
               + (wz-z)*(wz-z)) + (ez-z)*(ez-z)) + (swz-z)*(swz-z))
               + (sz-z)*(sz-z)) + (sez-z)*(sez-z)) AS tri,
         GREATEST(z, nwz, nz, nez, wz, ez, swz, sz, sez)
           - LEAST(z, nwz, nz, nez, wz, ez, swz, sz, sez) AS rough,
         -- general curvature (Zevenbergen–Thorne / ESRI): −2(D+E)·100,
         -- D = ((w+e)/2 − z)/L², E = ((n+s)/2 − z)/L², L = 1
         -2.0 * (((wz + ez) / 2.0 - z) + ((nz + sz) / 2.0 - z)) * 100.0
           AS curv,
         -- round-4 convolution filters, pinned folds (engine/kernels)
         (nez + 2.0 * ez + sez) - (nwz + 2.0 * wz + swz) AS sobelx,
         (swz + 2.0 * sz + sez) - (nwz + 2.0 * nz + nez) AS sobely,
         (((nz + sz) + wz) + ez) - 4.0 * z AS laplace
  FROM grad WHERE nn = 9
),
tiles0 AS (SELECT a.tx AS tx, b.ty AS ty FROM range(0, 4) a(tx), range(0, 4) b(ty)),
-- D8 hydrology mirror (engine/flow.py): pinned ESRI codes, y-down,
-- pinned sqrt2 literal; tie rule = max drop then LOWEST code
d8off(code, dj, di, dist) AS (VALUES
  (1, 0, 1, 1.0), (2, 1, 1, 1.4142135623730951), (4, 1, 0, 1.0),
  (8, 1, -1, 1.4142135623730951), (16, 0, -1, 1.0),
  (32, -1, -1, 1.4142135623730951), (64, -1, 0, 1.0),
  (128, -1, 1, 1.4142135623730951)
),
fdir AS MATERIALIZED (
  SELECT c.i, c.j, COALESCE(r.code, 0) AS code
  FROM dem c LEFT JOIN (
    SELECT i, j, code FROM (
      SELECT c2.i AS i, c2.j AS j, o.code,
             ROW_NUMBER() OVER (
               PARTITION BY c2.i, c2.j
               ORDER BY (c2.z - n.z) / o.dist DESC, o.code ASC
             ) AS rn
      FROM dem c2 JOIN d8off o ON TRUE
      JOIN dem n ON n.i = c2.i + o.di AND n.j = c2.j + o.dj
      WHERE (c2.z - n.z) / o.dist > 0
    ) WHERE rn = 1
  ) r ON r.i = c.i AND r.j = c.j
),
recv AS MATERIALIZED (
  SELECT f.i, f.j, f.i + o.di AS ri, f.j + o.dj AS rj
  FROM fdir f JOIN d8off o ON o.code = f.code
  WHERE f.code > 0
),
walk(si, sj, ci, cj) AS (
  SELECT i, j, i, j FROM fdir
  UNION ALL
  SELECT w.si, w.sj, r.ri, r.rj
  FROM walk w JOIN recv r ON r.i = w.ci AND r.j = w.cj
),
facc AS MATERIALIZED (
  SELECT ci AS i, cj AS j, CAST(COUNT(*) AS DOUBLE) AS acc
  FROM walk GROUP BY 1, 2
),
-- weighted accumulation mirror: upstream-closure SUM of the exact
-- integer weight plane w(i,j) = (i*7 + j*3) % 5 + 1
faccw AS MATERIALIZED (
  SELECT ci AS i, cj AS j,
         CAST(SUM((w.si * 7 + w.sj * 3) % 5 + 1) AS DOUBLE) AS acc
  FROM walk w GROUP BY 1, 2
),
-- Strahler mirror (engine/flow.strahler, theta = 8): network = cells
-- with acc >= 8; the unrolled S_k characterization — ord(c) >= k+1 iff
-- some cell in c's upstream closure (walk gives closure pairs) has
-- >= 2 immediate network inflows of order >= k; Strahler order is
-- non-decreasing downstream, which makes the closure form exact.
-- Max order on this fixture is 4 (asserted by the pytest golden), so
-- four levels suffice.
net AS MATERIALIZED (SELECT i, j FROM facc WHERE acc >= 8.0),
nedges AS MATERIALIZED (
  SELECT r.i, r.j, r.ri, r.rj
  FROM recv r JOIN net n ON n.i = r.i AND n.j = r.j
),
junc1 AS (SELECT ri, rj FROM nedges GROUP BY ri, rj HAVING COUNT(*) >= 2),
s2 AS MATERIALIZED (
  SELECT DISTINCT w.ci AS i, w.cj AS j
  FROM walk w JOIN junc1 x ON x.ri = w.si AND x.rj = w.sj
),
junc2 AS (
  SELECT e.ri, e.rj FROM nedges e JOIN s2 ON s2.i = e.i AND s2.j = e.j
  GROUP BY e.ri, e.rj HAVING COUNT(*) >= 2
),
s3 AS MATERIALIZED (
  SELECT DISTINCT w.ci AS i, w.cj AS j
  FROM walk w JOIN junc2 x ON x.ri = w.si AND x.rj = w.sj
),
junc3 AS (
  SELECT e.ri, e.rj FROM nedges e JOIN s3 ON s3.i = e.i AND s3.j = e.j
  GROUP BY e.ri, e.rj HAVING COUNT(*) >= 2
),
s4 AS MATERIALIZED (
  SELECT DISTINCT w.ci AS i, w.cj AS j
  FROM walk w JOIN junc3 x ON x.ri = w.si AND x.rj = w.sj
),
junc4 AS (
  SELECT e.ri, e.rj FROM nedges e JOIN s4 ON s4.i = e.i AND s4.j = e.j
  GROUP BY e.ri, e.rj HAVING COUNT(*) >= 2
),
s5 AS MATERIALIZED (
  SELECT DISTINCT w.ci AS i, w.cj AS j
  FROM walk w JOIN junc4 x ON x.ri = w.si AND x.rj = w.sj
),
strahl AS MATERIALIZED (
  SELECT n.i, n.j,
         1 + (s2.i IS NOT NULL)::INT + (s3.i IS NOT NULL)::INT
           + (s4.i IS NOT NULL)::INT + (s5.i IS NOT NULL)::INT AS ord
  FROM net n
  LEFT JOIN s2 ON s2.i = n.i AND s2.j = n.j
  LEFT JOIN s3 ON s3.i = n.i AND s3.j = n.j
  LEFT JOIN s4 ON s4.i = n.i AND s4.j = n.j
  LEFT JOIN s5 ON s5.i = n.i AND s5.j = n.j
),
-- hydrological conditioning mirror (engine/fill.py, round 4): the
-- pitted DEM (fixtures.dem_pitted — CAST to DOUBLE: bare 0.05 * i is
-- DECIMAL math in DuckDB and diverges at the ulp), then the fill as
-- the minimax fixpoint F = max(z, min over N8 of F) by Jacobi
-- relaxation — seeds (raster edge; the fixture has no nodata) fixed at
-- z, interiors start at 1e18, one sweep per recursion step. 96 sweeps:
-- convergence on this fixture is ~40 (information moves one cell per
-- sweep along the spill path), margin 2x. Values are exact — the
-- fixpoint only compares/copies z values, no arithmetic.
pdem AS MATERIALIZED (
  SELECT i, j,
         0.05 * CAST(i AS DOUBLE) + 0.04 * CAST(j AS DOUBLE)
         + ((i * 2654435761 + j * 40503 + 17) % 4294967296) / 4294967296.0 * 0.2
         - 0.08 * GREATEST(0.0, 36.0 - ((i - 12.0) * (i - 12.0) + (j - 14.0) * (j - 14.0)))
         - 0.05 * GREATEST(0.0, 81.0 - ((i - 33.0) * (i - 33.0) + (j - 30.0) * (j - 30.0))) AS z
  FROM (SELECT x.i AS i, y.j AS j FROM range(0, 48) x(i), range(0, 48) y(j))
),
off9(dx, dy) AS (VALUES
  (0,0),(-1,-1),(0,-1),(1,-1),(-1,0),(1,0),(-1,1),(0,1),(1,1)
),
relax(it, i, j, f) AS (
  SELECT 0, i, j,
         CASE WHEN i = 0 OR j = 0 OR i = 47 OR j = 47 THEN z ELSE 1e18 END
  FROM pdem
  UNION ALL
  SELECT r.it + 1, c.i, c.j, MIN(GREATEST(c.z, r.f))
  FROM relax r JOIN off9 o ON TRUE
  JOIN pdem c ON c.i = r.i + o.dx AND c.j = r.j + o.dy
  WHERE r.it < 96
  GROUP BY r.it + 1, c.i, c.j
),
fz AS MATERIALIZED (SELECT i, j, f FROM relax WHERE it = 96),
-- D8 + accumulation on the FILLED plane (same pinned codes/tie rule;
-- filled lakes are flats -> code 0, exactly as the engine computes)
pfdir AS MATERIALIZED (
  SELECT c.i, c.j, COALESCE(r.code, 0) AS code
  FROM fz c LEFT JOIN (
    SELECT i, j, code FROM (
      SELECT c2.i AS i, c2.j AS j, o.code,
             ROW_NUMBER() OVER (
               PARTITION BY c2.i, c2.j
               ORDER BY (c2.f - n.f) / o.dist DESC, o.code ASC
             ) AS rn
      FROM fz c2 JOIN d8off o ON TRUE
      JOIN fz n ON n.i = c2.i + o.di AND n.j = c2.j + o.dj
      WHERE (c2.f - n.f) / o.dist > 0
    ) WHERE rn = 1
  ) r ON r.i = c.i AND r.j = c.j
),
precv AS MATERIALIZED (
  SELECT f.i, f.j, f.i + o.di AS ri, f.j + o.dj AS rj
  FROM pfdir f JOIN d8off o ON o.code = f.code
  WHERE f.code > 0
),
pwalk(si, sj, ci, cj) AS (
  SELECT i, j, i, j FROM pfdir
  UNION ALL
  SELECT w.si, w.sj, r.ri, r.rj
  FROM pwalk w JOIN precv r ON r.i = w.ci AND r.j = w.cj
),
pfacc AS MATERIALIZED (
  SELECT ci AS i, cj AS j, CAST(COUNT(*) AS DOUBLE) AS acc
  FROM pwalk GROUP BY 1, 2
),
ptiles AS (SELECT a.tx AS tx, b.ty AS ty FROM range(0, 3) a(tx), range(0, 3) b(ty))
SELECT CAST(t.tx AS INT) AS tile_x, CAST(t.ty AS INT) AS tile_y, 'slope' AS band,
       COUNT(v.slope) AS n_valid, ROUND(COALESCE(SUM(CAST(ROUND(v.slope * 1000000) AS BIGINT)), 0) / 1000000.0, 4) AS tile_sum
FROM tiles0 t LEFT JOIN vals v ON v.tx = t.tx AND v.ty = t.ty GROUP BY 1, 2
UNION ALL
SELECT CAST(t.tx AS INT), CAST(t.ty AS INT), 'aspect',
       COUNT(v.aspect), ROUND(COALESCE(SUM(CAST(ROUND(v.aspect * 1000000) AS BIGINT)), 0) / 1000000.0, 4)
FROM tiles0 t LEFT JOIN vals v ON v.tx = t.tx AND v.ty = t.ty GROUP BY 1, 2
UNION ALL
SELECT CAST(t.tx AS INT), CAST(t.ty AS INT), 'hillshade',
       COUNT(v.hillshade), ROUND(COALESCE(SUM(CAST(ROUND(v.hillshade * 1000000) AS BIGINT)), 0) / 1000000.0, 4)
FROM tiles0 t LEFT JOIN vals v ON v.tx = t.tx AND v.ty = t.ty GROUP BY 1, 2
UNION ALL
SELECT CAST(t.tx AS INT), CAST(t.ty AS INT), 'tpi',
       COUNT(v.tpi), ROUND(COALESCE(SUM(CAST(ROUND(v.tpi * 1000000) AS BIGINT)), 0) / 1000000.0, 4)
FROM tiles0 t LEFT JOIN vals v ON v.tx = t.tx AND v.ty = t.ty GROUP BY 1, 2
UNION ALL
SELECT CAST(t.tx AS INT), CAST(t.ty AS INT), 'tri',
       COUNT(v.tri), ROUND(COALESCE(SUM(CAST(ROUND(v.tri * 1000000) AS BIGINT)), 0) / 1000000.0, 4)
FROM tiles0 t LEFT JOIN vals v ON v.tx = t.tx AND v.ty = t.ty GROUP BY 1, 2
UNION ALL
SELECT CAST(t.tx AS INT), CAST(t.ty AS INT), 'roughness',
       COUNT(v.rough), ROUND(COALESCE(SUM(CAST(ROUND(v.rough * 1000000) AS BIGINT)), 0) / 1000000.0, 4)
FROM tiles0 t LEFT JOIN vals v ON v.tx = t.tx AND v.ty = t.ty GROUP BY 1, 2
UNION ALL
SELECT CAST(t.tx AS INT), CAST(t.ty AS INT), 'curvature',
       COUNT(v.curv), ROUND(COALESCE(SUM(CAST(ROUND(v.curv * 1000000) AS BIGINT)), 0) / 1000000.0, 4)
FROM tiles0 t LEFT JOIN vals v ON v.tx = t.tx AND v.ty = t.ty GROUP BY 1, 2
UNION ALL
SELECT CAST(t.tx AS INT), CAST(t.ty AS INT), 'sobelx',
       COUNT(v.sobelx), ROUND(COALESCE(SUM(CAST(ROUND(v.sobelx * 1000000) AS BIGINT)), 0) / 1000000.0, 4)
FROM tiles0 t LEFT JOIN vals v ON v.tx = t.tx AND v.ty = t.ty GROUP BY 1, 2
UNION ALL
SELECT CAST(t.tx AS INT), CAST(t.ty AS INT), 'sobely',
       COUNT(v.sobely), ROUND(COALESCE(SUM(CAST(ROUND(v.sobely * 1000000) AS BIGINT)), 0) / 1000000.0, 4)
FROM tiles0 t LEFT JOIN vals v ON v.tx = t.tx AND v.ty = t.ty GROUP BY 1, 2
UNION ALL
SELECT CAST(t.tx AS INT), CAST(t.ty AS INT), 'laplace',
       COUNT(v.laplace), ROUND(COALESCE(SUM(CAST(ROUND(v.laplace * 1000000) AS BIGINT)), 0) / 1000000.0, 4)
FROM tiles0 t LEFT JOIN vals v ON v.tx = t.tx AND v.ty = t.ty GROUP BY 1, 2
UNION ALL
SELECT CAST(t.tx AS INT), CAST(t.ty AS INT), 'flowdir',
       COUNT(f.code),
       ROUND(COALESCE(SUM(CAST(ROUND(CAST(f.code AS DOUBLE) * 1000000) AS BIGINT)), 0) / 1000000.0, 4)
FROM tiles0 t LEFT JOIN fdir f ON f.i // 16 = t.tx AND f.j // 16 = t.ty
GROUP BY 1, 2
UNION ALL
SELECT CAST(t.tx AS INT), CAST(t.ty AS INT), 'flowacc',
       COUNT(a.acc),
       ROUND(COALESCE(SUM(CAST(ROUND(a.acc * 1000000) AS BIGINT)), 0) / 1000000.0, 4)
FROM tiles0 t LEFT JOIN facc a ON a.i // 16 = t.tx AND a.j // 16 = t.ty
GROUP BY 1, 2
UNION ALL
SELECT CAST(t.tx AS INT), CAST(t.ty AS INT), 'flowaccw',
       COUNT(a.acc),
       ROUND(COALESCE(SUM(CAST(ROUND(a.acc * 1000000) AS BIGINT)), 0) / 1000000.0, 4)
FROM tiles0 t LEFT JOIN faccw a ON a.i // 16 = t.tx AND a.j // 16 = t.ty
GROUP BY 1, 2
UNION ALL
SELECT CAST(t.tx AS INT), CAST(t.ty AS INT), 'strahler',
       COUNT(f.i),
       ROUND(COALESCE(SUM(CAST(ROUND(COALESCE(st.ord, 0) * 1000000.0) AS BIGINT)), 0) / 1000000.0, 4)
FROM tiles0 t
LEFT JOIN fdir f ON f.i // 16 = t.tx AND f.j // 16 = t.ty
LEFT JOIN strahl st ON st.i = f.i AND st.j = f.j
GROUP BY 1, 2
UNION ALL
SELECT CAST(t.tx AS INT), CAST(t.ty AS INT), 'watershed',
       COUNT(v.wid), CAST(COUNT(DISTINCT v.wid) AS DOUBLE)
FROM tiles0 t LEFT JOIN (
  SELECT w.si // 16 AS tx, w.sj // 16 AS ty,
         CAST(w.cj AS BIGINT) * 4294967296 + w.ci AS wid
  FROM walk w JOIN fdir f ON f.i = w.ci AND f.j = w.cj
  WHERE f.code = 0
) v ON v.tx = t.tx AND v.ty = t.ty GROUP BY 1, 2
UNION ALL
SELECT CAST(pt.tx AS INT), CAST(pt.ty AS INT), 'fill',
       COUNT(fz.f),
       ROUND(COALESCE(SUM(CAST(ROUND(fz.f * 1000000) AS BIGINT)), 0) / 1000000.0, 4)
FROM ptiles pt LEFT JOIN fz ON fz.i // 16 = pt.tx AND fz.j // 16 = pt.ty
GROUP BY 1, 2
UNION ALL
SELECT CAST(pt.tx AS INT), CAST(pt.ty AS INT), 'fillacc',
       COUNT(a.acc),
       ROUND(COALESCE(SUM(CAST(ROUND(a.acc * 1000000) AS BIGINT)), 0) / 1000000.0, 4)
FROM ptiles pt LEFT JOIN pfacc a ON a.i // 16 = pt.tx AND a.j // 16 = pt.ty
GROUP BY 1, 2
"""


def sq_zonal_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Zonal statistics (engine/zonal.py): per-zone count/sum/mean/
    min/max of the arithmetic DEM, zones = the arithmetic Voronoi
    class raster. Both grids regenerate in SQL, so the oracle is a
    plain join + GROUP BY."""
    from engine import fixtures, zonal
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    zones = fixtures.tiles_rows_from_array(
        fixtures.raster_arith(size=64), 16, band="zone"
    )
    vals = fixtures.tiles_rows_from_array(fixtures.dem_arith(size=64), 16, band="z")
    import pandas as pd

    tiles = spark.createDataFrame(
        pd.concat([zones, vals], ignore_index=True), fixtures.TILES_SCHEMA_DDL
    )
    return zonal.zonal_stats(tiles, 16, zone_band="zone", value_band="z")


SQ_ZONAL_SQL = f"""
WITH {_RASTER_ARITH_SQL},
{_DEM_SQL},
joined AS (
  SELECT c.klass AS zone, d.z AS z
  FROM cells c JOIN dem d ON d.i = c.i AND d.j = c.j
)
SELECT CAST(zone AS BIGINT) AS zone,
       COUNT(*) AS n_cells,
       ROUND(SUM(z), 4) AS z_sum,
       ROUND(SUM(z) / COUNT(*), 4) AS z_mean,
       ROUND(MIN(z), 4) AS z_min,
       ROUND(MAX(z), 4) AS z_max
FROM joined GROUP BY zone
"""


def sq_pyramid(spark: SparkSession, sf: str) -> DataFrame:
    """Overview pyramid (engine/pyramid.py): the level-9 doc-count
    raster reduced two levels (NaN-aware 2x2 mean; mean-of-means at
    the second level — the pinned overview recurrence), summarized per
    (level, tile)."""
    from engine import pyramid, tiling, udfs
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    level, T = 9, 32
    docs = shim.documents_interleaved(spark, sf)
    pts = udfs.with_cell_and_tile(udfs.geocode_cols(docs), level, T)
    tiles = tiling.rasterize(pts, T, level, stat="count")
    out = pyramid.build_pyramid(tiles, T, level=level, n_levels=2, agg="mean")
    valid = F.filter("data", lambda x: x.isNotNull() & ~F.isnan(x))
    return out.select(
        "level",
        "tile_x",
        "tile_y",
        "band",
        F.size(valid).cast("long").alias("n_valid"),
        F.round(F.aggregate(valid, F.lit(0.0), lambda a, x: a + x), 4).alias("tile_sum"),
    )


SQ_PYRAMID_SQL = f"""
WITH {_CNT_SQL},
lvl8 AS MATERIALIZED (
  SELECT gi // 2 AS gi, gj // 2 AS gj, SUM(v) / COUNT(*) AS v
  FROM cnt GROUP BY 1, 2
),
t8 AS (SELECT DISTINCT tx // 2 AS tx, ty // 2 AS ty FROM tiles),
px8 AS (
  SELECT t.tx, t.ty, t.tx * 32 + x.i AS gi, t.ty * 32 + y.j AS gj
  FROM t8 t, range(0, 32) x(i), range(0, 32) y(j)
),
lvl7 AS MATERIALIZED (
  SELECT gi // 2 AS gi, gj // 2 AS gj, SUM(v) / COUNT(*) AS v
  FROM lvl8 GROUP BY 1, 2
),
t7 AS (SELECT DISTINCT tx // 2 AS tx, ty // 2 AS ty FROM t8),
px7 AS (
  SELECT t.tx, t.ty, t.tx * 32 + x.i AS gi, t.ty * 32 + y.j AS gj
  FROM t7 t, range(0, 32) x(i), range(0, 32) y(j)
)
SELECT CAST(8 AS INT) AS level, CAST(p.tx AS INT) AS tile_x,
       CAST(p.ty AS INT) AS tile_y, 'count' AS band,
       COUNT(c.v) AS n_valid, ROUND(COALESCE(SUM(c.v), 0.0), 4) AS tile_sum
FROM px8 p LEFT JOIN lvl8 c ON c.gi = p.gi AND c.gj = p.gj GROUP BY 2, 3
UNION ALL
SELECT CAST(7 AS INT), CAST(p.tx AS INT), CAST(p.ty AS INT), 'count',
       COUNT(c.v), ROUND(COALESCE(SUM(c.v), 0.0), 4)
FROM px7 p LEFT JOIN lvl7 c ON c.gi = p.gi AND c.gj = p.gj GROUP BY 2, 3
"""


def sq_reclass_algebra(spark: SparkSession, sf: str) -> DataFrame:
    """Local map algebra (engine/algebra.py) + bounded Euclidean
    distance transform (engine/distance.py): reclassify the class
    raster {0:10, 1:20, 2:20, 3:30}, the normalized difference
    (dem - rc)/(dem + rc) against the DEM band, dist0 = exact
    distance (cap 6 cells) to the nearest class-0 cell, and the
    round-4 'costd' band — accumulated COST DISTANCE
    (engine/costdist.py Dijkstra, bounded window) over cost = 2 + z on
    a 48x48 DEM where every halo window covers the raster, so the
    bounded result is globally exact and the oracle can replay the
    same recurrence by Jacobi relaxation in a recursive CTE; per-tile
    summary of all bands (quantized for costd — path sums land near
    rounding boundaries)."""
    import numpy as np
    import pandas as pd

    from engine import algebra, costdist, distance, fixtures
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    tiles = spark.createDataFrame(
        pd.concat(
            [
                fixtures.tiles_rows_from_array(
                    fixtures.raster_arith(size=64), 16, band="class"
                ),
                fixtures.tiles_rows_from_array(
                    fixtures.dem_arith(size=64), 16, band="z"
                ),
            ],
            ignore_index=True,
        ),
        fixtures.TILES_SCHEMA_DDL,
    )
    mapping = {0: 10.0, 1: 20.0, 2: 20.0, 3: 30.0}
    rc = algebra.reclassify(tiles, 16, mapping, band="class", out_band="rc")

    def nd(got):
        return (got["z"] - got["rc"]) / (got["z"] + got["rc"])

    out = algebra.local_map(tiles.union(rc), 16, "nd", nd, ["z", "rc"])
    d0 = distance.distance_transform(
        tiles.filter(F.col("band") == "class"), 16, 6,
        lambda a: np.nan_to_num(a, nan=-1.0) == 0.0, out_band="dist0",
    )
    cost_tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(
            2.0 + fixtures.dem_arith(size=48), 16, band="cost"
        ),
        fixtures.TILES_SCHEMA_DDL,
    )
    cd = costdist.cost_distance(
        cost_tiles, 16, cap=16, pred=lambda a: a < 1.0, out_band="costd"
    )
    return _tile_summary(out.unionByName(d0)).unionByName(
        _tile_summary_quantized(cd)
    )


SQ_RECLASS_SQL = f"""
WITH RECURSIVE {_RASTER_ARITH_SQL},
{_DEM_SQL},
nd AS (
  SELECT c.i // 16 AS tx, c.j // 16 AS ty,
         (d.z - rc.v) / (d.z + rc.v) AS v
  FROM cells c
  JOIN (SELECT i, j, CASE klass WHEN 0 THEN 10.0 WHEN 1 THEN 20.0
                                WHEN 2 THEN 20.0 WHEN 3 THEN 30.0 END AS v
        FROM cells) rc ON rc.i = c.i AND rc.j = c.j
  JOIN dem d ON d.i = c.i AND d.j = c.j
),
tiles0 AS (SELECT a.tx AS tx, b.ty AS ty FROM range(0, 4) a(tx), range(0, 4) b(ty)),
-- bounded EDT mirror (engine/distance.py): features = VALID class-0
-- cells; output over ALL grid cells (nodata cells get distances too);
-- sqrt(min d2) == the engine's min-over-sqrt (monotone)
feat AS (SELECT i, j FROM cells WHERE klass = 0),
dist0 AS (
  SELECT g.i // 16 AS tx, g.j // 16 AS ty,
         SQRT(CAST(MIN((g.i - f.i) * (g.i - f.i)
                       + (g.j - f.j) * (g.j - f.j)) AS DOUBLE)) AS v
  FROM grid0 g JOIN feat f
    ON ABS(g.i - f.i) <= 6 AND ABS(g.j - f.j) <= 6
   AND (g.i - f.i) * (g.i - f.i) + (g.j - f.j) * (g.j - f.j) <= 36
  GROUP BY g.i, g.j
)
SELECT CAST(t.tx AS INT) AS tile_x, CAST(t.ty AS INT) AS tile_y, 'nd' AS band,
       COUNT(n.v) AS n_valid, ROUND(COALESCE(SUM(n.v), 0.0), 4) AS tile_sum
FROM tiles0 t LEFT JOIN nd n ON n.tx = t.tx AND n.ty = t.ty GROUP BY 1, 2
UNION ALL
SELECT CAST(t.tx AS INT) AS tile_x, CAST(t.ty AS INT) AS tile_y, 'dist0' AS band,
       COUNT(d.v) AS n_valid, ROUND(COALESCE(SUM(d.v), 0.0), 4) AS tile_sum
FROM tiles0 t LEFT JOIN dist0 d ON d.tx = t.tx AND d.ty = t.ty GROUP BY 1, 2
UNION ALL
SELECT CAST(t.tx AS INT), CAST(t.ty AS INT), 'costd',
       COUNT(cd.d),
       ROUND(COALESCE(SUM(CAST(ROUND(cd.d * 1000000) AS BIGINT)), 0) / 1000000.0, 4)
FROM ctiles t LEFT JOIN costd cd ON cd.i // 16 = t.tx AND cd.j // 16 = t.ty
GROUP BY 1, 2
"""

# cost-distance mirror (engine/costdist.py, round 4): the 48x48 DEM in
# pinned FLOAT64 order (CAST first — bare decimal literals keep DuckDB
# in exact DECIMAL(38,5) and diverge at the ulp), cost = 2 + z, sources
# = cost < 1, then the SAME recurrence the engine's Dijkstra satisfies,
# D = min(D, D_nb + dist * (cost_nb + cost) / 2), by Jacobi relaxation:
# one sweep per recursion step, 96 sweeps (converged by 48 on this
# fixture; margin 2x). Dijkstra vs the relaxation fixpoint is
# bit-identical — both take the same min over the same candidate path
# sums — so the quantized tile sums hash exactly.
_COST_SQL_CTES = """
cdem AS MATERIALIZED (
  SELECT i, j,
         2.0 + (0.002 * (CAST(i AS DOUBLE) - 20.0) * (CAST(i AS DOUBLE) - 35.0)
         + 0.003 * (CAST(j AS DOUBLE) - 10.0) * (CAST(j AS DOUBLE) - 50.0)
         + 0.0004 * CAST(i AS DOUBLE) * CAST(j AS DOUBLE)) AS cost
  FROM (SELECT x.i AS i, y.j AS j FROM range(0, 48) x(i), range(0, 48) y(j))
  WHERE NOT (((i * 2654435761 + j * 40503 + 13) % 4294967296) < 0.03 * 4294967296)
    AND NOT (i BETWEEN 8 AND 11 AND j BETWEEN 40 AND 43)
),
off9c(dx, dy, dist) AS (VALUES
  (0, 0, 0.0),
  (-1, -1, 1.4142135623730951), (0, -1, 1.0), (1, -1, 1.4142135623730951),
  (-1, 0, 1.0), (1, 0, 1.0),
  (-1, 1, 1.4142135623730951), (0, 1, 1.0), (1, 1, 1.4142135623730951)
),
crelax(it, i, j, d) AS (
  SELECT 0, i, j, CASE WHEN cost < 1.0 THEN 0.0 ELSE 1e18 END FROM cdem
  UNION ALL
  SELECT r.it + 1, c.i, c.j, MIN(r.d + o.dist * (u.cost + c.cost) / 2.0)
  FROM crelax r
  JOIN cdem u ON u.i = r.i AND u.j = r.j
  JOIN off9c o ON TRUE
  JOIN cdem c ON c.i = r.i + o.dx AND c.j = r.j + o.dy
  WHERE r.it < 96
  GROUP BY r.it + 1, c.i, c.j
),
costd AS MATERIALIZED (
  SELECT i, j, CASE WHEN d >= 1e17 THEN NULL ELSE d END AS d
  FROM crelax WHERE it = 96
),
ctiles AS (SELECT a.tx AS tx, b.ty AS ty FROM range(0, 3) a(tx), range(0, 3) b(ty))
"""
SQ_RECLASS_SQL = SQ_RECLASS_SQL.replace(
    "nd AS (", _COST_SQL_CTES.strip().rstrip() + ",\nnd AS (", 1
)


def sq_cost_path(spark: SparkSession, sf: str) -> DataFrame:
    """Least-cost paths (engine/costdist.cost_path, round 4): for a
    deterministic lattice of destination cells on the 48x48 cost
    fixture, backtrack the Dijkstra surface to the nearest source with
    the pinned predecessor rule; one row per reachable destination
    with step count, total cost, and path-coordinate checksums. The
    oracle recomputes the accumulated-cost surface (Jacobi relaxation,
    shared CTEs) then walks a precomputed argmin-predecessor table
    with a recursive CTE — the identical tie rule (candidate ASC,
    pinned offset order ASC)."""
    from engine import costdist, fixtures
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    cost_tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(
            2.0 + fixtures.dem_arith(size=48), 16, band="cost"
        ),
        fixtures.TILES_SCHEMA_DDL,
    )
    return costdist.cost_path(
        cost_tiles, 16, cap=16,
        source_pred=lambda a: a < 1.0,
        dest_pred=lambda gj, gi, vals: (gi % 17 == 3) & (gj % 13 == 5),
    )


# off8: the engine's pinned _N8 order — (dj, di, dist) with idx the
# tie-break rank; predecessor = argmin(D(u) + dist*(cost_u + cost_c)/2)
SQ_COST_PATH_SQL = f"""
WITH RECURSIVE {_COST_SQL_CTES.strip().rstrip()},
off8(idx, dj, di, dist) AS (VALUES
  (0, -1, -1, 1.4142135623730951), (1, -1, 0, 1.0),
  (2, -1, 1, 1.4142135623730951), (3, 0, -1, 1.0), (4, 0, 1, 1.0),
  (5, 1, -1, 1.4142135623730951), (6, 1, 0, 1.0),
  (7, 1, 1, 1.4142135623730951)
),
predt AS MATERIALIZED (
  SELECT ci, cj, ni, nj FROM (
    SELECT c.i AS ci, c.j AS cj, u.i AS ni, u.j AS nj,
           ROW_NUMBER() OVER (
             PARTITION BY c.i, c.j
             ORDER BY u.d + o.dist * (cu.cost + cc.cost) / 2.0 ASC, o.idx ASC
           ) AS rn
    FROM costd c
    JOIN off8 o ON TRUE
    JOIN costd u ON u.i = c.i + o.di AND u.j = c.j + o.dj
                AND u.d IS NOT NULL
    JOIN cdem cu ON cu.i = u.i AND cu.j = u.j
    JOIN cdem cc ON cc.i = c.i AND cc.j = c.j
    WHERE c.d IS NOT NULL AND c.d > 0
  ) WHERE rn = 1
),
walkp(dest_i, dest_j, k, ci, cj) AS (
  SELECT i, j, 0, i, j FROM costd
  WHERE d IS NOT NULL AND i % 17 = 3 AND j % 13 = 5
  UNION ALL
  SELECT w.dest_i, w.dest_j, w.k + 1, p.ni, p.nj
  FROM walkp w
  JOIN costd cur ON cur.i = w.ci AND cur.j = w.cj AND cur.d > 0
  JOIN predt p ON p.ci = w.ci AND p.cj = w.cj
)
SELECT w.dest_i, w.dest_j,
       CAST(MAX(w.k) AS BIGINT) AS n_steps,
       MAX(dc.d) AS total_cost,
       CAST(SUM(w.ci) AS BIGINT) AS sum_i,
       CAST(SUM(w.cj) AS BIGINT) AS sum_j
FROM walkp w JOIN costd dc ON dc.i = w.dest_i AND dc.j = w.dest_j
GROUP BY 1, 2
"""


def sq_contour(spark: SparkSession, sf: str) -> DataFrame:
    """Iso-contour extraction (engine/vector.contour_segments, round
    4): marching squares at level 2.0 over the arithmetic DEM; per-tile
    segment count + quantized length / endpoint checksums. The oracle
    regenerates the DEM in pinned FLOAT64 order (the shared decimal
    dem CTE diverges at the ulp inside the interpolation division),
    classifies every 2x2 block, and emits the same pinned
    case->edge-pair table as literal UNION arms."""
    from engine import vector
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    segs = vector.contour_segments(_dem_tiles(spark), 16, 2.0, band="z")
    seg_len = F.sqrt(
        (F.col("x1") - F.col("x0")) * (F.col("x1") - F.col("x0"))
        + (F.col("y1") - F.col("y0")) * (F.col("y1") - F.col("y0"))
    )
    vq = F.round(
        (F.col("x0") + F.col("y0") + F.col("x1") + F.col("y1")) * 1e6
    ).cast("long")
    return (
        segs.groupBy(
            F.floor(F.col("bi") / 16).cast("int").alias("tile_x"),
            F.floor(F.col("bj") / 16).cast("int").alias("tile_y"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.round(
                F.sum(F.round(seg_len * 1e6).cast("long")) / 1e6, 4
            ).alias("len_q"),
            F.sum(vq).alias("vsum_q"),
        )
    )


def _contour_oracle_sql() -> str:
    from engine.vector import _MS_LUT

    # edge id -> (x, y) SQL expressions; t uses the engine's exact
    # (L - va)/(vb - va) with L = 2.0
    ex = {
        0: ("CAST(i AS DOUBLE) + (2.0 - v00) / (v10 - v00)", "CAST(j AS DOUBLE)"),
        1: ("CAST(i + 1 AS DOUBLE)", "CAST(j AS DOUBLE) + (2.0 - v10) / (v11 - v10)"),
        2: ("CAST(i AS DOUBLE) + (2.0 - v01) / (v11 - v01)", "CAST(j + 1 AS DOUBLE)"),
        3: ("CAST(i AS DOUBLE)", "CAST(j AS DOUBLE) + (2.0 - v00) / (v01 - v00)"),
    }
    arms = []
    for case, segs in sorted(_MS_LUT.items()):
        for ea, eb in segs:
            arms.append(
                f"SELECT i, j, {ex[ea][0]} AS x0, {ex[ea][1]} AS y0, "
                f"{ex[eb][0]} AS x1, {ex[eb][1]} AS y1 "
                f"FROM blocks WHERE cs = {case}"
            )
    return f"""
WITH fdem AS MATERIALIZED (
  SELECT i, j,
         0.002 * (CAST(i AS DOUBLE) - 20.0) * (CAST(i AS DOUBLE) - 35.0)
         + 0.003 * (CAST(j AS DOUBLE) - 10.0) * (CAST(j AS DOUBLE) - 50.0)
         + 0.0004 * CAST(i AS DOUBLE) * CAST(j AS DOUBLE) AS z
  FROM (SELECT x.i AS i, y.j AS j FROM range(0, 64) x(i), range(0, 64) y(j))
  WHERE NOT (((i * 2654435761 + j * 40503 + 13) % 4294967296) < 0.03 * 4294967296)
    AND NOT (i BETWEEN 8 AND 11 AND j BETWEEN 40 AND 43)
),
blocks AS MATERIALIZED (
  SELECT d00.i AS i, d00.j AS j,
         d00.z AS v00, d10.z AS v10, d11.z AS v11, d01.z AS v01,
         CAST(d00.z >= 2.0 AS INT) + 2 * CAST(d10.z >= 2.0 AS INT)
         + 4 * CAST(d11.z >= 2.0 AS INT) + 8 * CAST(d01.z >= 2.0 AS INT) AS cs
  FROM fdem d00
  JOIN fdem d10 ON d10.i = d00.i + 1 AND d10.j = d00.j
  JOIN fdem d01 ON d01.i = d00.i AND d01.j = d00.j + 1
  JOIN fdem d11 ON d11.i = d00.i + 1 AND d11.j = d00.j + 1
),
segs AS (
  {" UNION ALL ".join(arms)}
)
SELECT CAST(i // 16 AS INT) AS tile_x, CAST(j // 16 AS INT) AS tile_y,
       CAST(COUNT(*) AS BIGINT) AS n_segs,
       ROUND(SUM(CAST(ROUND(SQRT((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0)) * 1000000.0) AS BIGINT)) / 1000000.0, 4) AS len_q,
       CAST(SUM(CAST(ROUND((x0 + y0 + x1 + y1) * 1000000.0) AS BIGINT)) AS BIGINT) AS vsum_q
FROM segs GROUP BY 1, 2
"""


def sq_sample_raster(spark: SparkSession, sf: str) -> DataFrame:
    """Point drill (engine/algebra.sample_raster): every document
    samples the level-9 count raster at its own pixel (value = docs in
    that pixel), aggregated per tile. Exercises the cogrouped
    one-payload-per-tile extract."""
    from engine import algebra, tiling, udfs
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    level, T = 9, 32
    docs = shim.documents_interleaved(spark, sf)
    pts = udfs.with_cell_and_tile(udfs.geocode_cols(docs), level, T)
    tiles = tiling.rasterize(pts, T, level, stat="count")
    out = algebra.sample_raster(
        pts, tiles, T, "count", point_cols=("doc_id", "tile_x", "tile_y")
    )
    return out.groupBy("tile_x", "tile_y").agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.round(F.sum("value"), 4).alias("val_sum"),
    )


# per tile: n_pts = Σ v (each doc samples once), val_sum = Σ v·v (each
# of a pixel's v docs reads back v)
SQ_SAMPLE_SQL = f"""
WITH {_CNT_SQL}
SELECT CAST(gi // 32 AS INT) AS tile_x, CAST(gj // 32 AS INT) AS tile_y,
       CAST(SUM(v) AS BIGINT) AS n_pts,
       ROUND(SUM(v * v), 4) AS val_sum
FROM cnt GROUP BY 1, 2
"""


def _dem_tiles(spark: SparkSession):
    from engine import fixtures

    return spark.createDataFrame(
        fixtures.tiles_rows_from_array(fixtures.dem_arith(size=64), 16, band="z"),
        fixtures.TILES_SCHEMA_DDL,
    )


def sq_raster_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Global fixed-bin histogram (engine/zonal.raster_histogram) of
    the arithmetic DEM: 20 bins over [-2, 8), per-bin count + sum."""
    from engine import zonal
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    return zonal.raster_histogram(_dem_tiles(spark), "z", -2.0, 8.0, 20)


SQ_HISTOGRAM_SQL = f"""
WITH {_DEM_SQL}
SELECT LEAST(GREATEST(CAST(FLOOR((z - (-2.0)) / 0.5) AS BIGINT), -1), 20) AS bin,
       COUNT(*) AS n_cells, ROUND(SUM(z), 4) AS v_sum
FROM dem GROUP BY 1
"""


def sq_global_stats(spark: SparkSession, sf: str) -> DataFrame:
    """One-row global raster summary (engine/zonal.global_stats):
    n/sum/mean/min/max/population-std via decomposable partials."""
    from engine import zonal
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    return zonal.global_stats(_dem_tiles(spark), "z")


SQ_GLOBAL_STATS_SQL = f"""
WITH {_DEM_SQL}
SELECT COUNT(*) AS n_cells, ROUND(SUM(z), 4) AS v_sum,
       ROUND(SUM(z) / COUNT(*), 6) AS v_mean,
       ROUND(MIN(z), 6) AS v_min, ROUND(MAX(z), 6) AS v_max,
       ROUND(SQRT(SUM(z * z) / COUNT(*)
                  - (SUM(z) / COUNT(*)) * (SUM(z) / COUNT(*))), 6) AS v_std
FROM dem
"""


def sq_upsample(spark: SparkSession, sf: str) -> DataFrame:
    """Resample family in one driver row: bilinear 2x upsample of the
    arithmetic DEM (64x64 -> 128x128, band 'z') UNION the round-3
    nearest-neighbor affine WARP (rotation+scale+translate to a 40x56
    output, band 'warp') UNION the round-4 GENERAL non-affine
    warp_transform (quadratic lens distortion, band 'warpt'); per-tile
    summary. NaN-aware renormalizing corners / out-of-extent NaN
    (speckle + borders exercise both)."""
    from engine import resample
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    tiles = _dem_tiles(spark)
    up = resample.upsample_bilinear(tiles, 16, level=0, band="z")
    warp = resample.warp_affine(
        tiles, 16, (0.7, -0.4, 6.0, 0.4, 0.7, -3.0), (40, 56),
        band="z", out_band="warp",
    )

    # round 4: GENERAL (non-affine) reprojection — a quadratic lens
    # distortion, polynomial so the oracle mirrors the inverse map
    # exactly in SQL (transcendental projections like Mercator are
    # golden-tested in pytest instead; libm vs NumPy SIMD ulp risk)
    def _inv_lens(gx, gy):
        return gx + gx * gx / 96.0, gy + gx * gy / 128.0

    warpt = resample.warp_transform(
        tiles, 16, _inv_lens, (48, 48), band="z", out_band="warpt"
    )
    return _tile_summary(up.unionByName(warp).unionByName(warpt))


# child sample at parent offset ±0.25 per axis -> corner weights are
# exactly 0.75/0.25; num/den accumulate in the same corner order as
# engine/resample.bilinear_2x ((0,0),(0,1),(1,0),(1,1)) so the FP sums
# are bit-identical
SQ_UPSAMPLE_SQL = f"""
WITH {_DEM_SQL},
child AS (
  SELECT a.ci AS ci, b.cj AS cj,
         a.ci // 2 - 1 + (a.ci % 2) AS ix0,
         b.cj // 2 - 1 + (b.cj % 2) AS iy0,
         CASE WHEN a.ci % 2 = 0 THEN 0.75 ELSE 0.25 END AS fx,
         CASE WHEN b.cj % 2 = 0 THEN 0.75 ELSE 0.25 END AS fy
  FROM range(0, 128) a(ci), range(0, 128) b(cj)
),
interp AS (
  SELECT c.ci, c.cj,
         COALESCE((1 - c.fy) * (1 - c.fx) * d00.z, 0)
         + COALESCE((1 - c.fy) * c.fx * d01.z, 0)
         + COALESCE(c.fy * (1 - c.fx) * d10.z, 0)
         + COALESCE(c.fy * c.fx * d11.z, 0) AS num,
         (CASE WHEN d00.z IS NULL THEN 0 ELSE (1 - c.fy) * (1 - c.fx) END)
         + (CASE WHEN d01.z IS NULL THEN 0 ELSE (1 - c.fy) * c.fx END)
         + (CASE WHEN d10.z IS NULL THEN 0 ELSE c.fy * (1 - c.fx) END)
         + (CASE WHEN d11.z IS NULL THEN 0 ELSE c.fy * c.fx END) AS den
  FROM child c
  LEFT JOIN dem d00 ON d00.i = c.ix0 AND d00.j = c.iy0
  LEFT JOIN dem d01 ON d01.i = c.ix0 + 1 AND d01.j = c.iy0
  LEFT JOIN dem d10 ON d10.i = c.ix0 AND d10.j = c.iy0 + 1
  LEFT JOIN dem d11 ON d11.i = c.ix0 + 1 AND d11.j = c.iy0 + 1
),
vals AS (SELECT ci // 16 AS tx, cj // 16 AS ty, num / den AS v
         FROM interp WHERE den > 0),
tiles0 AS (SELECT a.tx AS tx, b.ty AS ty FROM range(0, 8) a(tx), range(0, 8) b(ty)),
-- nearest-neighbor affine warp mirror (engine/resample.warp_affine):
-- same coeffs, same pixel-center floor; only valid dem cells join
wpix AS (
  SELECT a.oi AS oi, b.oj AS oj,
         CAST(FLOOR(0.7 * (a.oi + 0.5) - 0.4 * (b.oj + 0.5) + 6.0) AS BIGINT) AS si,
         CAST(FLOOR(0.4 * (a.oi + 0.5) + 0.7 * (b.oj + 0.5) - 3.0) AS BIGINT) AS sj
  FROM range(0, 56) a(oi), range(0, 40) b(oj)
),
wvals AS (
  SELECT w.oi // 16 AS tx, w.oj // 16 AS ty, d.z AS v
  FROM wpix w JOIN dem d ON d.i = w.si AND d.j = w.sj
),
wtiles AS (SELECT a.tx AS tx, b.ty AS ty FROM range(0, 4) a(tx), range(0, 3) b(ty)),
-- non-affine warp mirror (engine/resample.warp_transform, round 4):
-- quadratic lens inverse p = (gx + gx²/96, gy + gx·gy/128) in pure
-- DOUBLE arithmetic (CAST first: bare oi + 0.5 is DECIMAL in DuckDB),
-- nearest floor — exactly the engine's vectorized inverse
wtpix AS (
  SELECT a.oi AS oi, b.oj AS oj,
         CAST(FLOOR((CAST(a.oi AS DOUBLE) + 0.5)
              + (CAST(a.oi AS DOUBLE) + 0.5) * (CAST(a.oi AS DOUBLE) + 0.5) / 96.0)
              AS BIGINT) AS si,
         CAST(FLOOR((CAST(b.oj AS DOUBLE) + 0.5)
              + (CAST(a.oi AS DOUBLE) + 0.5) * (CAST(b.oj AS DOUBLE) + 0.5) / 128.0)
              AS BIGINT) AS sj
  FROM range(0, 48) a(oi), range(0, 48) b(oj)
),
wtvals AS (
  SELECT w.oi // 16 AS tx, w.oj // 16 AS ty, d.z AS v
  FROM wtpix w JOIN dem d ON d.i = w.si AND d.j = w.sj
),
wttiles AS (SELECT a.tx AS tx, b.ty AS ty FROM range(0, 3) a(tx), range(0, 3) b(ty))
SELECT CAST(t.tx AS INT) AS tile_x, CAST(t.ty AS INT) AS tile_y, 'z' AS band,
       COUNT(v.v) AS n_valid, ROUND(COALESCE(SUM(v.v), 0.0), 4) AS tile_sum
FROM tiles0 t LEFT JOIN vals v ON v.tx = t.tx AND v.ty = t.ty GROUP BY 1, 2
UNION ALL
SELECT CAST(t.tx AS INT), CAST(t.ty AS INT), 'warp',
       COUNT(v.v), ROUND(COALESCE(SUM(v.v), 0.0), 4)
FROM wtiles t LEFT JOIN wvals v ON v.tx = t.tx AND v.ty = t.ty GROUP BY 1, 2
UNION ALL
SELECT CAST(t.tx AS INT), CAST(t.ty AS INT), 'warpt',
       COUNT(v.v), ROUND(COALESCE(SUM(v.v), 0.0), 4)
FROM wttiles t LEFT JOIN wtvals v ON v.tx = t.tx AND v.ty = t.ty GROUP BY 1, 2
"""


_OVERLAY_SUBJECTS = [
    # (poly_id, xs, ys) — one non-convex pentagon, one convex quad, one
    # triangle; exact binary-fraction coords, no vertex on a clip edge
    (1, [2.0, 22.0, 21.0, 12.0, 3.5], [2.0, 3.0, 13.5, 7.25, 14.0]),
    (2, [30.5, 44.0, 42.25, 29.0], [4.0, 6.5, 18.0, 15.5]),
    (3, [8.0, 26.5, 14.0], [20.5, 22.0, 34.75]),
]
_OVERLAY_CLIPS = [
    # convex QUADS (4 edges — the oracle unrolls exactly 4 S–H stages),
    # positively wound (y-down clockwise, the engine's convention)
    (1, [6.0, 26.0, 26.0, 6.0], [5.0, 5.0, 17.0, 17.0]),
    (2, [10.0, 30.0, 22.0, 6.0], [18.0, 24.0, 36.0, 28.0]),
    (3, [36.0, 48.0, 48.0, 36.0], [2.0, 2.0, 30.0, 30.0]),
]


def sq_overlay(spark: SparkSession, sf: str) -> DataFrame:
    """Vector-vector overlay (engine/overlay.py, round 4): polygon x
    polygon INTERSECTION via grid-bin candidate pairing + per-pair
    Sutherland-Hodgman clip. The oracle replays the identical pinned
    algorithm in SQL — four unrolled half-plane stages with the same
    raw cross-product d values and the same t = d0/(d0-d1)
    interpolation, then the same order-free micro-unit shoelace — so
    the hash checks the clipped GEOMETRY, not just areas."""
    from engine import overlay
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    ddl = "poly_id long, xs array<double>, ys array<double>"
    subj = spark.createDataFrame(_OVERLAY_SUBJECTS, ddl)
    clips = spark.createDataFrame(_OVERLAY_CLIPS, ddl)
    out = overlay.overlay_intersection(subj, clips)
    return out.select(
        "a_id", "b_id",
        F.col("n_pts").cast("long").alias("n_pts"),
        "area_q", "vsum_q",
    )


def _overlay_oracle_sql() -> str:
    subj_vals = ",\n  ".join(
        f"({sid}, {k}, {x!r}, {y!r})"
        for sid, xs, ys in _OVERLAY_SUBJECTS
        for k, (x, y) in enumerate(zip(xs, ys))
    )
    clip_rows = []
    for cid, xs, ys in _OVERLAY_CLIPS:
        cols = [str(cid)]
        for k in range(4):
            k2 = (k + 1) % 4
            cols += [repr(xs[k]), repr(ys[k]), repr(xs[k2]), repr(ys[k2])]
        clip_rows.append("(" + ", ".join(cols) + ")")
    clip_cols = ", ".join(
        f"e{k}x0 DOUBLE, e{k}y0 DOUBLE, e{k}x1 DOUBLE, e{k}y1 DOUBLE"
        for k in range(1, 5)
    )
    stages = []
    prev = "s0"
    for k in range(1, 5):
        out = f"s{k}"
        stages.append(f"""
{out}e AS (
  SELECT cur.sid, cur.cid, cur.k,
         prv.x AS x0, prv.y AS y0, cur.x AS x1, cur.y AS y1,
         (c.e{k}x1 - c.e{k}x0) * (prv.y - c.e{k}y0)
           - (c.e{k}y1 - c.e{k}y0) * (prv.x - c.e{k}x0) AS d0,
         (c.e{k}x1 - c.e{k}x0) * (cur.y - c.e{k}y0)
           - (c.e{k}y1 - c.e{k}y0) * (cur.x - c.e{k}x0) AS d1
  FROM {prev} cur
  JOIN (SELECT sid, cid, COUNT(*) AS n FROM {prev} GROUP BY 1, 2) cnt
    ON cnt.sid = cur.sid AND cnt.cid = cur.cid
  JOIN {prev} prv ON prv.sid = cur.sid AND prv.cid = cur.cid
                 AND prv.k = (cur.k + cnt.n - 1) % cnt.n
  JOIN clipe c ON c.cid = cur.cid
),
{out} AS MATERIALIZED (
  SELECT sid, cid,
         ROW_NUMBER() OVER (PARTITION BY sid, cid ORDER BY k, sub) - 1 AS k,
         x, y
  FROM (
    SELECT sid, cid, k, 0 AS sub,
           x0 + (d0 / (d0 - d1)) * (x1 - x0) AS x,
           y0 + (d0 / (d0 - d1)) * (y1 - y0) AS y
    FROM {out}e WHERE (d0 >= 0) != (d1 >= 0)
    UNION ALL
    SELECT sid, cid, k, 1, x1, y1 FROM {out}e WHERE d1 >= 0
  )
)""")
        prev = out
    return f"""
WITH subjv(sid, k, x, y) AS (VALUES
  {subj_vals}
),
clipe0(cid, {clip_cols.replace(' DOUBLE', '')}) AS (VALUES
  {",".join(clip_rows)}
),
clipe AS (SELECT cid, {", ".join(
    f"CAST(e{k}{c} AS DOUBLE) AS e{k}{c}"
    for k in range(1, 5) for c in ("x0", "y0", "x1", "y1")
)} FROM clipe0),
-- the engine's grid-bin candidate set reduces to a bbox-overlap
-- predicate (pairs in no shared bin have disjoint bboxes); the oracle
-- mirrors that prune EXPLICITLY — Sutherland-Hodgman CAN emit a
-- degenerate >=3-vertex zero-area ring for a disjoint pair, and a
-- pair the engine never evaluates must not reach the final filter
sbox AS (
  SELECT sid, MIN(CAST(x AS DOUBLE)) AS x0, MAX(CAST(x AS DOUBLE)) AS x1,
         MIN(CAST(y AS DOUBLE)) AS y0, MAX(CAST(y AS DOUBLE)) AS y1
  FROM subjv GROUP BY sid
),
cbox AS (
  SELECT cid,
         LEAST(e1x0, e2x0, e3x0, e4x0) AS x0,
         GREATEST(e1x0, e2x0, e3x0, e4x0) AS x1,
         LEAST(e1y0, e2y0, e3y0, e4y0) AS y0,
         GREATEST(e1y0, e2y0, e3y0, e4y0) AS y1
  FROM clipe
),
s0 AS (
  SELECT s.sid, c.cid, s.k, CAST(s.x AS DOUBLE) AS x, CAST(s.y AS DOUBLE) AS y
  FROM subjv s
  JOIN sbox sb ON sb.sid = s.sid
  JOIN cbox c ON sb.x0 <= c.x1 AND c.x0 <= sb.x1
             AND sb.y0 <= c.y1 AND c.y0 <= sb.y1
),{",".join(stages)}
SELECT a.sid AS a_id, a.cid AS b_id,
       CAST(COUNT(*) AS BIGINT) AS n_pts,
       ABS(CAST(SUM(CAST(ROUND((a.x * b.y - b.x * a.y) * 1000000.0) AS BIGINT)) AS BIGINT)) / 2000000.0 AS area_q,
       CAST(SUM(CAST(ROUND(a.x * 1000000.0) AS BIGINT)
                + CAST(ROUND(a.y * 1000000.0) AS BIGINT)) AS BIGINT) AS vsum_q
FROM s4 a
JOIN (SELECT sid, cid, COUNT(*) AS n FROM s4 GROUP BY 1, 2) cnt
  ON cnt.sid = a.sid AND cnt.cid = a.cid
JOIN s4 b ON b.sid = a.sid AND b.cid = a.cid AND b.k = (a.k + 1) % cnt.n
GROUP BY 1, 2 HAVING COUNT(*) >= 3
"""


def sq_moran(spark: SparkSession, sf: str) -> DataFrame:
    """Global spatial autocorrelation suite (engine/autocorr.py) of
    the arithmetic DEM under rook weights — Moran's I, Geary's C, and
    global Getis-Ord G from the SAME two map-side-partial passes
    (mean/moments, then one 1-halo exchange reducing each tile to six
    scalars)."""
    from engine import autocorr
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    return autocorr.moran_i(_dem_tiles(spark), 16, band="z")


SQ_MORAN_SQL = f"""
WITH {_DEM_SQL},
s AS (SELECT AVG(z) AS xb, COUNT(*) AS n,
             SUM(z) AS sz, SUM(z * z) AS sz2 FROM dem),
nb AS (
  SELECT a.i, a.j, a.z,
         COUNT(b.z) AS deg, COALESCE(SUM(b.z), 0) AS ns,
         COALESCE(SUM((a.z - b.z) * (a.z - b.z)), 0) AS cn
  FROM dem a
  LEFT JOIN dem b
    ON (b.i = a.i AND ABS(b.j - a.j) = 1)
    OR (b.j = a.j AND ABS(b.i - a.i) = 1)
  GROUP BY a.i, a.j, a.z
)
SELECT MAX(s.n) AS n_cells,
       CAST(SUM(nb.deg) AS BIGINT) AS w_pairs,
       ROUND((CAST(MAX(s.n) AS DOUBLE) / SUM(nb.deg))
             * SUM((nb.z - s.xb) * (nb.ns - nb.deg * s.xb))
             / SUM((nb.z - s.xb) * (nb.z - s.xb)), 6) AS moran_i,
       ROUND(((CAST(MAX(s.n) AS DOUBLE) - 1) / (2 * SUM(nb.deg)))
             * SUM(nb.cn)
             / SUM((nb.z - s.xb) * (nb.z - s.xb)), 6) AS geary_c,
       ROUND(SUM(nb.z * nb.ns)
             / (MAX(s.sz) * MAX(s.sz) - MAX(s.sz2)), 6) AS getis_g
FROM nb, s
"""


_GI_R = 2  # 5x5 square window


def sq_hotspot(spark: SparkSession, sf: str) -> DataFrame:
    """Local Getis-Ord Gi* hotspot raster (kernels.focal_gi_star) of
    the arithmetic DEM, square r=2 window: one moments pass for the
    global (n, mean, std), then the usual ONE-halo-exchange focal plan
    computing the z-score plane; per-tile micro-quantized z checksum +
    hot (z>1.96) / cold (z<-1.96) cell counts."""
    import math

    from engine import autocorr, kernels, tiling
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    tiles = _dem_tiles(spark)
    n, s, s2 = autocorr.band_moments(tiles, "z")
    xb = s / n
    sd = math.sqrt(s2 / n - xb * xb)
    out = tiling.apply_focal(
        tiles,
        _GI_R,
        "square",
        {"gi": lambda a, r, sh: kernels.focal_gi_star(
            a, r, sh, xbar=xb, sd=sd, n=n
        )},
        16,
        level=10,
    )
    valid = F.filter("data", lambda x: x.isNotNull() & ~F.isnan(x))
    micro = F.transform(valid, lambda x: F.round(x * 1e6).cast("long"))
    return out.select(
        "tile_x",
        "tile_y",
        F.size(valid).cast("long").alias("n_valid"),
        F.round(
            F.aggregate(micro, F.lit(0).cast("long"), lambda a, x: a + x) / 1e6,
            4,
        ).alias("z_sum"),
        F.size(F.filter(valid, lambda x: x > 1.96)).cast("long").alias("n_hot"),
        F.size(F.filter(valid, lambda x: x < -1.96)).cast("long").alias("n_cold"),
    )


SQ_HOTSPOT_SQL = f"""
WITH {_DEM_SQL},
s AS (
  SELECT COUNT(*) AS n, AVG(z) AS xb,
         SQRT(SUM(z * z) / COUNT(*) - AVG(z) * AVG(z)) AS sd
  FROM dem
),
w AS (
  SELECT a.i, a.j, COUNT(b.z) AS wi, SUM(b.z) AS ws
  FROM dem a
  JOIN dem b
    ON ABS(b.i - a.i) <= {_GI_R} AND ABS(b.j - a.j) <= {_GI_R}
  GROUP BY 1, 2
),
g AS (
  SELECT i, j,
         (ws - s.xb * wi)
         / (s.sd * SQRT((s.n * wi - wi * wi) / (s.n - 1.0))) AS z
  FROM w, s
)
SELECT CAST(i // 16 AS INT) AS tile_x, CAST(j // 16 AS INT) AS tile_y,
       CAST(COUNT(*) AS BIGINT) AS n_valid,
       ROUND(SUM(CAST(ROUND(z * 1000000.0) AS BIGINT)) / 1000000.0, 4) AS z_sum,
       CAST(SUM(CASE WHEN z > CAST(1.96 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS n_hot,
       CAST(SUM(CASE WHEN z < CAST(-1.96 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS n_cold
FROM g GROUP BY 1, 2
"""


_OPEN_R = 4  # bounded ray length (<= halo)


def sq_openness(spark: SparkSession, sf: str) -> DataFrame:
    """Positive topographic openness (terrain.focal_openness) of the
    arithmetic DEM, 8 rays bounded to L=4: ONE r=4 halo exchange +
    shifted-plane maxima; per-ray micro-degree quantization makes the
    tile checksums exact across engines."""
    from engine import terrain, tiling
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    out = tiling.apply_focal(
        _dem_tiles(spark), _OPEN_R, "square",
        {"openness": terrain.focal_openness}, 16, level=10,
    )
    return _tile_summary_quantized(out)


SQ_OPENNESS_SQL = f"""
WITH {_DEM_SQL},
dirs8(dj, di, dist) AS (VALUES
  (-1, -1, SQRT(2.0)), (-1, 0, 1.0), (-1, 1, SQRT(2.0)),
  ( 0, -1, 1.0),                     ( 0, 1, 1.0),
  ( 1, -1, SQRT(2.0)), ( 1, 0, 1.0), ( 1, 1, SQRT(2.0))
),
rays AS (
  SELECT d.dj, d.di, k.k, d.dist * k.k AS dist
  FROM dirs8 d, range(1, {_OPEN_R + 1}) k(k)
),
best AS (
  SELECT c.i, c.j, r.dj, r.di, MAX((n.z - c.z) / r.dist) AS mr
  FROM dem c
  JOIN rays r ON TRUE
  JOIN dem n ON n.i = c.i + r.di * r.k AND n.j = c.j + r.dj * r.k
  GROUP BY 1, 2, 3, 4
),
op AS (
  SELECT i, j,
         SUM(CAST(ROUND((90.0 - DEGREES(ATAN(mr))) * 1000000.0) AS BIGINT))
           AS q
  FROM best GROUP BY 1, 2
)
SELECT CAST(c.i // 16 AS INT) AS tile_x, CAST(c.j // 16 AS INT) AS tile_y,
       'openness' AS band,
       CAST(COUNT(*) AS BIGINT) AS n_valid,
       ROUND(SUM(COALESCE(op.q, 0)) / 1000000.0, 4) AS tile_sum
FROM dem c LEFT JOIN op ON op.i = c.i AND op.j = c.j
GROUP BY 1, 2
"""


def sq_zonal_geom(spark: SparkSession, sf: str) -> DataFrame:
    """Per-zone geometry (zonal.zonal_geometry) of the arithmetic
    Voronoi class raster: area, rook boundary-edge perimeter (nodata
    speckle and the raster rim count), Polsby–Popper compactness.
    One 1-halo exchange + per-(tile, zone) integer partials; the
    oracle replays the edge count with a same-class rook self-join."""
    from engine import fixtures, zonal
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(
            fixtures.raster_arith(size=64), 16, band="zone"
        ),
        fixtures.TILES_SCHEMA_DDL,
    )
    return zonal.zonal_geometry(tiles, 16, zone_band="zone")


SQ_ZONAL_GEOM_SQL = f"""
WITH {_RASTER_ARITH_SQL},
-- adj (same-class rook pairs) comes from _RASTER_ARITH_SQL — one
-- definition of adjacency shared with the CCL oracles
per AS (
  SELECT c.klass, c.id, 4 - COUNT(a.b) AS p
  FROM cells c
  LEFT JOIN adj a ON a.a = c.id
  GROUP BY c.klass, c.id
)
SELECT CAST(klass AS BIGINT) AS zone,
       CAST(COUNT(*) AS BIGINT) AS area_cells,
       CAST(SUM(p) AS BIGINT) AS perimeter,
       ROUND((4.0 * PI() * COUNT(*))
             / CAST(SUM(p) * SUM(p) AS DOUBLE), 6) AS compactness
FROM per GROUP BY 1
"""


_HULL_N = 40  # pinned per-nation point budget (constant oracle cost)


def sq_hull(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed convex hull (vector.convex_hull_agg) of each
    nation's customer positions: map-side partial monotone chains
    reduce every partition to its extreme candidates, ONE candidate
    shuffle, final chain per group. Output = vertex count +
    micro-quantized coordinate sums (order-free exact integers); the
    oracle derives the identical vertex SET by the extreme-point test
    (a point is a hull vertex iff it lies strictly outside every
    non-degenerate triangle of other points — exact on the fixture's
    generic-position hash coordinates).

    The input is pinned to EXACTLY the first 40 customers per nation
    in deterministic (hash bucket, key) order — the q35 machinery — so
    the O(n⁴) triangle-enumeration ORACLE has constant cost at every
    scale factor instead of a cliff at sf0.1 (the engine itself has no
    such bound; the distributed-scale evidence is the two-phase ==
    global golden)."""
    from engine import sampling, vector
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    c = spark.read.parquet(f"{sf}/customer.parquet")
    w = Window.partitionBy("c_nationkey").orderBy(
        sampling.bucket_col(F.col("c_custkey")), F.col("c_custkey")
    )
    c40 = c.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= _HULL_N
    )
    pts = c40.select(
        F.col("c_nationkey").cast("string").alias("g"),
        shim.shim_lon_col(F.col("c_custkey")).alias("x"),
        shim.shim_lat_col(F.col("c_custkey")).alias("y"),
    )
    return vector.convex_hull_agg(pts, "g", "x", "y")


_HULL_X = shim.SHIM_LON_SQL.replace("doc_id", "c_custkey")
_HULL_Y = shim.SHIM_LAT_SQL.replace("doc_id", "c_custkey")


def _hull_bucket_sql() -> str:
    from engine import sampling

    return sampling.bucket_sql("c_custkey")


SQ_HULL_SQL = f"""
WITH c40 AS (
  SELECT c_nationkey, c_custkey FROM (
    SELECT c_nationkey, c_custkey,
           ROW_NUMBER() OVER (
             PARTITION BY c_nationkey
             ORDER BY {_hull_bucket_sql()}, c_custkey
           ) AS rk
    FROM customer
  ) WHERE rk <= {_HULL_N}
),
p AS (
  SELECT DISTINCT CAST(c_nationkey AS VARCHAR) AS g,
         {_HULL_X} AS x, {_HULL_Y} AS y
  FROM c40
),
tri AS (
  SELECT a.g, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by_,
         c.x AS cx, c.y AS cy
  FROM p a
  JOIN p b ON b.g = a.g AND (a.x, a.y) < (b.x, b.y)
  JOIN p c ON c.g = a.g AND (b.x, b.y) < (c.x, c.y)
  WHERE (bx - a.x) * (cy - a.y) - (by_ - a.y) * (cx - a.x) <> 0
),
nonext AS (
  SELECT DISTINCT q.g, q.x, q.y
  FROM p q JOIN tri t ON t.g = q.g
  WHERE NOT (q.x = t.ax AND q.y = t.ay)
    AND NOT (q.x = t.bx AND q.y = t.by_)
    AND NOT (q.x = t.cx AND q.y = t.cy)
    AND (
      SELECT NOT (
        ((t.bx - t.ax) * (q.y - t.ay) - (t.by_ - t.ay) * (q.x - t.ax) > 0
         OR (t.cx - t.bx) * (q.y - t.by_) - (t.cy - t.by_) * (q.x - t.bx) > 0
         OR (t.ax - t.cx) * (q.y - t.cy) - (t.ay - t.cy) * (q.x - t.cx) > 0)
        AND
        ((t.bx - t.ax) * (q.y - t.ay) - (t.by_ - t.ay) * (q.x - t.ax) < 0
         OR (t.cx - t.bx) * (q.y - t.by_) - (t.cy - t.by_) * (q.x - t.bx) < 0
         OR (t.ax - t.cx) * (q.y - t.cy) - (t.ay - t.cy) * (q.x - t.cx) < 0)
      )
    )
),
hull AS (SELECT g, x, y FROM p EXCEPT SELECT g, x, y FROM nonext)
SELECT g, CAST(COUNT(*) AS BIGINT) AS n_hull,
       CAST(SUM(CAST(ROUND(x * 1e6) AS BIGINT)) AS BIGINT) AS qx_sum,
       CAST(SUM(CAST(ROUND(y * 1e6) AS BIGINT)) AS BIGINT) AS qy_sum
FROM hull GROUP BY g
"""


_PCT_QS = (0.25, 0.5, 0.9)


def sq_zonal_pct(spark: SparkSession, sf: str) -> DataFrame:
    """Exact per-zone discrete percentiles (zonal.zonal_percentile) of
    the integer band FLOOR(dem·2) over the Voronoi zones — rank
    ceil(q·n), the G4 convention. Per-(zone, value) counts reduce
    map-side; the oracle replays the identical running-count rank
    pick."""
    import numpy as np
    import pandas as pd

    from engine import algebra, fixtures, zonal
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    tiles = spark.createDataFrame(
        pd.concat(
            [
                fixtures.tiles_rows_from_array(
                    fixtures.raster_arith(size=64), 16, band="zone"
                ),
                fixtures.tiles_rows_from_array(
                    fixtures.dem_arith(size=64), 16, band="z"
                ),
            ],
            ignore_index=True,
        ),
        fixtures.TILES_SCHEMA_DDL,
    )
    vb = algebra.local_map(
        tiles, 16, "v", lambda got: np.floor(got["z"] * 2.0), ["z"]
    )
    return zonal.zonal_percentile(
        tiles.unionByName(vb), 16, zone_band="zone", value_band="v",
        qs=_PCT_QS,
    )


SQ_ZONAL_PCT_SQL = f"""
WITH {_RASTER_ARITH_SQL},
{_DEM_SQL},
cnt AS (
  SELECT c.klass AS zone, CAST(FLOOR(d.z * 2.0) AS BIGINT) AS v,
         COUNT(*) AS n
  FROM cells c JOIN dem d ON d.i = c.i AND d.j = c.j
  GROUP BY 1, 2
),
cum AS (
  SELECT zone, v,
         SUM(n) OVER (PARTITION BY zone ORDER BY v) AS cum,
         SUM(n) OVER (PARTITION BY zone) AS total
  FROM cnt
),
qs(q, q_pm) AS (VALUES {
    ", ".join(f"({q}, {int(round(q * 10000))})" for q in _PCT_QS)
})
SELECT CAST(c.zone AS BIGINT) AS zone, q.q AS q,
       CAST(MIN(c.v) AS BIGINT) AS pct_value
FROM cum c JOIN qs q ON c.cum >= (q.q_pm * c.total + 9999) // 10000
GROUP BY 1, 2
"""


def sq_flowlen(spark: SparkSession, sf: str) -> DataFrame:
    """Downstream flow length (flow.flow_length) on the arithmetic
    DEM's D8 graph: per-cell cardinal/diagonal step counts to the
    terminal pit, reported as two exact-integer bands so the checksum
    carries zero float-sum-order exposure. Planes ship twice; the
    fixpoint is Wyllie doubling with carried counts over border-exit
    rows only."""
    from engine import flow
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    dirs = flow.flow_direction(_dem_tiles(spark), 16, level=10)
    return _tile_summary_quantized(flow.flow_length(dirs, 16, level=10))


# D8 mirror on the arith DEM (same pinned codes/tie rule as the
# sq_terrain oracle), then per-start-cell step-class counts over the
# recursive path walk
SQ_FLOWLEN_SQL = f"""
WITH RECURSIVE {_DEM_SQL},
d8off(code, dj, di, dist) AS (VALUES
  (1, 0, 1, 1.0), (2, 1, 1, 1.4142135623730951), (4, 1, 0, 1.0),
  (8, 1, -1, 1.4142135623730951), (16, 0, -1, 1.0),
  (32, -1, -1, 1.4142135623730951), (64, -1, 0, 1.0),
  (128, -1, 1, 1.4142135623730951)
),
fdir AS MATERIALIZED (
  SELECT c.i, c.j, COALESCE(r.code, 0) AS code
  FROM dem c LEFT JOIN (
    SELECT i, j, code FROM (
      SELECT c2.i AS i, c2.j AS j, o.code,
             ROW_NUMBER() OVER (
               PARTITION BY c2.i, c2.j
               ORDER BY (c2.z - n.z) / o.dist DESC, o.code ASC
             ) AS rn
      FROM dem c2 JOIN d8off o ON TRUE
      JOIN dem n ON n.i = c2.i + o.di AND n.j = c2.j + o.dj
      WHERE (c2.z - n.z) / o.dist > 0
    ) WHERE rn = 1
  ) r ON r.i = c.i AND r.j = c.j
),
recv AS MATERIALIZED (
  SELECT f.i, f.j, f.i + o.di AS ri, f.j + o.dj AS rj
  FROM fdir f JOIN d8off o ON o.code = f.code
  WHERE f.code > 0
),
walk(si, sj, ci, cj) AS (
  SELECT i, j, i, j FROM fdir
  UNION ALL
  SELECT w.si, w.sj, r.ri, r.rj
  FROM walk w JOIN recv r ON r.i = w.ci AND r.j = w.cj
),
flen AS MATERIALIZED (
  SELECT w.si AS i, w.sj AS j,
         SUM(CASE WHEN o.dj <> 0 AND o.di <> 0 THEN 0 ELSE 1 END) AS ncard,
         SUM(CASE WHEN o.dj <> 0 AND o.di <> 0 THEN 1 ELSE 0 END) AS ndiag
  FROM walk w
  JOIN fdir f ON f.i = w.ci AND f.j = w.cj AND f.code > 0
  JOIN d8off o ON o.code = f.code
  GROUP BY 1, 2
),
tiles0 AS (SELECT a.tx AS tx, b.ty AS ty FROM range(0, 4) a(tx), range(0, 4) b(ty))
SELECT CAST(t.tx AS INT) AS tile_x, CAST(t.ty AS INT) AS tile_y,
       'flowlen_card' AS band,
       CAST(COUNT(c.i) AS BIGINT) AS n_valid,
       ROUND(COALESCE(SUM(CAST(ROUND(COALESCE(fl.ncard, 0) * 1000000.0)
                               AS BIGINT)), 0) / 1000000.0, 4) AS tile_sum
FROM tiles0 t
LEFT JOIN dem c ON c.i // 16 = t.tx AND c.j // 16 = t.ty
LEFT JOIN flen fl ON fl.i = c.i AND fl.j = c.j
GROUP BY 1, 2
UNION ALL
SELECT CAST(t.tx AS INT), CAST(t.ty AS INT), 'flowlen_diag',
       CAST(COUNT(c.i) AS BIGINT),
       ROUND(COALESCE(SUM(CAST(ROUND(COALESCE(fl.ndiag, 0) * 1000000.0)
                               AS BIGINT)), 0) / 1000000.0, 4)
FROM tiles0 t
LEFT JOIN dem c ON c.i // 16 = t.tx AND c.j // 16 = t.ty
LEFT JOIN flen fl ON fl.i = c.i AND fl.j = c.j
GROUP BY 1, 2
"""


_TREND_BASE_US = 1704067200000000  # 2024-01-01T00:00:00Z in epoch-µs


def sq_trend(spark: SparkSession, sf: str) -> DataFrame:
    """Per-cell temporal trend (raster change detection): least-squares
    slope of event value over time for every level-9 grid cell, from
    the five classic regression moments (n, Σt, Σv, Σt², Σtv).

    Scale shape: ONE map-side-combinable groupBy on the cell key — the
    moments are exact int64 sums (t = whole seconds since a fixed base,
    v = cents), so slope doubles are bit-identical to the oracle's and
    the plan is a plain two-phase hash agg at any raster size. Output
    folds cells to per-tile counts + a micro-quantized slope checksum."""
    ev = spark.read.parquet(f"{sf}/events.parquet")
    lat = shim.shim_lat_col(F.col("event_id"))
    lon = shim.shim_lon_col(F.col("event_id"))
    t = F.expr(
        f"(unix_micros(CAST(ts AS TIMESTAMP)) - {_TREND_BASE_US}) DIV 1000000"
    )
    cells = ev.select(
        F.floor((lon + 180.0) / 360.0 * 512).cast("long").alias("gi"),
        F.floor((lat + 90.0) / 180.0 * 256).cast("long").alias("gj"),
        t.alias("t"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    m = cells.groupBy("gi", "gj").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("vc").alias("sv"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("t") * F.col("vc")).alias("stv"),
    )
    den = F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    num = F.col("n") * F.col("stv") - F.col("st") * F.col("sv")
    sl = (
        m.filter((F.col("n") >= 2) & (den != 0))
        .withColumn("slope", num.cast("double") / den.cast("double"))
    )
    return sl.groupBy(
        F.floor(F.col("gi") / 32).cast("int").alias("tile_x"),
        F.floor(F.col("gj") / 32).cast("int").alias("tile_y"),
    ).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("n").cast("long").alias("n_events"),
        F.round(
            F.sum(F.round(F.col("slope") * 1e6).cast("long")) / 1e6, 6
        ).alias("slope_sum"),
    )


SQ_TREND_SQL = f"""
WITH ev AS (
  SELECT CAST(FLOOR((({shim.SHIM_LON_SQL.replace("doc_id", "event_id")}) + 180) / 360 * 512) AS BIGINT) AS gi,
         CAST(FLOOR((({shim.SHIM_LAT_SQL.replace("doc_id", "event_id")}) + 90) / 180 * 256) AS BIGINT) AS gj,
         (epoch_us(ts) - {_TREND_BASE_US}) // 1000000 AS t,
         CAST(ROUND(value * 100) AS BIGINT) AS vc
  FROM events
),
m AS (
  SELECT gi, gj, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(vc) AS BIGINT) AS sv,
         CAST(SUM(t * t) AS BIGINT) AS stt, CAST(SUM(t * vc) AS BIGINT) AS stv
  FROM ev GROUP BY 1, 2
),
sl AS (
  SELECT gi, gj, n,
         CAST(n * stv - st * sv AS DOUBLE)
         / CAST(n * stt - st * st AS DOUBLE) AS slope
  FROM m WHERE n >= 2 AND n * stt - st * st != 0
)
SELECT CAST(gi // 32 AS INT) AS tile_x, CAST(gj // 32 AS INT) AS tile_y,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(n) AS BIGINT) AS n_events,
       ROUND(SUM(CAST(ROUND(slope * 1000000.0) AS BIGINT)) / 1000000.0, 6)
         AS slope_sum
FROM sl GROUP BY 1, 2
"""


_IDW_N, _IDW_R = 200, 4.0


def sq_idw(spark: SparkSession, sf: str) -> DataFrame:
    """IDW point→raster interpolation (engine/interpolate.py): 200
    deterministic scatter points → 64×64 grid, R=4 px, w=1/max(d²,ε);
    per-16×16-tile cell count + value checksum."""
    from engine import interpolate

    pts = spark.range(_IDW_N).select(
        ((F.col("id") * 2654435761 + 7) % 6400).cast("double").alias("px") / 100,
        ((F.col("id") * 40503 + 11) % 6400).cast("double").alias("py") / 100,
        ((F.col("id") * 9973 + 3) % 1000).cast("double").alias("v") / 100,
    ).toDF("px", "py", "v")
    vals = interpolate.idw_grid(pts, _IDW_R, 64, 64)
    return (
        vals.groupBy(
            F.expr("CAST(i DIV 16 AS INT)").alias("tile_x"),
            F.expr("CAST(j DIV 16 AS INT)").alias("tile_y"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.round(F.sum("value"), 4).alias("v_sum"),
        )
    )


SQ_IDW_SQL = f"""
WITH pts AS (
  SELECT CAST((k * 2654435761 + 7) % 6400 AS DOUBLE) / 100 AS px,
         CAST((k * 40503 + 11) % 6400 AS DOUBLE) / 100 AS py,
         CAST((k * 9973 + 3) % 1000 AS DOUBLE) / 100 AS v
  FROM range(0, {_IDW_N}) t(k)
),
cells AS (SELECT x.i AS i, y.j AS j FROM range(0, 64) x(i), range(0, 64) y(j)),
pairs AS (
  SELECT c.i, c.j, p.v,
         (p.px - (c.i + 0.5)) * (p.px - (c.i + 0.5))
         + (p.py - (c.j + 0.5)) * (p.py - (c.j + 0.5)) AS d2
  FROM cells c CROSS JOIN pts p
),
vals AS (
  SELECT i, j,
         SUM((1.0 / GREATEST(d2, 1e-12)) * v)
         / SUM(1.0 / GREATEST(d2, 1e-12)) AS value
  FROM pairs WHERE d2 <= {_IDW_R * _IDW_R} GROUP BY i, j
)
SELECT CAST(i // 16 AS INT) AS tile_x, CAST(j // 16 AS INT) AS tile_y,
       COUNT(*) AS n_cells, ROUND(SUM(value), 4) AS v_sum
FROM vals GROUP BY 1, 2
"""


_BILIN_N = 300


def sq_sample_bilinear(spark: SparkSession, sf: str) -> DataFrame:
    """Bilinear point drill (engine/resample.sample_bilinear): 300
    deterministic points interpolate the arithmetic DEM via the 4
    surrounding pixel centers (NaN-renormalizing corner rule shared
    with sq_upsample); per-point-bucket count + value checksum."""
    from engine import resample
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    pts = spark.range(_BILIN_N).select(
        F.col("id").alias("k"),
        (((F.col("id") * 48271 + 5) % 6400).cast("double") / 100).alias("gx"),
        (((F.col("id") * 69621 + 17) % 6400).cast("double") / 100).alias("gy"),
    )
    out = resample.sample_bilinear(pts, _dem_tiles(spark), 16, "z", ("k",))
    return out.groupBy(F.expr("CAST(k DIV 50 AS INT)").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.round(F.sum("value"), 4).alias("v_sum"),
    )


SQ_SAMPLE_BILINEAR_SQL = f"""
WITH {_DEM_SQL},
pts AS (
  SELECT k,
         CAST((k * 48271 + 5) % 6400 AS DOUBLE) / 100 AS gx,
         CAST((k * 69621 + 17) % 6400 AS DOUBLE) / 100 AS gy
  FROM range(0, {_BILIN_N}) t(k)
),
c AS (
  SELECT k,
         CAST(FLOOR(gx - 0.5) AS BIGINT) AS ix0,
         CAST(FLOOR(gy - 0.5) AS BIGINT) AS iy0,
         (gx - 0.5) - FLOOR(gx - 0.5) AS fx,
         (gy - 0.5) - FLOOR(gy - 0.5) AS fy
  FROM pts
),
interp AS (
  SELECT c.k,
         COALESCE((1 - c.fy) * (1 - c.fx) * d00.z, 0)
         + COALESCE((1 - c.fy) * c.fx * d01.z, 0)
         + COALESCE(c.fy * (1 - c.fx) * d10.z, 0)
         + COALESCE(c.fy * c.fx * d11.z, 0) AS num,
         (CASE WHEN d00.z IS NULL THEN 0 ELSE (1 - c.fy) * (1 - c.fx) END)
         + (CASE WHEN d01.z IS NULL THEN 0 ELSE (1 - c.fy) * c.fx END)
         + (CASE WHEN d10.z IS NULL THEN 0 ELSE c.fy * (1 - c.fx) END)
         + (CASE WHEN d11.z IS NULL THEN 0 ELSE c.fy * c.fx END) AS den
  FROM c
  LEFT JOIN dem d00 ON d00.i = c.ix0 AND d00.j = c.iy0
  LEFT JOIN dem d01 ON d01.i = c.ix0 + 1 AND d01.j = c.iy0
  LEFT JOIN dem d10 ON d10.i = c.ix0 AND d10.j = c.iy0 + 1
  LEFT JOIN dem d11 ON d11.i = c.ix0 + 1 AND d11.j = c.iy0 + 1
)
SELECT CAST(k // 50 AS INT) AS bucket, COUNT(*) AS n_pts,
       ROUND(SUM(num / den), 4) AS v_sum
FROM interp WHERE den > 0 GROUP BY 1
"""


# polygon zones in PIXEL coords (closed rings; vertices off the
# half-integer lattice so no pixel center sits on an edge; no
# horizontal edges). zone 1 and 2 overlap — lowest id wins. zone 1
# carries a HOLE (even-odd: centers inside the hole leave zone 1 —
# and, lying inside zone 2's outer ring, fall to zone 2).
_ZONE_RINGS = [
    (
        1,
        [(6.3, 4.2), (58.7, 12.4), (30.1, 55.6), (6.3, 4.2)],
        [[(24.2, 16.4), (36.6, 17.2), (30.4, 30.6), (24.2, 16.4)]],
    ),
    (2, [(20.2, 18.3), (52.6, 20.7), (48.4, 48.9), (10.9, 44.2), (20.2, 18.3)]),
]


def sq_polygon_zonal(spark: SparkSession, sf: str) -> DataFrame:
    """The A6 'polygon zones' composition: rasterize polygon ids into a
    zone band (V1, crossing-parity at pixel centers, lowest id wins on
    overlap — engine/zonal.rasterize_zones) then reuse the standard
    zonal_stats partial+final pass against the arithmetic DEM."""
    from engine import zonal
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    tiles = _dem_tiles(spark)
    zones = zonal.rasterize_zones(tiles, _ZONE_RINGS, 16, "z")
    return zonal.zonal_stats(tiles.unionAll(zones), 16, "zone", "z")


def _polygon_zonal_sql() -> str:
    # outer + hole edges share one parity sum per zone — even-odd hole
    # exclusion needs no extra SQL
    rows = ",\n    ".join(
        f"({entry[0]}, {x1!r}, {y1!r}, {x2!r}, {y2!r})"
        for entry in _ZONE_RINGS
        for ring in [entry[1]] + (list(entry[2]) if len(entry) > 2 else [])
        for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:])
    )
    return f"""
WITH {_DEM_SQL},
edges(zid, x1, y1, x2, y2) AS (
  VALUES
    {rows}
),
par AS (
  SELECT d.i, d.j, e.zid,
         SUM(CASE WHEN (e.y1 > d.j + 0.5) <> (e.y2 > d.j + 0.5)
                   AND d.i + 0.5 < e.x1 + (d.j + 0.5 - e.y1)
                                   / (e.y2 - e.y1) * (e.x2 - e.x1)
              THEN 1 ELSE 0 END) AS cr
  FROM dem d CROSS JOIN edges e GROUP BY d.i, d.j, e.zid
),
zz AS (SELECT i, j, MIN(zid) AS zone FROM par WHERE cr % 2 = 1 GROUP BY i, j)
SELECT CAST(zz.zone AS BIGINT) AS zone, COUNT(*) AS n_cells,
       ROUND(SUM(d.z), 4) AS z_sum,
       ROUND(SUM(d.z) / COUNT(*), 4) AS z_mean,
       ROUND(MIN(d.z), 4) AS z_min, ROUND(MAX(d.z), 4) AS z_max
FROM zz JOIN dem d ON d.i = zz.i AND d.j = zz.j GROUP BY 1
"""


_NLINES = 40


def sq_rasterize_lines(spark: SparkSession, sf: str) -> DataFrame:
    """Polyline supercover rasterization (engine/vector.rasterize_lines,
    V4): 40 deterministic segments (some out-of-bounds to exercise the
    clamps) → exact per-column interval cell sets on a 64×64 grid;
    per-line cell count + position checksum (pure integers)."""
    from engine import vector

    lines = spark.range(_NLINES).select(
        F.col("id").alias("line_id"),
        (((F.col("id") * 9301 + 49297) % 7400).cast("double") / 100 - 5).alias("x1"),
        (((F.col("id") * 23333 + 1021) % 7400).cast("double") / 100 - 5).alias("y1"),
        (((F.col("id") * 48271 + 11) % 7400).cast("double") / 100 - 5).alias("x2"),
        (((F.col("id") * 69621 + 7) % 7400).cast("double") / 100 - 5).alias("y2"),
    )
    cells = vector.rasterize_lines(lines, 64, 64)
    return cells.groupBy("line_id").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.col("i") + 64 * F.col("j")).alias("cell_checksum"),
    )


SQ_RASTERIZE_LINES_SQL = f"""
WITH raw AS (
  SELECT k AS line_id,
         CAST((k * 9301 + 49297) % 7400 AS DOUBLE) / 100 - 5 AS x1,
         CAST((k * 23333 + 1021) % 7400 AS DOUBLE) / 100 - 5 AS y1,
         CAST((k * 48271 + 11) % 7400 AS DOUBLE) / 100 - 5 AS x2,
         CAST((k * 69621 + 7) % 7400 AS DOUBLE) / 100 - 5 AS y2
  FROM range(0, {_NLINES}) t(k)
),
s AS (
  SELECT line_id,
         CASE WHEN x2 < x1 THEN x2 ELSE x1 END AS xs1,
         CASE WHEN x2 < x1 THEN y2 ELSE y1 END AS ys1,
         CASE WHEN x2 < x1 THEN x1 ELSE x2 END AS xs2,
         CASE WHEN x2 < x1 THEN y1 ELSE y2 END AS ys2
  FROM raw
),
cols AS (
  SELECT s.*, c.i,
         GREATEST(s.xs1, CAST(c.i AS DOUBLE)) AS xlo,
         LEAST(s.xs2, CAST(c.i AS DOUBLE) + 1.0) AS xhi
  FROM s CROSS JOIN range(0, 64) c(i)
  WHERE c.i BETWEEN GREATEST(FLOOR(s.xs1), 0) AND LEAST(FLOOR(s.xs2), 63)
),
ys AS (
  SELECT line_id, i,
         CASE WHEN xs2 = xs1 THEN LEAST(ys1, ys2)
              ELSE ys1 + (xlo - xs1) * ((ys2 - ys1) / (xs2 - xs1)) END AS ya,
         CASE WHEN xs2 = xs1 THEN GREATEST(ys1, ys2)
              ELSE ys1 + (xhi - xs1) * ((ys2 - ys1) / (xs2 - xs1)) END AS yb
  FROM cols
),
cells AS (
  SELECT line_id, i, r.j
  FROM ys CROSS JOIN range(0, 64) r(j)
  WHERE r.j BETWEEN GREATEST(FLOOR(LEAST(ya, yb)), 0)
                AND LEAST(FLOOR(GREATEST(ya, yb)), 63)
)
SELECT line_id, COUNT(*) AS n_cells,
       CAST(SUM(i + 64 * j) AS BIGINT) AS cell_checksum
FROM cells GROUP BY line_id
"""


def sq_polygon_measures(spark: SparkSession, sf: str) -> DataFrame:
    """Vector measures (engine/vector.polygon_measures): spherical
    shoelace area, haversine perimeter, vertex centroid of the fixture
    polygons (incl. the antimeridian-crossing rect, which the Δλ wrap
    must measure at its true 16° width, and the square-with-HOLE whose
    hole area subtracts and hole boundary adds to the perimeter) —
    pure JVM higher-order column fns, map-only."""
    from engine import fixtures, vector

    rows = [
        (
            p["poly_id"],
            [(float(v["lat"]), float(v["lon"])) for v in p["ring"]],
            [
                [(float(v["lat"]), float(v["lon"])) for v in h]
                for h in (p.get("holes") or [])
            ],
        )
        for p in fixtures.polygons_holed()
    ]
    polys = spark.createDataFrame(
        rows,
        "poly_id int, ring array<struct<lat:double,lon:double>>, "
        "holes array<array<struct<lat:double,lon:double>>>",
    )
    return vector.polygon_measures(polys, holes_col="holes")


def _polygon_measures_sql() -> str:
    from engine import fixtures

    R = 6371.0088
    e_rows, v_rows = [], []
    for p in fixtures.polygons_holed():
        # ring_id 0 = outer; >0 = holes (area subtracts, perimeter adds;
        # vertex count / centroid stay outer-ring-only like the engine)
        for rid, ring in enumerate([p["ring"]] + list(p.get("holes") or [])):
            for a, b in zip(ring[:-1], ring[1:]):
                e_rows.append(
                    f"({p['poly_id']}, {rid}, {a['lat']!r}, {a['lon']!r}, "
                    f"{b['lat']!r}, {b['lon']!r})"
                )
        for v in p["ring"][:-1]:
            v_rows.append(f"({p['poly_id']}, {v['lat']!r}, {v['lon']!r})")
    edges = ",\n    ".join(e_rows)
    verts = ",\n    ".join(v_rows)
    wrap = (
        "CASE WHEN (lo2 - lo1 + 180.0) % 360.0 < 0 "
        "THEN (lo2 - lo1 + 180.0) % 360.0 + 360.0 "
        "ELSE (lo2 - lo1 + 180.0) % 360.0 END - 180.0"
    )
    hav = (
        "POW(SIN((RADIANS(la2) - RADIANS(la1)) / 2), 2) "
        "+ COS(RADIANS(la1)) * COS(RADIANS(la2)) "
        "* POW(SIN((RADIANS(lo2) - RADIANS(lo1)) / 2), 2)"
    )
    return f"""
WITH edges(poly_id, ring_id, la1, lo1, la2, lo2) AS (
  VALUES
    {edges}
),
verts(poly_id, lat, lon) AS (
  VALUES
    {verts}
),
per_ring AS (
  SELECT poly_id, ring_id,
         ABS(SUM(RADIANS({wrap})
             * (2.0 + SIN(RADIANS(la1)) + SIN(RADIANS(la2))))) AS a,
         SUM(2.0 * {R!r} * ASIN(SQRT(LEAST(1.0, GREATEST(0.0, {hav}))))) AS perim
  FROM edges GROUP BY poly_id, ring_id
),
e AS (
  SELECT poly_id,
         SUM(CASE WHEN ring_id = 0 THEN a ELSE -a END) AS tot,
         SUM(perim) AS perim
  FROM per_ring GROUP BY poly_id
),
v AS (
  SELECT poly_id, COUNT(*) AS n_vertices,
         SUM(lat) AS slat, SUM(lon) AS slon
  FROM verts GROUP BY poly_id
)
SELECT v.poly_id, CAST(v.n_vertices AS INT) AS n_vertices,
       ROUND(e.tot * {R * R / 2.0!r}, 2) AS area_km2,
       ROUND(e.perim, 2) AS perim_km,
       ROUND(v.slat / v.n_vertices, 6) AS c_lat,
       ROUND(v.slon / v.n_vertices, 6) AS c_lon
FROM v JOIN e ON e.poly_id = v.poly_id
"""


_P58 = 1 << 58  # grid.cell_id_pack level shift as a BIGINT factor


def sq_compact_cells(spark: SparkSession, sf: str) -> DataFrame:
    """C8 cell-set compaction (engine/udfs.compact_cells): 600 scattered
    level-6 cells ∪ the complete morton block [0,64) (which must
    telescope three levels to a single level-3 cell); per-output-level
    cell count + morton checksum."""
    from engine import udfs

    m = (
        spark.range(600)
        .select(((F.col("id") * 2654435761) % 4096).alias("m"))
        .union(spark.range(64).select(F.col("id").alias("m")))
        .distinct()
    )
    cells = m.select((F.lit(6 * _P58) + F.col("m")).alias("cell_id"))
    out = udfs.compact_cells(cells, 6, min_level=3)
    return out.groupBy("level").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.col("cell_id").bitwiseAND(F.lit(_P58 - 1))).alias("morton_sum"),
    )


SQ_COMPACT_SQL = f"""
WITH m6 AS (
  SELECT DISTINCT (k * 2654435761) % 4096 AS m FROM range(0, 600) t(k)
  UNION SELECT r.m FROM range(0, 64) r(m)
),
f5 AS (SELECT m // 4 AS m FROM m6 GROUP BY 1 HAVING COUNT(*) = 4),
k6 AS (SELECT m FROM m6 WHERE m // 4 NOT IN (SELECT m FROM f5)),
f4 AS (SELECT m // 4 AS m FROM f5 GROUP BY 1 HAVING COUNT(*) = 4),
k5 AS (SELECT m FROM f5 WHERE m // 4 NOT IN (SELECT m FROM f4)),
f3 AS (SELECT m // 4 AS m FROM f4 GROUP BY 1 HAVING COUNT(*) = 4),
k4 AS (SELECT m FROM f4 WHERE m // 4 NOT IN (SELECT m FROM f3)),
out AS (
  SELECT 6 AS level, m FROM k6
  UNION ALL SELECT 5, m FROM k5
  UNION ALL SELECT 4, m FROM k4
  UNION ALL SELECT 3, m FROM f3
)
SELECT CAST(level AS INT) AS level, COUNT(*) AS n_cells,
       CAST(SUM(m) AS BIGINT) AS morton_sum
FROM out GROUP BY 1
"""


def sq_global_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT discrete p25/median/p75 of the arithmetic DEM via the
    iterative histogram k-select (engine/zonal.quantile_exact) — rank
    ceil(q·n), DuckDB quantile_disc semantics, element-exact across
    engines (no interpolation, no approx sketch)."""
    from engine import zonal
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    tiles = _dem_tiles(spark)
    p25, p50, p75 = zonal.quantile_exact(tiles, "z", [0.25, 0.5, 0.75])
    n = 3952  # fixture-constant; asserted equal by the oracle column
    return spark.createDataFrame(
        [(n, round(p25, 6), round(p50, 6), round(p75, 6))],
        "n_cells bigint, p25 double, p50 double, p75 double",
    )


SQ_QUANTILES_SQL = f"""
WITH {_DEM_SQL}
SELECT COUNT(*) AS n_cells,
       ROUND(QUANTILE_DISC(z, 0.25), 6) AS p25,
       ROUND(QUANTILE_DISC(z, 0.5), 6) AS p50,
       ROUND(QUANTILE_DISC(z, 0.75), 6) AS p75
FROM dem
"""


def sq_zonal(spark: SparkSession, sf: str) -> DataFrame:
    """A6 consolidated (one driver row, every zonal source exercised):
    cell-raster zones ('cell' rows) ∪ polygon-rasterized zones ('poly'
    rows) ∪ the round-3 cross-tabulation / tabulate-area ('xtab' rows,
    zone = class_a·1000 + class_b pair code) — identical partial+final
    tile pass under all three (engine/zonal.py)."""
    a = sq_zonal_stats(spark, sf).select(
        F.lit("cell").alias("zone_kind"), "*"
    )
    b = sq_polygon_zonal(spark, sf).select(
        F.lit("poly").alias("zone_kind"), "*"
    )
    c = _zonal_cross_tab(spark, sf)
    return a.unionAll(b).unionAll(c)


def _zonal_cross_tab(spark: SparkSession, sf: str) -> DataFrame:
    """cross_tab (tabulate-area) leg of sq_zonal: arith class raster ×
    FLOOR(dem/4) class bands; pair code packs into the zone column."""
    import numpy as np
    import pandas as pd

    from engine import algebra, fixtures, zonal
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    tiles = spark.createDataFrame(
        pd.concat(
            [
                fixtures.tiles_rows_from_array(
                    fixtures.raster_arith(size=64), 16, band="zone"
                ),
                fixtures.tiles_rows_from_array(
                    fixtures.dem_arith(size=64), 16, band="z"
                ),
            ],
            ignore_index=True,
        ),
        fixtures.TILES_SCHEMA_DDL,
    )
    zb = algebra.local_map(
        tiles, 16, "zb", lambda got: np.floor(got["z"] / 4.0), ["z"]
    )
    xt = zonal.cross_tab(tiles.unionByName(zb), 16, "zone", "zb")
    return xt.select(
        F.lit("xtab").alias("zone_kind"),
        (F.col("ca") * 1000 + F.col("cb")).cast("long").alias("zone"),
        F.col("n_cells"),
        F.lit(0.0).alias("z_sum"),
        F.lit(0.0).alias("z_mean"),
        F.lit(0.0).alias("z_min"),
        F.lit(0.0).alias("z_max"),
    )


_XTAB_SQL_BODY = """
SELECT 'xtab' AS zone_kind,
       CAST(c.klass * 1000 + CAST(FLOOR(d.z / 4.0) AS BIGINT) AS BIGINT) AS zone,
       COUNT(*) AS n_cells,
       0.0 AS z_sum, 0.0 AS z_mean, 0.0 AS z_min, 0.0 AS z_max
FROM cells c JOIN dem d ON d.i = c.i AND d.j = c.j
GROUP BY 2
"""


def _zonal_merged_sql() -> str:
    xtab = f"WITH {_RASTER_ARITH_SQL},\n{_DEM_SQL}\n{_XTAB_SQL_BODY}"
    return f"""
SELECT 'cell' AS zone_kind, * FROM ({SQ_ZONAL_SQL})
UNION ALL
SELECT 'poly' AS zone_kind, * FROM ({_polygon_zonal_sql()})
UNION ALL
SELECT * FROM ({xtab})
"""


def sq_zonal_cat(spark: SparkSession, sf: str) -> DataFrame:
    """Zonal categorical statistics (engine/zonal.zonal_categorical,
    round 4): per-zone MAJORITY / MINORITY class (pinned tie rule:
    lowest class wins) and VARIETY over the FLOOR(dem/4) class raster,
    zones = the arithmetic Voronoi raster — the same regenerable grids
    the xtab leg uses, so the oracle is a count CTE + window ranking."""
    import numpy as np
    import pandas as pd

    from engine import algebra, fixtures, zonal
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    tiles = spark.createDataFrame(
        pd.concat(
            [
                fixtures.tiles_rows_from_array(
                    fixtures.raster_arith(size=64), 16, band="zone"
                ),
                fixtures.tiles_rows_from_array(
                    fixtures.dem_arith(size=64), 16, band="z"
                ),
            ],
            ignore_index=True,
        ),
        fixtures.TILES_SCHEMA_DDL,
    )
    zb = algebra.local_map(
        tiles, 16, "zb", lambda got: np.floor(got["z"] / 4.0), ["z"]
    )
    return zonal.zonal_categorical(
        tiles.unionByName(zb), 16, zone_band="zone", class_band="zb"
    )


SQ_ZONAL_CAT_SQL = f"""
WITH {_RASTER_ARITH_SQL},
{_DEM_SQL},
paircnt AS (
  SELECT c.klass AS zone, CAST(FLOOR(d.z / 4.0) AS BIGINT) AS cls,
         COUNT(*) AS n
  FROM cells c JOIN dem d ON d.i = c.i AND d.j = c.j
  GROUP BY 1, 2
),
ranked AS (
  SELECT zone, cls, n,
         ROW_NUMBER() OVER (PARTITION BY zone ORDER BY n DESC, cls ASC) AS rmaj,
         ROW_NUMBER() OVER (PARTITION BY zone ORDER BY n ASC, cls ASC) AS rmin
  FROM paircnt
)
SELECT CAST(zone AS BIGINT) AS zone,
       CAST(SUM(n) AS BIGINT) AS n_cells,
       CAST(MAX(CASE WHEN rmaj = 1 THEN cls END) AS BIGINT) AS majority,
       CAST(MAX(CASE WHEN rmin = 1 THEN cls END) AS BIGINT) AS minority,
       CAST(COUNT(*) AS BIGINT) AS variety
FROM ranked GROUP BY 1
"""


def sq_sample_points(spark: SparkSession, sf: str) -> DataFrame:
    """L3+L4 consolidated (one driver row, both drills exercised):
    nearest-pixel raster sampling per tile ('nearest' rows) unioned
    with the bilinear point drill per bucket ('bilinear' rows) —
    former sq_sample_raster / sq_sample_bilinear entries."""
    a = sq_sample_raster(spark, sf).select(
        F.lit("nearest").alias("method"),
        F.col("tile_x").alias("bx"),
        F.col("tile_y").alias("by"),
        "n_pts",
        F.col("val_sum").alias("v_sum"),
    )
    b = sq_sample_bilinear(spark, sf).select(
        F.lit("bilinear").alias("method"),
        F.col("bucket").alias("bx"),
        F.lit(-1).cast("int").alias("by"),
        F.col("n_pts").cast("long").alias("n_pts"),
        "v_sum",
    )
    return a.unionAll(b)


SQ_SAMPLE_POINTS_SQL = f"""
SELECT 'nearest' AS method, tile_x AS bx, tile_y AS by, n_pts,
       val_sum AS v_sum
FROM ({SQ_SAMPLE_SQL})
UNION ALL
SELECT 'bilinear', bucket, CAST(-1 AS INT), CAST(n_pts AS BIGINT), v_sum
FROM ({SQ_SAMPLE_BILINEAR_SQL})
"""


def sq_vector_ops(spark: SparkSession, sf: str) -> DataFrame:
    """V4+V5 consolidated (one driver row, both operators exercised):
    polyline supercover rasterization checksums ('line' rows:
    gid/n=cells/m1=checksum) unioned with spherical polygon measures
    ('poly' rows: gid/n=vertices/m1=area/m2=perim/m3,m4=centroid) —
    former sq_rasterize_lines / sq_polygon_measures entries."""
    a = sq_rasterize_lines(spark, sf).select(
        F.lit("line").alias("kind"),
        F.col("line_id").cast("long").alias("gid"),
        F.col("n_cells").cast("long").alias("n"),
        F.col("cell_checksum").cast("double").alias("m1"),
        F.lit(0.0).alias("m2"),
        F.lit(0.0).alias("m3"),
        F.lit(0.0).alias("m4"),
    )
    b = sq_polygon_measures(spark, sf).select(
        F.lit("poly").alias("kind"),
        F.col("poly_id").cast("long").alias("gid"),
        F.col("n_vertices").cast("long").alias("n"),
        F.col("area_km2").alias("m1"),
        F.col("perim_km").alias("m2"),
        F.col("c_lat").alias("m3"),
        F.col("c_lon").alias("m4"),
    )
    return a.unionAll(b)


def _vector_ops_sql() -> str:
    return f"""
SELECT 'line' AS kind, CAST(line_id AS BIGINT) AS gid,
       CAST(n_cells AS BIGINT) AS n, CAST(cell_checksum AS DOUBLE) AS m1,
       0.0 AS m2, 0.0 AS m3, 0.0 AS m4
FROM ({SQ_RASTERIZE_LINES_SQL})
UNION ALL
SELECT 'poly', CAST(poly_id AS BIGINT), CAST(n_vertices AS BIGINT),
       area_km2, perim_km, c_lat, c_lon
FROM ({_polygon_measures_sql()})
"""


def sq_global_summary(spark: SparkSession, sf: str) -> DataFrame:
    """G1+G2+G4 consolidated (one driver row, all three global ops
    exercised) on the arithmetic DEM: fixed-bin histogram rows
    ('hist', bin, n, Σv), decomposable global stats rows ('stat_*'),
    and the exact p25/p50/p75 via iterative histogram k-selection
    ('q', 25/50/75) — former sq_global_stats / sq_raster_histogram /
    sq_global_quantiles entries. Long format (metric, key, n, v) so
    one schema carries all three."""
    from engine import zonal
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    tiles = _dem_tiles(spark)
    hist = zonal.raster_histogram(tiles, "z", -2.0, 8.0, 20).select(
        F.lit("hist").alias("metric"),
        F.col("bin").cast("long").alias("key"),
        F.col("n_cells").alias("n"),
        F.col("v_sum").alias("v"),
    )
    stats = zonal.global_stats(tiles, "z").selectExpr(
        """stack(5,
           'stat_sum',  CAST(0 AS BIGINT), n_cells, v_sum,
           'stat_mean', CAST(0 AS BIGINT), n_cells, v_mean,
           'stat_min',  CAST(0 AS BIGINT), n_cells, v_min,
           'stat_max',  CAST(0 AS BIGINT), n_cells, v_max,
           'stat_std',  CAST(0 AS BIGINT), n_cells, v_std
        ) AS (metric, key, n, v)"""
    )
    p25, p50, p75 = zonal.quantile_exact(tiles, "z", [0.25, 0.5, 0.75])
    n = 3952  # fixture-constant; asserted equal by the oracle column
    quants = spark.createDataFrame(
        [
            ("q", 25, n, round(p25, 6)),
            ("q", 50, n, round(p50, 6)),
            ("q", 75, n, round(p75, 6)),
        ],
        "metric string, key long, n long, v double",
    )
    return hist.unionAll(stats).unionAll(quants)


SQ_GLOBAL_SUMMARY_SQL = f"""
WITH {_DEM_SQL},
s AS (
  SELECT COUNT(*) AS n, SUM(z) AS sm, SUM(z * z) AS s2,
         MIN(z) AS mn, MAX(z) AS mx,
         QUANTILE_DISC(z, 0.25) AS p25, QUANTILE_DISC(z, 0.5) AS p50,
         QUANTILE_DISC(z, 0.75) AS p75
  FROM dem
)
SELECT 'hist' AS metric,
       LEAST(GREATEST(CAST(FLOOR((z - (-2.0)) / 0.5) AS BIGINT), -1), 20) AS key,
       COUNT(*) AS n, ROUND(SUM(z), 4) AS v
FROM dem GROUP BY 2
UNION ALL SELECT 'stat_sum',  CAST(0 AS BIGINT), n, ROUND(sm, 4) FROM s
UNION ALL SELECT 'stat_mean', CAST(0 AS BIGINT), n, ROUND(sm / n, 6) FROM s
UNION ALL SELECT 'stat_min',  CAST(0 AS BIGINT), n, ROUND(mn, 6) FROM s
UNION ALL SELECT 'stat_max',  CAST(0 AS BIGINT), n, ROUND(mx, 6) FROM s
UNION ALL SELECT 'stat_std',  CAST(0 AS BIGINT), n,
                 ROUND(SQRT(s2 / n - (sm / n) * (sm / n)), 6) FROM s
UNION ALL SELECT 'q', 25, n, ROUND(p25, 6) FROM s
UNION ALL SELECT 'q', 50, n, ROUND(p50, 6) FROM s
UNION ALL SELECT 'q', 75, n, ROUND(p75, 6) FROM s
"""


_LS_R = 3  # landscape window radius (square), annulus r_in = 1.5


def sq_landscape(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's FLAGSHIP landscape indicators (SURVEY §2.6
    W5–W10 + W23 + W34) over the arithmetic Voronoi class raster, all
    eight bands from ONE square r=3 halo exchange:

      prop1     W5  fraction of valid window cells of class 1
      rich      W6  distinct classes in window
      shannon   W7  −Σ p ln p (natural log, 0·ln0 = 0)
      majority  W8  modal class, tie → smallest class id
      minority  W34 least-frequent PRESENT class, tie → smallest
      edged     W9  boundary-edge fraction among edges fully inside W
      iji       W10 IJI evenness of the boundary class-pair mix,
                    normalized by ln C(4,2) (global class domain —
                    passed explicitly so tile+halo blocks missing a
                    class can't skew the denominator)
      annulus   W23 ring mean, 1.5 < d ≤ 3 (exact chord sums)

    Oracle: DuckDB regenerates the raster (cells CTE) and replays every
    band as a window contribution join; per-cell micro-quantization
    (×1e6 int64 sums) makes the tile checksums order-free and exact."""
    import numpy as np

    from engine import fixtures, kernels, tiling
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(
            fixtures.raster_arith(size=64), 16, band="klass"
        ),
        fixtures.TILES_SCHEMA_DDL,
    )
    classes = np.arange(4, dtype=np.float64)
    stats = {
        "prop1": lambda a, r, s: kernels.focal_proportion(a, r, 1.0, s),
        "rich": kernels.focal_richness,
        "shannon": kernels.focal_shannon,
        "majority": kernels.focal_majority,
        "minority": kernels.focal_minority,
        "edged": kernels.focal_edge_density,
        "iji": lambda a, r, s: kernels.focal_interspersion(
            a, r, s, classes=classes
        ),
        "annulus": lambda a, r, s: kernels.focal_annulus_mean(a, r, 1.5),
    }
    out = tiling.apply_focal(tiles, _LS_R, "square", stats, 16, level=10)
    return _tile_summary_quantized(out)


def _landscape_oracle_sql() -> str:
    r = _LS_R

    def finish(val_cte: str, band: str) -> str:
        """Tile rollup of one per-center value CTE (ci, cj, val). Joined
        against the full tile universe: a tile whose every center is
        invalid for a band (e.g. no boundary edge within any window —
        IJI over a Voronoi interior) still emits its n_valid=0 row,
        exactly like the engine's dense tile output."""
        return f"""
SELECT CAST(t16.tx AS INT) AS tile_x, CAST(t16.ty AS INT) AS tile_y,
       '{band}' AS band, CAST(COALESCE(a.nv, 0) AS BIGINT) AS n_valid,
       COALESCE(a.ts, 0.0) AS tile_sum
FROM tiles16 t16 LEFT JOIN (
  SELECT ci // 16 AS tx, cj // 16 AS ty, COUNT(*) AS nv,
         ROUND(SUM(CAST(ROUND(val * 1000000.0) AS BIGINT)) / 1000000.0, 4)
           AS ts
  FROM {val_cte} GROUP BY 1, 2
) a ON a.tx = t16.tx AND a.ty = t16.ty"""

    return f"""
WITH {_RASTER_ARITH_SQL},
ctr AS (SELECT x.i AS ci, y.j AS cj FROM range(0, 64) x(i), range(0, 64) y(j)),
tiles16 AS (SELECT x.tx AS tx, y.ty AS ty FROM range(0, 4) x(tx), range(0, 4) y(ty)),
wcnt AS MATERIALIZED (
  SELECT t.ci, t.cj, c.klass, COUNT(*) AS n
  FROM ctr t JOIN cells c
    ON c.i BETWEEN t.ci - {r} AND t.ci + {r}
   AND c.j BETWEEN t.cj - {r} AND t.cj + {r}
  GROUP BY 1, 2, 3
),
wtot AS MATERIALIZED (
  SELECT ci, cj, CAST(SUM(n) AS DOUBLE) AS den FROM wcnt GROUP BY 1, 2
),
prop AS (
  SELECT w.ci, w.cj, COALESCE(p.n, 0) / w.den AS val
  FROM wtot w LEFT JOIN (SELECT ci, cj, n FROM wcnt WHERE klass = 1) p
    ON p.ci = w.ci AND p.cj = w.cj
),
rich AS (
  SELECT ci, cj, CAST(COUNT(*) AS DOUBLE) AS val FROM wcnt GROUP BY 1, 2
),
shan AS (
  SELECT c.ci, c.cj,
         -SUM((c.n / w.den) * LN(c.n / w.den)) AS val
  FROM wcnt c JOIN wtot w ON w.ci = c.ci AND w.cj = c.cj
  GROUP BY 1, 2
),
majo AS (
  SELECT ci, cj, CAST(klass AS DOUBLE) AS val FROM (
    SELECT ci, cj, klass,
           ROW_NUMBER() OVER (
             PARTITION BY ci, cj ORDER BY n DESC, klass ASC) AS rn
    FROM wcnt
  ) WHERE rn = 1
),
mino AS (
  SELECT ci, cj, CAST(klass AS DOUBLE) AS val FROM (
    SELECT ci, cj, klass,
           ROW_NUMBER() OVER (
             PARTITION BY ci, cj ORDER BY n ASC, klass ASC) AS rn
    FROM wcnt
  ) WHERE rn = 1
),
-- edges anchored at the left/top endpoint; an edge is valid iff BOTH
-- endpoints are valid cells; window membership: both endpoints in W
alledges AS MATERIALIZED (
  SELECT a.i, a.j,
         CASE WHEN a.klass != b.klass THEN 1 ELSE 0 END AS d,
         a.klass AS ka, b.klass AS kb,
         {r - 1} AS imax_off, {r} AS jmax_off
  FROM cells a JOIN cells b ON b.i = a.i + 1 AND b.j = a.j
  UNION ALL
  SELECT a.i, a.j,
         CASE WHEN a.klass != b.klass THEN 1 ELSE 0 END,
         a.klass, b.klass, {r}, {r - 1}
  FROM cells a JOIN cells b ON b.i = a.i AND b.j = a.j + 1
),
edg AS (
  SELECT t.ci, t.cj,
         CAST(SUM(e.d) AS DOUBLE) / COUNT(*) AS val,
         SUM(e.d) AS nd
  FROM ctr t JOIN alledges e
    ON e.i BETWEEN t.ci - {r} AND t.ci + e.imax_off
   AND e.j BETWEEN t.cj - {r} AND t.cj + e.jmax_off
  GROUP BY 1, 2
),
wpair AS (
  SELECT t.ci, t.cj, LEAST(e.ka, e.kb) AS pa, GREATEST(e.ka, e.kb) AS pb,
         COUNT(*) AS n
  FROM ctr t JOIN alledges e
    ON e.d = 1
   AND e.i BETWEEN t.ci - {r} AND t.ci + e.imax_off
   AND e.j BETWEEN t.cj - {r} AND t.cj + e.jmax_off
  GROUP BY 1, 2, 3, 4
),
wpt AS (SELECT ci, cj, CAST(SUM(n) AS DOUBLE) AS tot FROM wpair GROUP BY 1, 2),
iji AS (
  SELECT p.ci, p.cj,
         -SUM((p.n / t.tot) * LN(p.n / t.tot)) / LN(6.0) AS val
  FROM wpair p JOIN wpt t ON t.ci = p.ci AND t.cj = p.cj
  GROUP BY 1, 2
),
-- annulus 1.5 < d <= 3: integer d² in {{4, 5, 8, 9}} (no integer d²=3)
ann AS (
  SELECT t.ci, t.cj, SUM(c.klass) / CAST(COUNT(*) AS DOUBLE) AS val
  FROM ctr t JOIN cells c
    ON (c.i - t.ci) * (c.i - t.ci) + (c.j - t.cj) * (c.j - t.cj)
         BETWEEN 3 AND {r * r}
  GROUP BY 1, 2
)
{finish("prop", "prop1")}
UNION ALL {finish("rich", "rich")}
UNION ALL {finish("shan", "shannon")}
UNION ALL {finish("majo", "majority")}
UNION ALL {finish("mino", "minority")}
UNION ALL {finish("edg", "edged")}
UNION ALL {finish("iji", "iji")}
UNION ALL {finish("ann", "annulus")}
"""


def sq_lakehouse(spark: SparkSession, sf: str) -> DataFrame:
    """Lakehouse surface behind the driver hash (S2–S4, S9, S10 —
    round 5, closing VERDICT r4 "What's missing" №4):

      pinned  — snapshot-PINNED read (time travel): stage 1 commits the
                n_nationkey < 15 carve; after stage 2 overwrites with
                the full table, the pinned read must still return
                exactly the carve (S3) through the manifest-driven
                file-list scan (S2), via the CAS/WAL commit path (S4).
      latest  — read AFTER bin-pack compaction (S9): multi-file
                partitions rewritten to 1 file each under the checksum
                abort rule; the head read must equal the full source.
      zorder  — Z-order clustered layout + footer-stats file pruning
                (S10): document cells written range-clustered, a bbox
                compiled to Morton ranges prunes files from footers
                alone, and the PRUNED scan must still produce the exact
                bbox answer (a pruner that drops a needed file fails
                the hash).

    Oracle: every leg is recomputable from the raw source tables — the
    lakehouse machinery must be a semantic no-op over them."""
    import os
    import shutil
    import tempfile

    from engine import grid, layout, udfs
    from engine.deploy import ensure_shipped
    from engine.lakehouse import LakeTable
    from engine.shim import documents_interleaved

    ensure_shipped(spark)
    base = os.path.join(
        tempfile.gettempdir(),
        # pid-keyed: stable within a process (rmtree+rebuild on rerun)
        # but isolated across concurrent runs over the same fixture —
        # a shared path let one process rmtree files another process's
        # lazily-evaluated snapshot reads still referenced
        f"mw_lakehouse_{os.path.basename(os.path.normpath(sf))}_{os.getpid()}",
    )
    shutil.rmtree(base, ignore_errors=True)

    nation = spark.read.parquet(os.path.join(sf, "nation.parquet"))
    tbl = LakeTable(base, "nation")
    s1 = tbl.write_stage(
        spark,
        nation.filter(F.col("n_nationkey") < 15).repartition(4),
        "n_regionkey",
        "ingest-v1",
        {"inputs": [f"{sf}/nation.parquet"], "params": {"carve": "<15"}},
    )
    tbl.write_stage(
        spark,
        nation.repartition(4),
        "n_regionkey",
        "ingest-v2",
        {"inputs": [f"{sf}/nation.parquet"]},
    )
    tbl.compact(spark, max_files_per_partition=1)

    def per_part(df: DataFrame, label: str) -> DataFrame:
        return df.groupBy(
            F.col("n_regionkey").cast("long").alias("part")
        ).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_nationkey").cast("long").alias("key_sum"),
        ).select(F.lit(label).alias("snap"), "part", "n_rows", "key_sum")

    pinned = per_part(tbl.read(spark, snapshot_id=s1["snapshot_id"]), "pinned")
    latest = per_part(tbl.read(spark), "latest")

    # S10 leg: cluster the level-8 document cells, prune by footer stats
    level = 8
    docs = documents_interleaved(spark, sf)
    pts = udfs.geocode_cols(docs).select(
        "doc_id",
        udfs.cell_encode_pudf(
            F.col("lat"), F.col("lon"), F.lit(level)
        ).alias("cell_id"),
    )
    zdir = os.path.join(base, "zorder")
    layout.write_clustered(pts, "cell_id", zdir, n_files=8)
    ranges = grid.bbox_to_cell_ranges(5.0, 35.0, 100.0, 140.0, level)
    spans = layout.file_cell_spans(zdir, "cell_id")
    keep = layout.pruned_files(spans, ranges)
    pred = None
    for lo, hi in ranges:
        c = F.col("cell_id").between(lo, hi)
        pred = c if pred is None else (pred | c)
    zd = (
        spark.read.parquet(*keep)
        .filter(pred)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("doc_id").cast("long").alias("key_sum"),
        )
        .select(
            F.lit("zorder").alias("snap"),
            F.lit(-1).cast("long").alias("part"),
            "n_rows",
            "key_sum",
        )
    )
    return pinned.unionByName(latest).unionByName(zd)


def _lakehouse_oracle_sql() -> str:
    from engine.queries import _DOC_POINTS_SQL

    return f"""
WITH pts AS ({_DOC_POINTS_SQL}),
cells AS (
  SELECT doc_id,
         ((CAST(FLOOR((lon + 180) / 360 * 256) AS BIGINT) % 256) + 256) % 256 AS i,
         GREATEST(0, LEAST(127, CAST(FLOOR((lat + 90) / 180 * 128) AS BIGINT))) AS j
  FROM pts
)
SELECT 'pinned' AS snap, CAST(n_regionkey AS BIGINT) AS part,
       COUNT(*) AS n_rows, CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
FROM nation WHERE n_nationkey < 15 GROUP BY 2
UNION ALL
SELECT 'latest', CAST(n_regionkey AS BIGINT), COUNT(*),
       CAST(SUM(n_nationkey) AS BIGINT)
FROM nation GROUP BY 2
UNION ALL
SELECT 'zorder', CAST(-1 AS BIGINT), COUNT(*), CAST(SUM(doc_id) AS BIGINT)
FROM cells WHERE i BETWEEN 199 AND 227 AND j BETWEEN 67 AND 88
"""


def sq_ascii_io(spark: SparkSession, sf: str) -> DataFrame:
    """S6 raster interchange behind the driver hash (round 5 — raster
    ingest is the one §2 row kept "partial" by sandbox constraint, no
    GDAL/rasterio exists here; ESRI ASCII is the interchange stand-in,
    engine/raster_io.py). The level-9 doc-count raster round-trips
    through an .asc file and back into tiles:

      src — tile summary straight off rasterize (occupied pixels only;
            empty pixels are NaN/nodata by the rasterize contract).
      rt  — the same after write_ascii_grid → parse → re-tile. The
            written array spans the bounding extent from tile (0,0)
            (array_from_tiles_rows), so absent tiles inside that extent
            come back as all-nodata tiles with n_valid=0 — the oracle
            enumerates the extent rectangle to pin exactly that.

    `repr()` float formatting round-trips doubles losslessly, so 'rt'
    occupied tiles must hash identically to 'src'."""
    import os
    import tempfile

    from engine import raster_io, tiling, udfs
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    level, T = 9, 32
    docs = shim.documents_interleaved(spark, sf)
    pts = udfs.with_cell_and_tile(udfs.geocode_cols(docs), level, T)
    tiles = tiling.rasterize(pts, T, level, stat="count")
    tiles.persist()

    path = os.path.join(
        tempfile.gettempdir(),
        # pid-keyed like sq_lakehouse's scratch: concurrent processes
        # over the same fixture must not overwrite each other's file
        f"mw_ascii_{os.path.basename(os.path.normpath(sf))}_{os.getpid()}.asc",
    )
    raster_io.write_ascii_grid(tiles, T, path)
    back = raster_io.read_ascii_grid(spark, path, T, level=level, band="count")

    src = _tile_summary(tiles).withColumn("band", F.lit("src"))
    rt = _tile_summary(back).withColumn("band", F.lit("rt"))
    return src.unionByName(rt)


# 'src' = occupied tiles (n_valid = occupied pixels); 'rt' adds the
# all-nodata tiles of the bounding extent [0, max_tx] x [0, max_ty]
# (level-9 tile grid is at most 16 x 8, so the range() is bounded by
# literals and filtered by the measured extent).
SQ_ASCII_IO_SQL = f"""
WITH {_CNT_SQL},
tsum AS (
  SELECT gi // 32 AS tx, gj // 32 AS ty,
         COUNT(*) AS nv, ROUND(SUM(v), 4) AS s
  FROM cnt GROUP BY 1, 2
),
ext AS (SELECT MAX(tx) AS mx, MAX(ty) AS my FROM tsum),
allt AS (
  SELECT x.i AS tx, y.j AS ty FROM range(0, 16) x(i), range(0, 8) y(j)
  WHERE x.i <= (SELECT mx FROM ext) AND y.j <= (SELECT my FROM ext)
)
SELECT CAST(tx AS INT) AS tile_x, CAST(ty AS INT) AS tile_y,
       'src' AS band, CAST(nv AS BIGINT) AS n_valid, s AS tile_sum
FROM tsum
UNION ALL
SELECT CAST(a.tx AS INT), CAST(a.ty AS INT), 'rt',
       CAST(COALESCE(t.nv, 0) AS BIGINT), COALESCE(t.s, 0.0)
FROM allt a LEFT JOIN tsum t ON t.tx = a.tx AND t.ty = a.ty
"""


# name -> (fn, oracle_sql | None); None = driver rows-only check
SPATIAL_QUERIES: dict[str, tuple[Query, str | None]] = {
    "sq_focal_mean_circle": (sq_focal_mean_circle, SQ_FOCAL_MEAN_CIRCLE_SQL),
    "sq_focal_multi": (sq_focal_multi, SQ_FOCAL_MULTI_SQL),
    "sq_pip_polygons": (sq_pip_polygons, _pip_oracle_sql()),
    "sq_patch_stats": (sq_patch_stats, SQ_PATCH_STATS_SQL),
    "sq_raster_to_vector": (sq_raster_to_vector, SQ_RASTER_TO_VECTOR_SQL),
    "sq_multimodal_features": (sq_multimodal_features, _multimodal_oracle_sql()),
    "sq_terrain": (sq_terrain, SQ_TERRAIN_SQL),
    "sq_zonal": (sq_zonal, _zonal_merged_sql()),
    "sq_zonal_cat": (sq_zonal_cat, SQ_ZONAL_CAT_SQL),
    "sq_landscape": (sq_landscape, _landscape_oracle_sql()),
    "sq_lakehouse": (sq_lakehouse, _lakehouse_oracle_sql()),
    "sq_ascii_io": (sq_ascii_io, SQ_ASCII_IO_SQL),
    "sq_cost_path": (sq_cost_path, SQ_COST_PATH_SQL),
    "sq_contour": (sq_contour, _contour_oracle_sql()),
    "sq_pyramid": (sq_pyramid, SQ_PYRAMID_SQL),
    "sq_reclass_algebra": (sq_reclass_algebra, SQ_RECLASS_SQL),
    "sq_sample_points": (sq_sample_points, SQ_SAMPLE_POINTS_SQL),
    "sq_upsample": (sq_upsample, SQ_UPSAMPLE_SQL),
    "sq_overlay": (sq_overlay, _overlay_oracle_sql()),
    "sq_moran": (sq_moran, SQ_MORAN_SQL),
    "sq_hotspot": (sq_hotspot, SQ_HOTSPOT_SQL),
    "sq_trend": (sq_trend, SQ_TREND_SQL),
    "sq_openness": (sq_openness, SQ_OPENNESS_SQL),
    "sq_flowlen": (sq_flowlen, SQ_FLOWLEN_SQL),
    "sq_zonal_geom": (sq_zonal_geom, SQ_ZONAL_GEOM_SQL),
    "sq_zonal_pct": (sq_zonal_pct, SQ_ZONAL_PCT_SQL),
    "sq_hull": (sq_hull, SQ_HULL_SQL),
    "sq_idw": (sq_idw, SQ_IDW_SQL),
    "sq_vector_ops": (sq_vector_ops, _vector_ops_sql()),
    "sq_compact_cells": (sq_compact_cells, SQ_COMPACT_SQL),
    "sq_global_summary": (sq_global_summary, SQ_GLOBAL_SUMMARY_SQL),
}
