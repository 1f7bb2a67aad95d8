"""Non-SQL-expressible queries (driver records rows-only checks; the
real correctness gate for these is the brute-force golden suite in
tests/). Each returns a flat DataFrame (no array payloads) so the
driver can hash rows stably."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Query = Callable[[SparkSession, str], DataFrame]


def _tile_summary(out: DataFrame) -> DataFrame:
    # nodata pixels surface as NULL (Arrow) or NaN — exclude both;
    # note isnan(NULL) is false in Spark, so the null check is required
    valid = F.filter("data", lambda x: x.isNotNull() & ~F.isnan(x))
    return out.select(
        "tile_x",
        "tile_y",
        "band",
        F.size(valid).alias("n_valid"),
        F.round(F.aggregate(valid, F.lit(0.0), lambda a, x: a + x), 4).alias("tile_sum"),
    )


def sq_focal_mean_circle(spark: SparkSession, sf: str) -> DataFrame:
    """W2: circular-kernel (r=7) focal mean of doc density per cell."""
    from engine import shim, tiling, udfs
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


def sq_focal_multi(spark: SparkSession, sf: str) -> DataFrame:
    """W1/W3/W4 family in one halo exchange: square sum, gaussian
    weighted mean, max."""
    from engine import kernels, shim, tiling, udfs
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
    }
    out = tiling.apply_focal(
        tiles, 5, "square", stats, T, level=level, wrap_nx=(2**level) // T
    )
    return _tile_summary(out)


def sq_pip_polygons(spark: SparkSession, sf: str) -> DataFrame:
    """J1+J2 on the full fixture polygon set (convex quad, concave
    star, antimeridian-crossing rect) — geometry beyond what plain SQL
    can oracle; golden-tested in tests/test_joins.py."""
    from engine import fixtures, joins, shim
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    d = spark.read.parquet(f"{sf}/documents.parquet")
    pts = d.select(
        "doc_id",
        shim.shim_lat_col(F.col("doc_id")).alias("lat"),
        shim.shim_lon_col(F.col("doc_id")).alias("lon"),
    )
    hits = joins.pip_join(pts, fixtures.polygons(), level=6, spark=spark)
    return hits.groupBy("poly_id").agg(
        F.count(F.lit(1)).alias("n_pts"), F.sum("doc_id").alias("docid_sum")
    )


def sq_patch_stats(spark: SparkSession, sf: str) -> DataFrame:
    """W11–W14: distributed CCL + edge-corrected patch statistics over
    the deterministic raster fixture (golden-tested per cell in
    tests/test_patches.py; here summarized per tile for the driver)."""
    from engine import fixtures, patches
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    arr = fixtures.raster_fixture(seed=42, size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="class"),
        fixtures.TILES_SCHEMA_DDL,
    )
    out = patches.apply_patch_stats(tiles, 16, r=3, shape="square", spark=spark)
    return _tile_summary(out)


def sq_raster_to_vector(spark: SparkSession, sf: str) -> DataFrame:
    """M6 raster→vector: polygonize patch labels into boundary rings
    (round-trip golden in tests/test_vector.py). Flat summary row per
    patch: ring count, outer-ring vertex count, net area."""
    from engine import fixtures, patches, vector
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    arr = fixtures.raster_fixture(seed=42, size=64)
    tiles = spark.createDataFrame(
        fixtures.tiles_rows_from_array(arr, 16, band="class"),
        fixtures.TILES_SCHEMA_DDL,
    )
    label_tiles, _ = patches.build_patches(tiles, 16, spark)
    rings = vector.polygonize(label_tiles, 16)
    return rings.groupBy("patch_id").agg(
        F.count(F.lit(1)).alias("n_rings"),
        F.sum(F.when(F.col("is_outer"), F.col("n_pts"))).alias("outer_pts"),
        F.round(F.sum("signed_area"), 1).alias("net_area"),
    )


def sq_multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal span decode plumbing (stubbed decoder — no media libs
    in this sandbox; see engine/multimodal.py): per-kind feature stats
    over the interleaved corpus derived from the driver documents."""
    from engine import fixtures, multimodal
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    # the driver documents carry no media spans — use the deterministic
    # interleaved fixture corpus (text + geo + image spans, seeded)
    docs = fixtures.documents_geo(spark, 500, seed=42)
    feats = multimodal.extract_media_features(docs, kinds=("image", "geo"))
    return feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.col("width").cast("long")).alias("width_sum"),
        F.sum(F.col("n_frames").cast("long")).alias("frames_sum"),
        F.round(F.sum(F.aggregate("feat", F.lit(0.0), lambda a, x: a + x)), 4).alias("feat_sum"),
    )


SPATIAL_QUERIES: dict[str, Query] = {
    "sq_focal_mean_circle": sq_focal_mean_circle,
    "sq_focal_multi": sq_focal_multi,
    "sq_pip_polygons": sq_pip_polygons,
    "sq_patch_stats": sq_patch_stats,
    "sq_raster_to_vector": sq_raster_to_vector,
    "sq_multimodal_features": sq_multimodal_features,
}
