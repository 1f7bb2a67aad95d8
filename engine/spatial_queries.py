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


SPATIAL_QUERIES: dict[str, Query] = {
    "sq_focal_mean_circle": sq_focal_mean_circle,
    "sq_focal_multi": sq_focal_multi,
}
