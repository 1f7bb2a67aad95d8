"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship pipeline on /root/testdata/sf0.001
queries()      — one entry per implemented operator (SURVEY.md §2)
oracle_sql()   — matching DuckDB SQL for EVERY queries() entry (the
                 registries stay in 1:1 lockstep — zero rows-only
                 entries; len(queries()) is the count): 2-D spatial
                 ops are
                 value-hash-checked via contribution joins, recursive
                 CTEs (CCL, flow paths, Jacobi fill/cost relaxations,
                 unrolled Sutherland–Hodgman stages) and quantized
                 order-free tile sums; NumPy goldens in tests/ cover
                 what SQL can't express bit-for-bit (e.g. Mercator).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:  # make `engine` importable wherever we're loaded from
    sys.path.insert(0, _REPO_DIR)


def _ship(spark: SparkSession) -> None:
    """Workers need the engine package for applyInPandas functions —
    the --py-files equivalent for a session we didn't launch."""
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents → geocode → cell/tile encode → rasterize →
    circular r=7 focal mean of document density (tiles out)."""
    from engine import shim, tiling, udfs

    _ship(spark)

    level, T = 9, 32
    docs = shim.documents_interleaved(spark, "/root/testdata/sf0.001")
    pts = udfs.with_cell_and_tile(
        udfs.geocode_cols(docs), level, T
    )
    tiles = tiling.rasterize(pts, T, level, stat="count")
    out = tiling.apply_focal(
        tiles, 7, "circle", ["mean"], T, level=level, wrap_nx=(2**level) // T
    )
    # stable flat schema for the driver's smoke check (no array payload)
    from pyspark.sql import functions as F

    valid = F.filter("data", lambda x: x.isNotNull() & ~F.isnan(x))
    return out.select(
        "tile_x",
        "tile_y",
        "level",
        "band",
        F.aggregate(valid, F.lit(0.0), lambda a, x: a + x).alias("tile_sum"),
        F.size(valid).alias("n_valid"),
    )


def _registry() -> dict[str, tuple]:
    """Composed registry: every single-query implementation stays in
    its module registry (SQL_QUERIES / TEXT_QUERIES / SPATIAL_QUERIES,
    all individually pytest-covered), but family-aligned entries are
    presented to the DRIVER as union suites (engine/suites.py) so the
    full surface fits the driver's 50-entry correctness window — the
    round-3 consolidation rule, made structural in round 5
    (tests/test_contract.py pins len(queries()) <= 50)."""
    from engine.queries import SQL_QUERIES
    from engine.spatial_queries import SPATIAL_QUERIES
    from engine.suites import MERGED_AWAY, build_suites
    from engine.text_queries import TEXT_QUERIES

    out: dict[str, tuple] = {}
    for reg in (SQL_QUERIES, TEXT_QUERIES, SPATIAL_QUERIES):
        out.update(
            {name: v for name, v in reg.items() if name not in MERGED_AWAY}
        )
    out.update(build_suites())
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _registry().items() if sql is not None
    }
