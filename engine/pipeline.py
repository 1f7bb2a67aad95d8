"""E1: the staged batch pipeline with lakehouse checkpointing (§3.2).

Stages (each committed as a snapshot, resumable per partition):

  ingest   documents (interleaved) partitioned by part_id
  points   + lat/lon/cell/tile columns (JVM encode), partitioned by part_id
  tiles    rasterized count tiles, partitioned by tile key
  stats    focal statistics tiles, partitioned by tile key

A re-run with the same inputs skips every WAL-verified partition
(idempotent resume, BASELINE.json:14); kill-and-rerun tests in
tests/test_lakehouse.py assert byte-identical results + skip counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine import tiling, udfs
from engine.lakehouse import LakeTable


class PipelineConfig:
    def __init__(
        self,
        root: str,
        level: int = 9,
        tile_size: int = 32,
        r: int = 7,
        shape: str = "circle",
        stats: list[str] | None = None,
        wrap: bool = True,
    ):
        self.root = root
        self.level = level
        self.tile_size = tile_size
        self.r = r
        self.shape = shape
        self.stats = stats or ["mean"]
        if wrap and (2**level) % tile_size:
            # a partial last tile column breaks the modular halo wrap
            # (tile_x would alias the wrong neighbor across the seam)
            raise ValueError(
                f"wrap=True requires tile_size | 2**level "
                f"(got level={level}, tile_size={tile_size})"
            )
        self.wrap_nx = (2**level) // tile_size if wrap else None

    def grid_params(self) -> dict:
        """Lineage for the geocode/rasterize stages — ONLY the params
        those stages consume, so changing the focal radius does not
        needlessly invalidate and recompute them."""
        return {"level": self.level, "tile_size": self.tile_size}

    def focal_params(self) -> dict:
        """Lineage for the stats stage: grid params + every focal
        knob INCLUDING wrap_nx — omitting it let a wrap=False rerun
        silently serve wrap=True results from the WAL."""
        return {
            **self.grid_params(),
            "r": self.r,
            "shape": self.shape,
            "stats": self.stats,
            "wrap_nx": self.wrap_nx,
        }


def run_pipeline(
    spark: SparkSession, docs: DataFrame, cfg: PipelineConfig,
    input_id: str | None = None,
) -> dict[str, dict]:
    """docs: interleaved documents (doc_id, spans, part_id). Returns
    {stage: snapshot} after committing every stage.

    ``input_id``: identity of the input docs for the ingest stage's
    WAL lineage. Callers with a known upstream identity (a snapshot
    content_hash, a source-table version) should pass it; otherwise a
    cheap order-insensitive fingerprint (count + bit_xor of doc_id
    hashes — overflow-free under ANSI, one map-side-combinable agg
    pass) is derived — with a CONSTANT tag here, rerunning at the same
    root with different documents would WAL-skip every partition and
    silently return the old data."""
    snaps: dict[str, dict] = {}

    if input_id is None:
        fp = docs.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(doc_id))").alias("h"),
        ).first()
        input_id = f"docs:{fp.n}:{fp.h}"

    ingest_tbl = LakeTable(cfg.root, "documents")
    snaps["ingest"] = ingest_tbl.write_stage(
        spark, docs, "part_id", "ingest",
        {"inputs": [input_id], "params": {}},
    )

    docs_r = ingest_tbl.read(spark)
    pts = udfs.with_cell_and_tile(
        udfs.geocode_cols(docs_r), cfg.level, cfg.tile_size
    )
    points_tbl = LakeTable(cfg.root, "points")
    snaps["points"] = points_tbl.write_stage(
        spark,
        pts,
        "part_id",
        "points",
        {"inputs": [f"documents#{snaps['ingest']['content_hash']}"], "params": cfg.grid_params()},
    )

    pts_r = points_tbl.read(spark)
    # partition tiles by a stable hash bucket, not per-tile dirs:
    # bounded directory count + balanced resume units at any tile count
    tiles = tiling.rasterize(pts_r, cfg.tile_size, cfg.level, stat="count").withColumn(
        "bucket", F.pmod(F.xxhash64("tile_x", "tile_y"), F.lit(32)).cast("int")
    )
    tiles_tbl = LakeTable(cfg.root, "tiles")
    snaps["tiles"] = tiles_tbl.write_stage(
        spark,
        tiles,
        "bucket",
        "tiles",
        {"inputs": [f"points#{snaps['points']['content_hash']}"], "params": cfg.grid_params()},
    )

    tiles_r = tiles_tbl.read(spark).drop("bucket")
    stats = tiling.apply_focal(
        tiles_r, cfg.r, cfg.shape, cfg.stats, cfg.tile_size,
        level=cfg.level, wrap_nx=cfg.wrap_nx,
    ).withColumn("bucket", F.pmod(F.xxhash64("tile_x", "tile_y", "band"), F.lit(32)).cast("int"))
    stats_tbl = LakeTable(cfg.root, "stats")
    snaps["stats"] = stats_tbl.write_stage(
        spark,
        stats,
        "bucket",
        "stats",
        {"inputs": [f"tiles#{snaps['tiles']['content_hash']}"], "params": cfg.focal_params()},
    )
    return snaps
