"""Structured Streaming surface (SURVEY.md §2.8, T1–T5).

The reference is strictly batch and the north rule demands *resumable
batch* (lakehouse manifests, engine/lakehouse.py) — this module is the
thin streaming demonstration layer: the SAME stateless encode operators
(geocode, cell/tile encode are pure column expressions) applied to a
micro-batch stream, plus event-time windowing, watermark late-data
handling, and stateful dedup.

Every builder returns an unstarted streaming DataFrame; tests drive it
with ``trigger(availableNow=True)`` into a memory sink and assert the
result equals the batch computation on the same files — the streaming
plan and the batch plan share all operator code by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine import fixtures, udfs


def read_documents_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """T1: micro-batch ingest of interleaved document parquet files.
    Schema must be declared for streaming reads (no inference)."""
    r = spark.readStream.schema(fixtures.DOCUMENTS_SCHEMA_DDL + ", ts timestamp")
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(src_dir)


def stream_cells(docs: DataFrame, level: int, tile_size: int) -> DataFrame:
    """T1 (transform): the batch C1+C2+C6 encode applied verbatim to a
    stream — stateless column expressions are streaming-safe as-is."""
    return udfs.with_cell_and_tile(udfs.geocode_cols(docs), level, tile_size)


def tile_window_counts(
    cells: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """T2+T3: watermarked tumbling/sliding event-time counts per tile.
    Late rows beyond the watermark are dropped by the engine; the
    watermark also bounds the aggregation state (mandatory for append
    mode at 10^12-doc scale)."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        cells.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.col("win.start").alias("win_start"),
            "tile_x", "tile_y", "n_docs",
        )
    )


def session_windows(cells: DataFrame, gap: str = "15 minutes") -> DataFrame:
    """T4: per-partition session windows (gap-based)."""
    return (
        cells.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("sess"), "part_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "part_id", "n_docs",
        )
    )


def dedup_stream(docs: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """T5: stateful doc_id dedup with bounded state — duplicates within
    the watermark horizon are dropped exactly; state for older keys is
    reclaimed (the streaming sibling of q13's batch exact-dedup)."""
    return docs.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["doc_id"])


def incremental_tile_counts(cells: DataFrame, tile_size: int) -> DataFrame:
    """T6 (custom stateful operator, §2.9 applyInPandasWithState):
    incremental rasterize — per-tile running pixel-count state updated
    every micro-batch, emitting the tile's full sparse histogram with a
    monotonically increasing version per update.

    State per tile = (pixel idx array, count array, version): the
    sparse CSR-style form of the A2 count raster, merged with each
    batch's arrivals by a vectorized unique+bincount (no per-row
    Python). After the last batch the max-version row per tile equals
    the batch ``rasterize(count)`` result — asserted by the
    streaming-equals-batch test. At scale this is the standard
    upsert-view of a continuously ingested raster: state is bounded by
    occupied pixels per tile (<= T^2), and each trigger shuffles only
    the arriving rows."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    T = tile_size

    def update(key, pdfs, state):
        if state.exists:
            idx0, cnt0, ver = state.get
            idx0 = np.asarray(idx0, dtype=np.int64)
            cnt0 = np.asarray(cnt0, dtype=np.int64)
        else:
            idx0 = np.empty(0, dtype=np.int64)
            cnt0 = np.empty(0, dtype=np.int64)
            ver = 0
        news = [
            pdf["tj"].to_numpy(dtype=np.int64) * T + pdf["ti"].to_numpy(dtype=np.int64)
            for pdf in pdfs
        ]
        new_idx = np.concatenate(news) if news else np.empty(0, dtype=np.int64)
        allidx = np.concatenate([idx0, new_idx])
        w = np.concatenate([cnt0.astype(np.float64), np.ones(len(new_idx))])
        uniq, inv = np.unique(allidx, return_inverse=True)
        cnt = np.bincount(inv, weights=w).astype(np.int64)
        state.update((uniq.tolist(), cnt.tolist(), ver + 1))
        yield pd.DataFrame(
            [
                {
                    "tile_x": int(key[0]), "tile_y": int(key[1]),
                    "ver": ver + 1,
                    "idx": uniq.tolist(), "cnt": cnt.tolist(),
                    "n_px": len(uniq), "total": int(cnt.sum()),
                }
            ]
        )

    return cells.groupBy("tile_x", "tile_y").applyInPandasWithState(
        update,
        "tile_x int, tile_y int, ver long, idx array<long>, cnt array<long>, "
        "n_px long, total long",
        "idx array<long>, cnt array<long>, ver long",
        "update",
        GroupStateTimeout.NoTimeout,
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append") -> None:
    """Drain all available input into an in-memory table (test/dev
    harness; production sinks are the lakehouse parquet tables)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
