"""Streaming surface (T1–T5): streaming results must equal the batch
computation over the same parquet files — the operators are shared."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine import fixtures, streaming, udfs

LEVEL, T = 9, 32


@pytest.fixture(scope="module")
def stream_src(spark, tmp_path_factory):
    """Interleaved corpus + deterministic event times, written as
    several files (multiple micro-batches), with some doc_id dupes."""
    path = str(tmp_path_factory.mktemp("stream_src") / "docs")
    docs = fixtures.documents_geo(spark, 600, seed=9).withColumn(
        "ts",
        F.to_timestamp(F.lit("2026-01-01 00:00:00"))
        + F.make_interval(mins=(F.xxhash64("doc_id") % 180 + 180) % 180),
    )
    dupes = docs.limit(40)  # exact duplicate rows (same doc_id, same ts)
    docs.union(dupes).repartition(6).write.parquet(path)
    return path


def test_stream_cells_equals_batch(spark, stream_src):
    stream = streaming.stream_cells(
        streaming.read_documents_stream(spark, stream_src), LEVEL, T
    ).select("doc_id", "cell_id", "tile_x", "tile_y")
    streaming.run_to_memory(stream, "cells_stream")
    got = spark.table("cells_stream").toPandas()

    batch = udfs.with_cell_and_tile(
        udfs.geocode_cols(spark.read.parquet(stream_src)), LEVEL, T
    ).select("doc_id", "cell_id", "tile_x", "tile_y").toPandas()

    key = ["doc_id", "cell_id", "tile_x", "tile_y"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        batch.sort_values(key).reset_index(drop=True),
    )


def _batch_window_counts(spark, stream_src) -> pd.DataFrame:
    batch_cells = udfs.with_cell_and_tile(
        udfs.geocode_cols(spark.read.parquet(stream_src)), LEVEL, T
    )
    return (
        batch_cells.groupBy(
            F.window("ts", "10 minutes").alias("win"), "tile_x", "tile_y"
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(F.col("win.start").alias("win_start"), "tile_x", "tile_y", "n_docs")
        .toPandas()
    )


def test_windowed_tile_counts_equal_batch(spark, stream_src):
    """Complete mode, single micro-batch: streaming == batch exactly."""
    cells = streaming.stream_cells(
        streaming.read_documents_stream(spark, stream_src), LEVEL, T
    )
    streaming.run_to_memory(
        streaming.tile_window_counts(cells, "10 minutes"),
        "tile_counts_c",
        output_mode="complete",
    )
    got = spark.table("tile_counts_c").toPandas()
    batch = _batch_window_counts(spark, stream_src)
    key = ["win_start", "tile_x", "tile_y"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        batch.sort_values(key).reset_index(drop=True),
    )


def test_windowed_append_mode_late_drop(spark, stream_src):
    """Append mode across micro-batches (T3): the watermark advances
    between batches, so (a) a window is emitted at most once and never
    overcounts the batch result, and (b) rows arriving later than the
    watermark are dropped — emitted counts may undercount, but every
    emitted window exists in the batch result."""
    cells = streaming.stream_cells(
        streaming.read_documents_stream(spark, stream_src, max_files_per_trigger=2),
        LEVEL, T,
    )
    streaming.run_to_memory(
        streaming.tile_window_counts(cells, "10 minutes"), "tile_counts_a"
    )
    got = spark.table("tile_counts_a").toPandas()
    batch = _batch_window_counts(spark, stream_src)
    key = ["win_start", "tile_x", "tile_y"]
    merged = got.merge(batch, on=key, how="left", suffixes=("", "_batch"))
    assert len(got) > 0
    assert merged.n_docs_batch.notna().all()
    assert (merged.n_docs <= merged.n_docs_batch).all()
    assert not got.duplicated(subset=key).any()


def test_dedup_stream(spark, stream_src):
    docs = streaming.read_documents_stream(spark, stream_src)
    streaming.run_to_memory(
        streaming.dedup_stream(docs).select("doc_id"), "dedup_stream"
    )
    got = spark.table("dedup_stream").toPandas()
    n_unique = spark.read.parquet(stream_src).select("doc_id").distinct().count()
    assert len(got) == n_unique
    assert got.doc_id.nunique() == n_unique


def test_session_windows_run(spark, stream_src):
    cells = streaming.stream_cells(
        streaming.read_documents_stream(spark, stream_src), LEVEL, T
    )
    streaming.run_to_memory(
        streaming.session_windows(cells), "sessions", output_mode="complete"
    )
    got = spark.table("sessions").toPandas()
    assert len(got) > 0
    assert (got.sess_end > got.sess_start).all()
    # sessions partition the rows: counts sum to the input
    assert got.n_docs.sum() == spark.read.parquet(stream_src).count()


def test_incremental_tile_counts_stateful(spark, stream_src):
    """T6: applyInPandasWithState incremental rasterize — the final
    (max-version) state per tile equals the batch per-pixel counts."""
    stream = streaming.incremental_tile_counts(
        streaming.stream_cells(
            streaming.read_documents_stream(spark, stream_src, max_files_per_trigger=1),
            LEVEL, T,
        ),
        T,
    )
    streaming.run_to_memory(stream, "inc_counts", output_mode="update")
    got = spark.table("inc_counts").toPandas()
    # several triggers ran: versions must increase per tile
    assert got.ver.max() > 1
    last = got.sort_values("ver").groupby(["tile_x", "tile_y"]).tail(1)
    want = (
        udfs.with_cell_and_tile(
            udfs.geocode_cols(spark.read.parquet(stream_src)), LEVEL, T
        )
        .groupBy("tile_x", "tile_y", "ti", "tj")
        .count()
        .toPandas()
    )
    want_by_tile = {
        (tx, ty): g for (tx, ty), g in want.groupby(["tile_x", "tile_y"])
    }
    assert set(map(tuple, last[["tile_x", "tile_y"]].to_numpy())) == set(want_by_tile)
    for r in last.itertuples(index=False):
        g = want_by_tile[(r.tile_x, r.tile_y)]
        exp = dict(zip(g.tj.to_numpy() * T + g.ti.to_numpy(), g["count"].to_numpy()))
        got_map = dict(zip(r.idx, r.cnt))
        assert got_map == {int(k): int(v) for k, v in exp.items()}, (r.tile_x, r.tile_y)


def test_incremental_focal_equals_batch(spark, stream_src, tmp_path):
    """T7: the foreachBatch halo-aware incremental focal — after
    draining the stream file-by-file (multiple micro-batches, each
    touching only dirty neighborhoods), the persisted focal raster
    equals the one-shot batch rasterize→apply_focal over all files."""
    from engine import tiling

    r, shape = 3, "circle"
    wrap_nx = (2**LEVEL) // T
    cells = streaming.stream_cells(
        streaming.read_documents_stream(spark, stream_src, max_files_per_trigger=1),
        LEVEL, T,
    )
    start, state_path, out_path = streaming.incremental_focal(
        cells, T, LEVEL, r, shape, ["mean", "count"], str(tmp_path / "ivm"),
        wrap_nx=wrap_nx,
    )
    q = start()
    q.awaitTermination()

    batch_pts = udfs.with_cell_and_tile(
        udfs.geocode_cols(spark.read.parquet(stream_src)), LEVEL, T
    )
    batch_tiles = tiling.rasterize(batch_pts, T, LEVEL, stat="count")
    want_df = tiling.apply_focal(
        batch_tiles, r, shape, ["mean", "count"], T, level=LEVEL, wrap_nx=wrap_nx
    )
    want = {
        (r_.tile_x, r_.tile_y, r_.band): np.asarray(r_.data, dtype=np.float64)
        for r_ in want_df.collect()
    }
    got = {
        (r_.tile_x, r_.tile_y, r_.band): np.asarray(r_.data, dtype=np.float64)
        for r_ in spark.read.parquet(out_path).collect()
    }
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(
            np.nan_to_num(got[k], nan=-9), np.nan_to_num(want[k], nan=-9),
            rtol=1e-12, atol=1e-12, err_msg=str(k),
        )

    # exactly-once replay guard (r5): wipe the streaming checkpoint and
    # drain the SAME files into the SAME work_dir — every micro-batch
    # replays with an already-committed batch_id and must be skipped;
    # the additive count state must not double
    import shutil

    shutil.rmtree(str(tmp_path / "ivm" / "_checkpoint"))
    q2 = start()
    q2.awaitTermination()
    state = streaming.read_state(spark, state_path)
    got_state = {
        (r_.tile_x, r_.tile_y): np.asarray(r_.data, dtype=np.float64)
        for r_ in state.collect()
    }
    want_state = {
        (r_.tile_x, r_.tile_y): np.asarray(r_.data, dtype=np.float64)
        for r_ in batch_tiles.collect()
    }
    assert set(got_state) == set(want_state)
    for k in want_state:
        np.testing.assert_allclose(
            np.nan_to_num(got_state[k], nan=-9),
            np.nan_to_num(want_state[k], nan=-9), err_msg=str(k),
        )
    got2 = {
        (r_.tile_x, r_.tile_y, r_.band): np.asarray(r_.data, dtype=np.float64)
        for r_ in spark.read.parquet(out_path).collect()
    }
    assert set(got2) == set(want)
    for k in want:
        np.testing.assert_allclose(
            np.nan_to_num(got2[k], nan=-9), np.nan_to_num(want[k], nan=-9),
            rtol=1e-12, atol=1e-12, err_msg=str(k),
        )
