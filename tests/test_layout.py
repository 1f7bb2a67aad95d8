"""S10 Z-order layout goldens: a cell-range-clustered table prunes
files by footer stats; the hash layout provably does not — the
contrast isolates the LAYOUT as the thing doing the work."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine import grid, layout, shim, udfs


def _docs_with_cells(spark, level=9):
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    pts = docs.select(
        "doc_id",
        shim.shim_lat_col(F.col("doc_id")).alias("lat"),
        shim.shim_lon_col(F.col("doc_id")).alias("lon"),
    )
    return udfs.with_cell_and_tile(pts, level, 32).select(
        "doc_id", "lat", "lon", "cell_id"
    )


def test_clustered_layout_prunes_files(spark, tmp_path):
    from engine.deploy import ensure_shipped

    ensure_shipped(spark)
    level, n_files = 9, 16
    pts = _docs_with_cells(spark, level)
    zpath = str(tmp_path / "zorder")
    hpath = str(tmp_path / "hash")
    layout.write_clustered(pts, "cell_id", zpath, n_files)
    pts.repartition(n_files, "doc_id").write.parquet(hpath)

    bbox = (10.0, 40.0, -30.0, 20.0)
    ranges = grid.bbox_to_cell_ranges(*bbox, level)
    assert ranges

    zspans = layout.file_cell_spans(zpath, "cell_id")
    hspans = layout.file_cell_spans(hpath, "cell_id")
    assert len(zspans) == n_files and len(hspans) == n_files
    zread = layout.pruned_files(zspans, ranges)
    hread = layout.pruned_files(hspans, ranges)
    # the clustered layout skips a real share of files; the hash layout
    # has every file spanning ~the whole key space, so nothing prunes
    assert len(zread) <= n_files // 2, (len(zread), n_files)
    assert len(hread) >= n_files - 1, (len(hread), n_files)

    # correctness: pruned-file scan + exact bbox refine == full scan
    lat_lo, lat_hi, lon_lo, lon_hi = bbox
    pred = (
        (F.col("lat") >= lat_lo) & (F.col("lat") <= lat_hi)
        & (F.col("lon") >= lon_lo) & (F.col("lon") <= lon_hi)
    )
    want = sorted(
        r.doc_id for r in pts.filter(pred).select("doc_id").collect()
    )
    got = sorted(
        r.doc_id
        for r in spark.read.parquet(*zread).filter(pred)
        .select("doc_id").collect()
    )
    assert got == want and len(want) > 0


def test_clustered_files_balanced(spark, tmp_path):
    """repartitionByRange keeps file sizes balanced even though the
    fixture's spatial distribution is non-uniform."""
    import pyarrow.parquet as pq
    import glob as g

    pts = _docs_with_cells(spark)
    zpath = str(tmp_path / "zorder")
    layout.write_clustered(pts, "cell_id", zpath, 8)
    counts = [
        pq.ParquetFile(f).metadata.num_rows
        for f in g.glob(zpath + "/*.parquet")
    ]
    assert len(counts) == 8
    assert max(counts) <= 3 * min(counts), counts
