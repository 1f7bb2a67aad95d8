"""t5 system tests: snapshot/manifest semantics, idempotent resume,
kill-and-rerun recovery, row-count reconciliation, span invariant
through the full committed pipeline."""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine import fixtures
from engine.lakehouse import LakeTable
from engine.pipeline import PipelineConfig, run_pipeline


@pytest.fixture()
def docs(spark):
    return fixtures.documents_geo(spark, 600, seed=42, parts=8)


def file_state(root):
    out = {}
    for p in glob.glob(f"{root}/**/*.parquet", recursive=True):
        st = os.stat(p)
        out[p] = (st.st_size, st.st_mtime_ns)
    return out


def test_write_read_roundtrip_and_metrics(spark, docs, tmp_path):
    tbl = LakeTable(str(tmp_path), "documents")
    snap = tbl.write_stage(spark, docs, "part_id", "ingest", {"inputs": ["gen"]})
    assert snap["total_rows"] == 600
    assert snap["computed_partitions"] == 8
    assert snap["skipped_partitions"] == 0
    assert all(tbl.verify_snapshot().values())
    back = tbl.read(spark)
    assert back.count() == 600
    # span invariant through commit + manifest-driven scan
    orig = {r.doc_id: r.spans for r in docs.collect()}
    got = {r.doc_id: r.spans for r in back.collect()}
    assert got == orig
    # lineage recorded per partition
    for e in snap["partitions"]:
        assert e["lineage"]["inputs"] == ["gen"]
        assert e["row_count"] > 0 and e["checksum"] is not None


def test_rerun_skips_everything(spark, docs, tmp_path):
    tbl = LakeTable(str(tmp_path), "documents")
    tbl.write_stage(spark, docs, "part_id", "ingest")
    before = file_state(str(tmp_path))
    snap2 = tbl.write_stage(spark, docs, "part_id", "ingest")
    after = file_state(str(tmp_path))
    assert snap2["computed_partitions"] == 0
    assert snap2["skipped_partitions"] == 8
    assert before == after  # data files untouched byte-for-byte
    assert snap2["parent_id"] == 1 and snap2["snapshot_id"] == 2


def test_zero_row_partition_wal_and_full_skip(spark, docs, tmp_path):
    """expected_parts contract (r4, closing the r3 documented limit):
    a declared partition with zero stage rows gets a zero-row WAL
    entry, and a fully WAL-covered resume skips the Spark compute
    entirely (df is never touched — None proves it)."""
    tbl = LakeTable(str(tmp_path), "documents")
    dom = [str(i) for i in range(9)]  # part 8 produces no rows
    snap = tbl.write_stage(
        spark, docs, "part_id", "ingest", {"inputs": ["gen"]},
        expected_parts=dom,
    )
    assert snap["total_rows"] == 600
    parts = {e["part"]: e for e in snap["partitions"]}
    assert parts["8"]["row_count"] == 0 and parts["8"]["files"] == []
    assert all(tbl.verify_snapshot().values())
    before = file_state(str(tmp_path))
    # resume: full WAL coverage -> no compute at all
    snap2 = tbl.write_stage(
        spark, None, "part_id", "ingest", {"inputs": ["gen"]},
        expected_parts=dom,
    )
    after = file_state(str(tmp_path))
    assert before == after
    assert snap2["computed_partitions"] == 0
    assert snap2["skipped_partitions"] == 9
    assert snap2["content_hash"] == snap["content_hash"]
    assert tbl.read(spark).count() == 600
    # a written partition outside the declared domain fails loudly
    with pytest.raises(ValueError, match="outside expected_parts"):
        tbl.write_stage(
            spark, docs, "part_id", "ingest2", {"inputs": ["gen"]},
            expected_parts=["0", "1"],
        )


def test_crash_recovery_partial_wal(spark, docs, tmp_path):
    """Simulate a crash after 5 of 8 partitions: remove 3 WAL entries +
    their data → rerun recomputes exactly those, results identical."""
    tbl = LakeTable(str(tmp_path), "documents")
    snap1 = tbl.write_stage(spark, docs, "part_id", "ingest")
    ref = {r.doc_id: (r.part_id, r.spans) for r in tbl.read(spark).collect()}
    # wipe partitions 1, 3, 5 (WAL + data), and LATEST (pre-commit crash)
    for p in (1, 3, 5):
        os.remove(f"{tmp_path}/documents/_manifests/wal/ingest/{p}.json")
        shutil.rmtree(f"{tmp_path}/documents/data/ingest/_part={p}")
    os.remove(f"{tmp_path}/documents/_manifests/LATEST")
    os.remove(f"{tmp_path}/documents/_manifests/snapshot-1.json")
    snap2 = tbl.write_stage(spark, docs, "part_id", "ingest")
    assert snap2["computed_partitions"] == 3
    assert snap2["skipped_partitions"] == 5
    got = {r.doc_id: (r.part_id, r.spans) for r in tbl.read(spark).collect()}
    assert got == ref


def test_corrupted_partition_recomputed(spark, docs, tmp_path):
    """A data file whose footer count no longer matches the WAL entry is
    not trusted — partition recomputed."""
    tbl = LakeTable(str(tmp_path), "documents")
    tbl.write_stage(spark, docs, "part_id", "ingest")
    part_dir = f"{tmp_path}/documents/data/ingest/_part=2"
    f = glob.glob(f"{part_dir}/*.parquet")[0]
    with open(f, "wb") as fh:
        fh.write(b"corrupt")
    snap2 = tbl.write_stage(spark, docs, "part_id", "ingest")
    assert snap2["computed_partitions"] == 1
    assert all(tbl.verify_snapshot().values())
    assert tbl.read(spark).count() == 600


def test_snapshot_pinning(spark, docs, tmp_path):
    tbl = LakeTable(str(tmp_path), "documents")
    s1 = tbl.write_stage(spark, docs, "part_id", "ingest")
    docs2 = docs.withColumn("part_id", (F.col("part_id") + 1) % 8)
    s2 = tbl.write_stage(spark, docs2, "part_id", "ingest-v2")
    # AS OF s1 still reads the original stage files
    a = tbl.read(spark, s1["snapshot_id"]).count()
    b = tbl.read(spark, s2["snapshot_id"]).count()
    assert a == b == 600
    assert tbl.latest_snapshot_id() == s2["snapshot_id"]
    assert tbl.snapshot(s2["snapshot_id"])["parent_id"] == s1["snapshot_id"]


def test_write_stage_rejects_null_partition(spark, docs, tmp_path):
    """NULL partition values have no canonical-string WAL key: the old
    path KeyError'd mid-commit on the first run and the rerun's
    ~isin() resume filter silently DROPPED the null-key rows — must
    refuse up front, before anything is moved or committed."""
    tbl = LakeTable(str(tmp_path), "documents")
    bad = docs.withColumn(
        "part_id",
        F.when(F.col("part_id") == 0, F.lit(None)).otherwise(F.col("part_id")),
    )
    with pytest.raises(ValueError, match="NULL values in partition"):
        tbl.write_stage(spark, bad, "part_id", "ingest")
    assert tbl.latest_snapshot_id() is None  # nothing committed
    assert not os.path.isdir(os.path.join(str(tmp_path), "documents", "data", "ingest")) or not os.listdir(
        os.path.join(str(tmp_path), "documents", "data", "ingest")
    )


def test_write_stage_lineage_tuple_param_resumes(spark, docs, tmp_path):
    """Non-JSON-native lineage values (tuple params) must not silently
    disable resume: the WAL stores lineage as JSON, so the comparison
    must run on the canonicalized form."""
    tbl = LakeTable(str(tmp_path), "documents")
    lin = {"inputs": ["x"], "params": {"window": (3, 3)}}
    tbl.write_stage(spark, docs, "part_id", "ingest", lin)
    s2 = tbl.write_stage(
        spark, docs, "part_id", "ingest",
        {"inputs": ["x"], "params": {"window": (3, 3)}},
    )
    assert s2["computed_partitions"] == 0
    assert s2["skipped_partitions"] > 0


def test_snapshots_numeric_order(spark, docs, tmp_path):
    """snapshot-10 must come after snapshot-9, not after snapshot-1."""
    tbl = LakeTable(str(tmp_path), "documents")
    small = docs.limit(40)
    for k in range(11):
        tbl.write_stage(
            spark, small, "part_id", "ingest",
            {"inputs": [f"v{k}"], "params": {}},
        )
    ids = [s["snapshot_id"] for s in tbl.snapshots()]
    assert ids == sorted(ids) and len(ids) == 11


def test_full_pipeline_resume_idempotent(spark, docs, tmp_path):
    cfg = PipelineConfig(str(tmp_path), level=8, tile_size=16, r=3)
    snaps1 = run_pipeline(spark, docs, cfg)
    state1 = file_state(str(tmp_path))
    stats1 = LakeTable(str(tmp_path), "stats").read(spark).orderBy(
        "tile_x", "tile_y", "band"
    ).collect()
    snaps2 = run_pipeline(spark, docs, cfg)
    state2 = file_state(str(tmp_path))
    for stage in ("ingest", "points", "tiles", "stats"):
        assert snaps2[stage]["computed_partitions"] == 0, stage
        assert snaps2[stage]["skipped_partitions"] > 0, stage
    assert state1 == state2  # byte-identical outputs, nothing rewritten
    stats2 = LakeTable(str(tmp_path), "stats").read(spark).orderBy(
        "tile_x", "tile_y", "band"
    ).collect()
    assert [str(r) for r in stats1] == [str(r) for r in stats2]
    # metrics reconcile at every stage
    for stage in ("documents", "points", "tiles", "stats"):
        assert all(LakeTable(str(tmp_path), stage).verify_snapshot().values())


def test_pipeline_lineage_scoping(spark, docs, tmp_path):
    """Per-stage lineage: a focal-only change recomputes ONLY the stats
    stage; flipping wrap invalidates stats; different documents at the
    same root recompute ingest (a constant input tag used to WAL-skip
    everything and silently serve the old data)."""
    from pyspark.sql import functions as F

    cfg = PipelineConfig(str(tmp_path), level=8, tile_size=16, r=3)
    run_pipeline(spark, docs, cfg)
    # r=3 -> r=5: geocode + rasterize stay skipped, stats recomputes
    cfg2 = PipelineConfig(str(tmp_path), level=8, tile_size=16, r=5)
    snaps = run_pipeline(spark, docs, cfg2)
    assert snaps["points"]["computed_partitions"] == 0
    assert snaps["tiles"]["computed_partitions"] == 0
    assert snaps["stats"]["computed_partitions"] > 0
    # wrap flip reaches the stats lineage (it changes the seam values)
    cfg3 = PipelineConfig(str(tmp_path), level=8, tile_size=16, r=5, wrap=False)
    snaps = run_pipeline(spark, docs, cfg3)
    assert snaps["stats"]["computed_partitions"] > 0
    # different docs at the same root: ingest must recompute
    docs2 = docs.withColumn("doc_id", F.concat(F.lit("x"), "doc_id"))
    snaps = run_pipeline(spark, docs2, cfg3)
    assert snaps["ingest"]["computed_partitions"] > 0


def test_pipeline_stats_match_direct(spark, docs, tmp_path):
    """The committed pipeline result == the uncommitted direct dataflow."""
    from engine import tiling, udfs

    cfg = PipelineConfig(str(tmp_path), level=8, tile_size=16, r=3)
    run_pipeline(spark, docs, cfg)
    committed = LakeTable(str(tmp_path), "stats").read(spark).drop("bucket")
    pts = udfs.with_cell_and_tile(udfs.geocode_cols(docs), 8, 16)
    tiles = tiling.rasterize(pts, 16, 8, stat="count")
    direct = tiling.apply_focal(
        tiles, 3, "circle", ["mean"], 16, level=8, wrap_nx=(2**8) // 16
    )
    a = {(r.tile_x, r.tile_y): np.asarray(r.data, dtype=np.float64) for r in committed.collect()}
    b = {(r.tile_x, r.tile_y): np.asarray(r.data, dtype=np.float64) for r in direct.collect()}
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(
            np.nan_to_num(a[k], nan=-9), np.nan_to_num(b[k], nan=-9)
        )


def test_snapshot_id_cas_two_writers(spark, docs, tmp_path):
    """S4 hardening: a competing writer's snapshot file under the same
    id makes this writer's O_EXCL create fail — it retries cleanly with
    the next id (competitor becomes the parent) and never clobbers the
    existing snapshot; LATEST never moves backwards."""
    import json

    tbl = LakeTable(str(tmp_path), "documents")
    tbl.write_stage(spark, docs, "part_id", "ingest")
    # simulate writer B committing snapshots 2 and 3 between our read
    # of LATEST (still 1) and our commit: pre-create the id files —
    # our O_EXCL create must collide twice and land on 4
    for sid in (2, 3):
        with open(f"{tmp_path}/documents/_manifests/snapshot-{sid}.json", "w") as f:
            json.dump({"snapshot_id": sid, "partitions": [],
                       "stage_key": "other", "total_rows": 0}, f)
    docs2 = docs.withColumn("part_id", (F.col("part_id") + 1) % 8)
    snap = tbl.write_stage(spark, docs2, "part_id", "ingest-v2")
    assert snap["snapshot_id"] == 4
    assert snap["parent_id"] == 3  # the last competing commit
    # writer B's snapshots intact
    with open(f"{tmp_path}/documents/_manifests/snapshot-2.json") as f:
        assert json.load(f)["stage_key"] == "other"
    assert tbl.latest_snapshot_id() == snap["snapshot_id"]


def test_partition_value_canonicalization(spark, tmp_path):
    """String partition values that would not survive a directory
    round-trip ('01' re-inferred as int 1) keep their exact canonical
    form in WAL keys AND in the read-back data (the partition column
    is a data column now, never re-inferred); resume skips all."""
    pdf = spark.createDataFrame(
        [("01", 1.0), ("01", 2.0), ("1", 3.0), ("a b", 4.0)],
        "pkey string, v double",
    )
    tbl = LakeTable(str(tmp_path), "t")
    s1 = tbl.write_stage(spark, pdf, "pkey", "ingest")
    assert s1["computed_partitions"] == 3
    got = {(r.pkey, r.v) for r in tbl.read(spark).collect()}
    assert got == {("01", 1.0), ("01", 2.0), ("1", 3.0), ("a b", 4.0)}
    assert {e["part"] for e in s1["partitions"]} == {"01", "1", "a b"}
    # identical rerun: every partition skips (WAL keys matched)
    s2 = tbl.write_stage(spark, pdf, "pkey", "ingest")
    assert s2["computed_partitions"] == 0
    assert s2["skipped_partitions"] == 3
    assert s2["content_hash"] == s1["content_hash"]


def test_compaction_binpacks_and_preserves_content(spark, docs, tmp_path):
    """S9: multi-file partitions rewrite to 1 file each, untouched
    partitions carry over by reference, content/checksums (and thus
    the snapshot content_hash) are preserved, the compacted snapshot
    reads identically, and re-compaction is a no-op."""
    tbl = LakeTable(str(tmp_path), "documents")
    # force many small files per partition
    snap1 = tbl.write_stage(
        spark, docs.repartition(6), "part_id", "ingest", {"inputs": ["gen"]}
    )
    multi = [e for e in snap1["partitions"] if len(e["files"]) > 1]
    assert multi, "fixture failed to produce multi-file partitions"
    orig = {r.doc_id: r.spans for r in tbl.read(spark).collect()}

    snap2 = tbl.compact(spark, max_files_per_partition=1)
    assert snap2["snapshot_id"] == snap1["snapshot_id"] + 1
    assert snap2["content_hash"] == snap1["content_hash"]
    by_part = {e["part"]: e for e in snap2["partitions"]}
    for e in snap1["partitions"]:
        ne = by_part[e["part"]]
        if len(e["files"]) > 1:
            assert len(ne["files"]) == 1
            assert ne["path"] != e["path"]
        else:
            assert ne is e or ne == e  # carried by reference
        assert ne["checksum"] == e["checksum"]
        assert ne["row_count"] == e["row_count"]
    assert all(tbl.verify_snapshot().values())
    got = {r.doc_id: r.spans for r in tbl.read(spark).collect()}
    assert got == orig
    # pinned old snapshot still readable (time travel across compaction)
    assert tbl.read(spark, snap1["snapshot_id"]).count() == len(orig)
    # already-compacted -> returns the SAME snapshot, no empty commit
    snap3 = tbl.compact(spark, max_files_per_partition=1)
    assert snap3["snapshot_id"] == snap2["snapshot_id"]


def test_compaction_crash_resume(spark, docs, tmp_path):
    """A compaction killed mid-way resumes from its WAL without
    rewriting finished partitions."""
    tbl = LakeTable(str(tmp_path), "documents")
    tbl.write_stage(spark, docs.repartition(6), "part_id", "ingest")
    snap1 = tbl.snapshot()
    # simulate a crash: run compact, then delete the snapshot it made
    # but KEEP its WAL + data (the state after dying pre-commit)
    snap2 = tbl.compact(spark)
    os.remove(
        os.path.join(tbl.manifest_dir, f"snapshot-{snap2['snapshot_id']}.json")
    )
    ptr = os.path.join(tbl.manifest_dir, "LATEST")
    with open(ptr, "w") as f:
        f.write(str(snap1["snapshot_id"]))
    before = file_state(str(tmp_path))
    snap3 = tbl.compact(spark)
    after = file_state(str(tmp_path))
    assert before == after  # every rewrite resumed from WAL, zero recompute
    assert snap3["content_hash"] == snap1["content_hash"]
    assert snap3["computed_partitions"] == 0
    assert all(tbl.verify_snapshot().values())


def test_compaction_refuses_stale_base(spark, docs, tmp_path):
    """Compacting a snapshot that is no longer the head must raise —
    committing it would regress readers to pre-write content."""
    tbl = LakeTable(str(tmp_path), "documents")
    snap1 = tbl.write_stage(spark, docs.repartition(6), "part_id", "ingest")
    # head advances (different lineage -> recompute, new snapshot)
    tbl.write_stage(
        spark, docs.repartition(6), "part_id", "ingest2", {"inputs": ["x"]}
    )
    with pytest.raises(RuntimeError, match="head moved"):
        tbl.compact(spark, snapshot_id=snap1["snapshot_id"])


def test_compaction_canonicalizes_numeric_string_partitions(spark, tmp_path):
    """r4 ADVICE regression: compacting a table whose STRING partition
    values look numeric ('01', '1.10') must not let directory type
    re-inference re-render the dirs ('_part=1') — the rewrite rebuilds
    the canonical `_part` from the data column, so WAL keys, stats
    lookups and the content hash all round-trip exactly."""
    pdf = spark.createDataFrame(
        [("01", float(i)) for i in range(8)]
        + [("1.10", float(i)) for i in range(8)]
        + [("plain", 99.0)],
        "pkey string, v double",
    )
    tbl = LakeTable(str(tmp_path), "t")
    snap1 = tbl.write_stage(spark, pdf.repartition(4), "pkey", "ingest")
    multi = [e for e in snap1["partitions"] if len(e["files"]) > 1]
    assert multi, "fixture failed to produce multi-file partitions"
    snap2 = tbl.compact(spark, max_files_per_partition=1)
    assert snap2["content_hash"] == snap1["content_hash"]
    assert {e["part"] for e in snap2["partitions"]} == {"01", "1.10", "plain"}
    for e in snap2["partitions"]:
        assert len(e["files"]) == 1
    got = {(r.pkey, r.v) for r in tbl.read(spark).collect()}
    assert got == {(r.pkey, r.v) for r in pdf.collect()}


def test_compaction_commit_refuses_concurrent_winner(spark, docs, tmp_path):
    """r4 ADVICE: the head-currency rule must hold THROUGH the commit
    CAS, not just before it — a snapshot that lands between compact()'s
    pre-check and its commit makes the commit raise (never adopt the
    winner as parent and regress LATEST to pre-write content)."""
    tbl = LakeTable(str(tmp_path), "documents")
    snap1 = tbl.write_stage(spark, docs.repartition(6), "part_id", "ingest")
    # simulate the interloper: a snapshot file for the NEXT id appears
    # before compact()'s _commit_snapshot CAS runs — monkeypatch the
    # pre-commit latest_snapshot_id to return the stale head once so
    # the race window is exercised deterministically
    import engine.lakehouse as lh

    orig = lh.LakeTable._commit_snapshot

    def racing_commit(self, *a, **kw):
        # interloper commits first (same table, new data)
        extra = spark.createDataFrame(
            [(int(snap1["partitions"][0]["part"]), 123456789)],
            "part_id int, doc_id long",
        )
        # direct snapshot-file injection: the cheapest concurrent win
        sid = self.latest_snapshot_id() + 1
        import json as _json
        import os as _os
        with open(
            _os.path.join(self.manifest_dir, f"snapshot-{sid}.json"), "w"
        ) as f:
            _json.dump({"snapshot_id": sid, "parent_id": sid - 1,
                        "partitions": [], "partition_col": "part_id",
                        "stage_key": "interloper", "content_hash": "x",
                        "total_rows": 0}, f)
        _ = extra  # (data content irrelevant — the id collision is the race)
        return orig(self, *a, **kw)

    lh.LakeTable._commit_snapshot = racing_commit
    try:
        with pytest.raises(RuntimeError, match="re-run compact"):
            tbl.compact(spark, max_files_per_partition=1)
    finally:
        lh.LakeTable._commit_snapshot = orig
