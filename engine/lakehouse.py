"""Iceberg-style lakehouse semantics over plain parquet (S2–S4,
SURVEY.md §2.1/§3.3). No Iceberg jars exist in this environment — the
north rule needs the *semantics*: snapshot isolation, atomic commit,
per-partition lineage + row-count metrics, idempotent resume.

Layout per table:

    <root>/<name>/data/<stage_key>/<part_col>=<v>/*.parquet
    <root>/<name>/_manifests/wal/<stage_key>/<part>.json   (per-partition WAL)
    <root>/<name>/_manifests/snapshot-<id>.json            (immutable)
    <root>/<name>/_manifests/LATEST                        (atomic pointer)

Commit protocol (crash-safe at every step):
1. pending partitions = stage partitions minus verified WAL entries
   (a WAL entry is trusted only if its files' parquet-footer row count
   still matches — the cheap verification of SURVEY.md §3.3);
2. ONE Spark job writes all pending partitions under a fresh tmp dir
   (``partitionBy`` layout); a crash here leaves only garbage in tmp;
3. each partition dir is atomically renamed into ``data/`` and its WAL
   entry (row count, checksum, lineage, files) written via
   tmp-then-``os.replace`` — crash between partitions resumes cleanly;
4. when every partition has a WAL entry, the snapshot JSON (listing all
   partitions) is written atomically and LATEST is flipped — readers
   never observe a partial stage.

Checksums are order-insensitive exact sums of per-row xxhash64 values
(DECIMAL(38) aggregation — no overflow at any row count).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _wal_name(part: str) -> str:
    """Canonical filesystem-safe WAL filename for a partition value —
    the SAME scheme for data-bearing and zero-row entries (two
    spellings of one part would make wal_entries() keep an arbitrary
    one)."""
    from urllib.parse import quote

    return quote(str(part), safe="")


def _fsync_dir(path: str) -> None:
    """Make a directory-entry update (create/rename) durable: fsync of
    the FILE alone does not order the dir entry on every filesystem, so
    a power loss could durably persist a pointer to a file whose dir
    entry was lost."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True, default=str)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    _fsync_dir(os.path.dirname(os.path.abspath(path)))


def parquet_row_count(files: list[str]) -> int:
    """Footer-only row count (no data read)."""
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def _row_checksum_agg(cols: list[str]):
    """THE table checksum (one definition — write_stage and compact
    must agree or compact's safety proof compares different
    functions): order-insensitive exact sum of per-row xxhash64 over
    the given column order."""
    return F.sum(
        F.xxhash64(F.to_json(F.struct(*cols))).cast("decimal(38,0)")
    )


class LakeTable:
    def __init__(self, root: str, name: str):
        self.dir = os.path.join(root, name)
        self.data_dir = os.path.join(self.dir, "data")
        self.manifest_dir = os.path.join(self.dir, "_manifests")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(os.path.join(self.manifest_dir, "wal"), exist_ok=True)

    # -- snapshots ---------------------------------------------------------

    def latest_snapshot_id(self) -> int | None:
        p = os.path.join(self.manifest_dir, "LATEST")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def snapshot(self, snapshot_id: int | None = None) -> dict | None:
        sid = snapshot_id if snapshot_id is not None else self.latest_snapshot_id()
        if sid is None:
            return None
        p = os.path.join(self.manifest_dir, f"snapshot-{sid}.json")
        with open(p) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        """All snapshots in ID order (numeric — a lexicographic listing
        would put snapshot-10 before snapshot-2)."""
        names = [
            f for f in os.listdir(self.manifest_dir)
            if f.startswith("snapshot-") and f.endswith(".json")
        ]
        names.sort(key=lambda f: int(f[len("snapshot-"):-len(".json")]))
        out = []
        for f in names:
            with open(os.path.join(self.manifest_dir, f)) as fh:
                out.append(json.load(fh))
        return out

    # -- read (S2/S3) --------------------------------------------------------

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        """Manifest-driven scan: only files listed in the (pinned)
        snapshot are read. The partition column is a real DATA column
        inside the files (exact values and declared type — never
        re-inferred from directory names); the canonical `_part`
        directory column is dropped."""
        snap = self.snapshot(snapshot_id)
        if snap is None:
            raise FileNotFoundError(f"no snapshot for table {self.dir}")
        # zero-row partitions (expected_parts contract) carry no data dir
        dirs = [p["path"] for p in snap["partitions"] if p["path"]]
        if not dirs:
            raise FileNotFoundError(
                f"snapshot {snap['snapshot_id']} of {self.dir} has no data "
                "files (every partition is zero-row)"
            )
        # A compacted snapshot mixes rewritten partitions under its own
        # stage dir with carried-by-reference partitions under the
        # source stage dir. Spark's partition discovery asserts ONE
        # discovered base across all inputs (the dirs above the topmost
        # key=value segment), so a single read spanning two stage dirs
        # throws CONFLICTING_DIRECTORY_STRUCTURES no matter what
        # basePath says (r5 fix — found by the numeric-string
        # compaction regression test). Read per stage group and union:
        # the partition column is a DATA column, so the union loses
        # nothing and `_part` is dropped per group.
        df = self._read_stage_grouped(spark, dirs)
        return df

    def _read_stage_grouped(self, spark: SparkSession, paths: list[str]):
        """Read parquet paths (dirs or files) that may span multiple
        stage directories: ONE read per stage group (consistent
        discovered base within a group), basePath = the data root so
        `_part` is the only inferred directory column, dropped before
        the union. Group count = number of distinct stages in the
        snapshot's lineage — O(commits), never O(partitions)."""
        root = os.path.normpath(self.data_dir)
        groups: dict[str, list[str]] = {}
        for p in paths:
            rel = os.path.relpath(os.path.normpath(p), root)
            stage = rel.split(os.sep, 1)[0]
            groups.setdefault(stage, []).append(p)
        out = None
        for stage in sorted(groups):
            df = spark.read.option("basePath", self.data_dir).parquet(
                *groups[stage]
            )
            if "_part" in df.columns:
                df = df.drop("_part")
            out = df if out is None else out.unionByName(df)
        return out

    # -- WAL ----------------------------------------------------------------

    def _wal_dir(self, stage_key: str) -> str:
        d = os.path.join(self.manifest_dir, "wal", stage_key)
        os.makedirs(d, exist_ok=True)
        return d

    def _write_wal_entry(
        self,
        stage_key: str,
        part: str,
        path: str | None,
        row_count: int,
        checksum: str,
        lin: dict,
    ) -> dict:
        """Build + atomically persist one partition WAL entry (the ONE
        canonical filename scheme — see write_stage)."""
        files = (
            sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
            if path
            else []
        )
        entry = {
            "part": part,
            "path": path,
            "files": files,
            "row_count": row_count,
            "checksum": str(checksum),
            "lineage": lin,
            "committed_at": time.time(),
        }
        _atomic_write_json(
            os.path.join(self._wal_dir(stage_key), f"{_wal_name(part)}.json"),
            entry,
        )
        return entry

    def wal_entries(self, stage_key: str, verify: bool = True) -> dict[str, dict]:
        """Committed-partition WAL, dropping entries whose data files no
        longer verify (footer row count mismatch / missing)."""
        out: dict[str, dict] = {}
        d = self._wal_dir(stage_key)
        for f in os.listdir(d):
            if not f.endswith(".json"):
                continue
            with open(os.path.join(d, f)) as fh:
                e = json.load(fh)
            if verify:
                try:
                    if parquet_row_count(e["files"]) != e["row_count"]:
                        continue
                except (OSError, ValueError):
                    continue
            out[str(e["part"])] = e
        return out

    # -- commit (S4) ----------------------------------------------------------

    def write_stage(
        self,
        spark: SparkSession,
        df: DataFrame,
        partition_col: str,
        stage_key: str,
        lineage: dict | None = None,
        code_version: str = "v1",
        expected_parts: list | None = None,
    ) -> dict:
        """Commit `df` as a new snapshot, resuming from any previously
        WAL-committed partitions of the same stage_key. Returns the
        snapshot dict. `df` MUST be deterministic per partition (the
        resume contract).

        Single-compute protocol (round-2 fix — the old flow ran a full
        stats aggregation over `df` and then re-executed the identical
        lineage for the write, 2× cost per stage): the lineage runs
        EXACTLY ONCE, writing the pending partitions to tmp; per-
        partition row counts + checksums are then derived by scanning
        the WRITTEN parquet (an I/O-bound fraction of recomputing the
        stage). A WAL entry is trusted iff its files still verify by
        footer count AND its recorded lineage (inputs/params/
        code_version) matches this call — the lineage guard replaces
        the old fresh-recount cross-check.

        Zero-row partitions (r4, closing the r3 documented limit): a
        partition whose stage output is ZERO rows writes no directory,
        so layout discovery alone cannot distinguish "computed, empty"
        from "never a partition". Callers that know their partition
        DOMAIN pass ``expected_parts`` (canonical string values): every
        expected partition absent from the written layout gets a
        zero-row WAL entry (files=[], checksum '0' — footer-verify of
        no files is trivially 0 == 0), and a resume whose expected set
        is fully WAL-covered SKIPS the Spark compute entirely. Without
        ``expected_parts`` the old contract stands: empty partitions
        re-execute their (idempotent, zero-output) lineage per resume.
        A written partition OUTSIDE ``expected_parts`` is a caller
        contract violation and raises."""
        lin = {
            "inputs": (lineage or {}).get("inputs", []),
            "params": (lineage or {}).get("params", {}),
            "code_version": code_version,
        }
        # canonicalize through JSON NOW: the WAL stores lineage as JSON,
        # so a non-native value (tuple param, int dict key) would never
        # equal its round-tripped form and silently disable resume on
        # every rerun — full recompute with skipped always 0
        lin = json.loads(json.dumps(lin, sort_keys=True, default=str))
        expected = (
            None if expected_parts is None
            else sorted(str(p) for p in expected_parts)
        )
        expected_set = None if expected is None else set(expected)
        done = {
            p: e
            for p, e in self.wal_entries(stage_key).items()
            if e.get("lineage") == lin
            # a declared domain bounds the snapshot on EVERY path: WAL
            # entries outside it (earlier, broader runs) are ignored,
            # so a fully-covered resume can't smuggle them in
            and (expected_set is None or p in expected_set)
        }
        skipped = len(done)
        stage_data = os.path.join(self.data_dir, stage_key)
        os.makedirs(stage_data, exist_ok=True)
        if expected_set is not None and expected_set <= set(done):
            # fully WAL-covered resume: no compute at all
            return self._commit_snapshot(
                stage_key, partition_col, done, skipped, pending_n=0
            )
        tmp = os.path.join(self.dir, f"_tmp-{uuid.uuid4().hex[:8]}")
        w = df
        if done:
            w = df.filter(
                ~F.col(partition_col).cast("string").isin(sorted(done))
            )
        # canonicalize the partition value ONCE, df-side (cast-to-string
        # of the declared column), and partition the write by that
        # canonical `_part` column. The original partition_col stays a
        # DATA column inside the files, so the read-back checksum uses
        # the exact df values — no directory type re-inference ('01'
        # would round-trip to int 1) can ever skew WAL keys/checksums
        # (r3 ADVICE fix).
        w = w.withColumn("_part", F.col(partition_col).cast("string"))
        w.write.mode("overwrite").partitionBy("_part").parquet(tmp)
        # the written layout IS the pending-partition discovery; dir
        # values are path-escaped (percent-encoding) — unescape back to
        # the canonical string
        from urllib.parse import unquote

        pending_dirs = sorted(
            d for d in os.listdir(tmp)
            if d.startswith("_part=") and os.path.isdir(os.path.join(tmp, d))
        )
        pending = [unquote(d.split("=", 1)[1]) for d in pending_dirs]
        # validate BEFORE any move: NULL partition values have no
        # canonical string key (first run would KeyError mid-commit and
        # the rerun's ~isin() resume filter silently DROPS null-key
        # rows), and out-of-domain partitions must not leave committed-
        # looking data dirs + WAL entries behind
        if "__HIVE_DEFAULT_PARTITION__" in pending:
            shutil.rmtree(tmp, ignore_errors=True)
            raise ValueError(
                f"stage {stage_key!r}: NULL values in partition column "
                f"{partition_col!r} — the canonical-string WAL protocol "
                "has no NULL key; filter or fill them first"
            )
        if expected is not None:
            extra = sorted(set(pending) - set(expected))
            if extra:
                shutil.rmtree(tmp, ignore_errors=True)
                raise ValueError(
                    f"stage {stage_key!r} wrote partitions outside "
                    f"expected_parts: {extra[:5]}"
                )
        if pending:
            back = spark.read.option("basePath", tmp).parquet(
                *[os.path.join(tmp, d) for d in pending_dirs]
            ).select(*df.columns)
            stats_rows = (
                back.groupBy(F.col(partition_col).cast("string").alias("_part"))
                .agg(
                    F.count(F.lit(1)).alias("row_count"),
                    _row_checksum_agg(df.columns).alias("checksum"),
                )
                .collect()
            )
            stats = {
                r["_part"]: {"row_count": r["row_count"], "checksum": str(r["checksum"])}
                for r in stats_rows
            }
            for dname, part in zip(pending_dirs, pending):
                src = os.path.join(tmp, dname)
                dst = os.path.join(stage_data, dname)
                if os.path.isdir(dst):
                    shutil.rmtree(dst)
                os.replace(src, dst)
                # ONE canonical WAL filename scheme (urllib quote) for
                # data AND zero-row entries — Spark's path escaping
                # differs (e.g. leaves spaces), and two spellings of
                # the same part would race nondeterministically in
                # wal_entries(); matching keys use entry["part"]
                done[part] = self._write_wal_entry(
                    stage_key, part, dst,
                    stats[part]["row_count"], stats[part]["checksum"], lin,
                )
        shutil.rmtree(tmp, ignore_errors=True)
        if expected is not None:
            for part in expected:
                if part not in done:
                    done[part] = self._write_wal_entry(
                        stage_key, part, None, 0, "0", lin
                    )
        return self._commit_snapshot(
            stage_key, partition_col, done, skipped, pending_n=len(pending)
        )

    def _commit_snapshot(
        self,
        stage_key: str,
        partition_col: str,
        done: dict[str, dict],
        skipped: int,
        pending_n: int,
        expected_parent: int | None = None,
    ) -> dict:
        """``expected_parent``: commit-time validator for semantic
        no-op commits (compaction). A compaction's content must replace
        exactly the snapshot it rewrote — if a concurrent writer lands
        first, adopting the winner as parent would regress LATEST to
        pre-write content, so the CAS loop raises instead of bumping
        sid past the interloper (r4 ADVICE fix: the pre-commit
        head-currency check alone left this race open)."""
        parent = self.latest_snapshot_id()
        if expected_parent is not None and parent != expected_parent:
            raise RuntimeError(
                f"table head moved before commit (expected parent "
                f"{expected_parent}, head {parent}) — re-run against "
                "the new head (rewrites resume from WAL)"
            )
        sid = (parent or 0) + 1
        # content-stable identity: equal data (per-partition checksums)
        # → equal hash across reruns, regardless of snapshot ids —
        # downstream stages cite THIS in their lineage so an identical
        # rerun resumes while changed upstream data invalidates
        content = hashlib.sha256(
            "|".join(
                f"{p}:{done[p]['row_count']}:{done[p]['checksum']}"
                for p in sorted(done)
            ).encode()
        ).hexdigest()[:16]
        # snapshot-id CAS: the snapshot file is created with
        # O_CREAT|O_EXCL, so two concurrent write_stage calls can never
        # both commit the same id — the loser observes the collision,
        # re-reads the winner's id as its parent, and retries with the
        # next id. Data/WAL are per-partition idempotent, so the only
        # contended resource is the id itself.
        while True:
            snap = {
                "snapshot_id": sid,
                "parent_id": parent,
                "stage_key": stage_key,
                "partition_col": partition_col,
                "content_hash": content,
                "partitions": [done[p] for p in sorted(done)],
                "total_rows": sum(e["row_count"] for e in done.values()),
                "skipped_partitions": skipped,
                "computed_partitions": pending_n,
                "created_at": time.time(),
            }
            path = os.path.join(self.manifest_dir, f"snapshot-{sid}.json")
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                if expected_parent is not None:
                    raise RuntimeError(
                        f"concurrent commit won snapshot id {sid} while "
                        f"compacting snapshot {expected_parent} — "
                        "re-run compact() against the new head"
                    ) from None
                parent = sid  # the competing writer's commit
                sid += 1
                continue
            with os.fdopen(fd, "w") as f:
                json.dump(snap, f)
                f.flush()
                os.fsync(f.fileno())
            # the snapshot file's DIR ENTRY must be durable before
            # LATEST can point at it — file fsync alone doesn't order
            # the create on every filesystem
            _fsync_dir(self.manifest_dir)
            break
        # advance LATEST monotonically (never move it backwards under a
        # concurrent higher-id commit)
        ptr = os.path.join(self.manifest_dir, "LATEST")
        for _ in range(5):
            cur = self.latest_snapshot_id()
            if cur is not None and cur >= sid:
                break
            tmp = f"{ptr}.tmp.{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                f.write(str(sid))
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, ptr)
            _fsync_dir(self.manifest_dir)
            if (self.latest_snapshot_id() or 0) >= sid:
                break
        return snap

    def verify_snapshot(self, snapshot_id: int | None = None) -> dict:
        """Row-count reconciliation: recount every partition's parquet
        footers vs the manifest. Returns {part: ok} map."""
        snap = self.snapshot(snapshot_id)
        if snap is None:
            raise FileNotFoundError("no snapshot")
        return {
            e["part"]: parquet_row_count(e["files"]) == e["row_count"]
            for e in snap["partitions"]
        }

    # -- maintenance: small-file compaction (S9, round 4) ---------------------

    def compact(
        self,
        spark: SparkSession,
        max_files_per_partition: int = 1,
        snapshot_id: int | None = None,
    ) -> dict:
        """Bin-pack compaction — the table-maintenance op every real
        lakehouse runs (Iceberg rewrite_data_files / Delta OPTIMIZE):
        partitions of the (pinned or latest) snapshot holding more than
        ``max_files_per_partition`` parquet files are rewritten to at
        most that many files; every other partition carries over BY
        REFERENCE (no data movement — copy-on-write touches only what
        changed). Commits a NEW snapshot through the same CAS protocol.

        Safety contract (the reason to trust it at 100 TB): a rewrite
        only commits if the rewritten partition's (row_count, checksum)
        EXACTLY equal the source entry's — the checksum is the
        order-insensitive xxhash64 row sum, so any row lost, duplicated
        or mutated by the rewrite aborts before the snapshot exists.
        Because per-partition checksums are preserved, the compacted
        snapshot's content_hash equals the source's: downstream lineage
        citing the content hash keeps resuming across compactions.

        Idempotent + crash-safe: rewrites WAL under the compaction's
        own stage key (which includes the max_files target, so two
        compactions of the same source at different targets can never
        clobber each other's committed files); resume skips verified
        rewrites; if NO partition exceeds the target the source
        snapshot is returned unchanged (no empty commit).

        Head-currency rule: compaction is a semantic no-op, so it only
        commits while its SOURCE is still the table head — if another
        writer advanced LATEST mid-compaction, committing would regress
        readers to pre-write content, so it raises instead (re-run
        against the new head; the WAL makes the retry cheap). The check
        happens immediately before commit; like Iceberg's
        rewrite_data_files without commit-time validators it narrows
        the race to the commit call itself rather than eliminating it
        (documented limit)."""
        snap = self.snapshot(snapshot_id)
        if snap is None:
            raise FileNotFoundError(f"no snapshot for table {self.dir}")
        need = {
            str(e["part"]) for e in snap["partitions"]
            if len(e["files"]) > max_files_per_partition
        }
        if not need:
            return snap
        stage_key = f"compact-{snap['snapshot_id']}-mf{max_files_per_partition}"
        lin = {
            "inputs": [f"snapshot:{snap['snapshot_id']}"],
            "params": {"max_files": max_files_per_partition},
            "code_version": "compact-v1",
        }
        wal = {
            p: e
            for p, e in self.wal_entries(stage_key).items()
            if e.get("lineage") == lin
        }
        stage_data = os.path.join(self.data_dir, stage_key)
        os.makedirs(stage_data, exist_ok=True)
        done: dict[str, dict] = {
            str(e["part"]): e
            for e in snap["partitions"]
            if str(e["part"]) not in need  # carried by reference
        }
        for p in sorted(need & set(wal)):
            done[p] = wal[p]  # crash-resume
        pending = sorted(need - set(done))
        src_by_part = {str(e["part"]): e for e in snap["partitions"]}
        if pending:
            # ONE Spark job rewrites every pending partition (the
            # write_stage single-compute shape — not a job per
            # partition): read all needy files with the data-root
            # basePath so `_part` rides along, hash-repartition on it
            # (each partition lands in exactly one task ⇒ ≤1 file each,
            # which satisfies any max_files ≥ 1), partitionBy-write.
            files = [f for p in pending for f in src_by_part[p]["files"]]
            # stage-grouped read: a mixed (already-compacted) source
            # snapshot's pending files can span stage dirs — one flat
            # read would hit CONFLICTING_DIRECTORY_STRUCTURES (r5 fix)
            src = self._read_stage_grouped(spark, files)
            cols = [c for c in src.columns if c != "_part"]  # file order
            # REBUILD the canonical `_part` from the DATA column before
            # the rewrite: the basePath read re-infers `_part` from
            # directory names, so a numeric-looking string partition
            # value ('01', '1e3', '1.10') would be re-typed and
            # partitionBy would write the re-rendered dir ('_part=1'),
            # KeyError-ing src_by_part AFTER files moved into
            # stage_data — the exact hazard write_stage's canonical
            # cast-to-string rule exists to prevent (r4 ADVICE fix).
            pcol = snap["partition_col"]
            src = src.withColumn("_part", F.col(pcol).cast("string"))
            tmp = os.path.join(self.dir, f"_tmp-compact-{uuid.uuid4().hex[:8]}")
            (
                src.repartition(len(pending), "_part")
                .write.mode("overwrite").partitionBy("_part").parquet(tmp)
            )
            back = spark.read.option("basePath", tmp).parquet(tmp)
            # group by the DATA column (never the inferred `_part` dir
            # value — directory type re-inference would turn '01' into
            # 1 and skew keys, the r3 canonical-partition rule)
            stats = {
                r["_p"]: (int(r["n"]), str(r["checksum"]))
                for r in back.groupBy(
                    F.col(pcol).cast("string").alias("_p")
                )
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    _row_checksum_agg(cols).alias("checksum"),
                )
                .collect()
            }
            for part in pending:
                e = src_by_part[part]
                got = stats.get(part)
                if got != (int(e["row_count"]), str(e["checksum"])):
                    shutil.rmtree(tmp, ignore_errors=True)
                    raise RuntimeError(
                        f"compaction of partition {part!r} changed content "
                        f"({(e['row_count'], e['checksum'])} → {got}) — "
                        "aborted before commit"
                    )
            from urllib.parse import unquote

            for dname in sorted(
                d for d in os.listdir(tmp)
                if d.startswith("_part=") and os.path.isdir(os.path.join(tmp, d))
            ):
                part = unquote(dname.split("=", 1)[1])
                dst = os.path.join(stage_data, f"_part={_wal_name(part)}")
                if os.path.isdir(dst):
                    shutil.rmtree(dst)
                os.replace(os.path.join(tmp, dname), dst)
                done[part] = self._write_wal_entry(
                    stage_key, part, dst,
                    src_by_part[part]["row_count"],
                    src_by_part[part]["checksum"], lin,
                )
            shutil.rmtree(tmp, ignore_errors=True)
        # head-currency: committing a compaction of a superseded base
        # would silently drop the newer writer's data from the head
        cur = self.latest_snapshot_id()
        if cur != snap["snapshot_id"]:
            raise RuntimeError(
                f"table head moved during compaction (base "
                f"{snap['snapshot_id']}, head {cur}) — re-run compact() "
                "against the new head (rewrites resume from WAL)"
            )
        return self._commit_snapshot(
            stage_key,
            snap["partition_col"],
            done,
            skipped=len(done) - len(pending),
            pending_n=len(pending),
            expected_parent=snap["snapshot_id"],
        )
