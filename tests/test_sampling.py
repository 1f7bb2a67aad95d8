"""Deterministic split/sampling: cross-engine bucket parity,
proportions, nesting, exact stratified quotas."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine import sampling


def test_bucket_spark_matches_duckdb(spark):
    # keys spanning the full int64 positive range incl. >2^60
    keys = [0, 1, 2, 17, 999, 2**31 - 1, 2**31, 10**12, 2**60 + 12345, 2**62]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = (
        df.withColumn("b", sampling.bucket_col(F.col("k")))
        .orderBy("k")
        .toPandas()
    )
    want = (
        duckdb.sql(
            f"SELECT k, {sampling.bucket_sql('k')} AS b FROM "
            f"(SELECT UNNEST({keys}::BIGINT[]) AS k) ORDER BY k"
        )
        .df()
    )
    assert got.b.tolist() == want.b.tolist()
    assert all(0 <= b < 10_000 for b in got.b)


def test_hash_split_proportions_and_determinism(spark):
    df = spark.range(0, 20_000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    out = sampling.hash_split(df, "doc_id", w)
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] / 20_000 - 0.9) < 0.01
    assert abs(counts["val"] / 20_000 - 0.05) < 0.005
    assert abs(counts["test"] / 20_000 - 0.05) < 0.005
    # stable under repartition (the whole point vs rand())
    again = sampling.hash_split(df.repartition(13), "doc_id", w)
    a = set(t.doc_id for t in out.filter("split = 'val'").collect())
    b = set(t.doc_id for t in again.filter("split = 'val'").collect())
    assert a == b


def test_sample_fraction_nested_supersets(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    s10 = set(r.doc_id for r in sampling.sample_fraction(df, "doc_id", 0.10).collect())
    s25 = set(r.doc_id for r in sampling.sample_fraction(df, "doc_id", 0.25).collect())
    assert s10 < s25
    assert abs(len(s10) / 10_000 - 0.10) < 0.01
    assert abs(len(s25) / 10_000 - 0.25) < 0.015


def test_stratified_exact_quota(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(1000, dtype=np.int64),
            "lang": ["en"] * 700 + ["de"] * 299 + ["fr"] * 1,
        }
    )
    df = spark.createDataFrame(pdf)
    out = sampling.stratified_exact(df, ["lang"], "doc_id", 0.10).toPandas()
    got = out.groupby("lang").size().to_dict()
    assert got == {"en": 70, "de": 30, "fr": 1}  # ceil(0.1 * n) each
    # deterministic: rerun picks the identical rows
    out2 = sampling.stratified_exact(df, ["lang"], "doc_id", 0.10).toPandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)


def test_bucket_no_overflow_on_huge_keys(spark):
    # products in the mix must stay < 2^63: DuckDB would raise on
    # overflow, Spark would silently wrap — parity test is the guard
    df = spark.createDataFrame([(2**63 - 1,), (2**62 + 7,)], "k long")
    vals = (
        df.withColumn("b", sampling.bucket_col(F.col("k"))).toPandas().b.tolist()
    )
    want = duckdb.sql(
        f"SELECT {sampling.bucket_sql('k')} AS b FROM "
        f"(SELECT UNNEST([{2**63 - 1}, {2**62 + 7}]::BIGINT[]) AS k)"
    ).df().b.tolist()
    assert vals == want
