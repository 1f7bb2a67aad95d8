"""Bucketed co-located join (J7 scale path): two tables bucketed +
sorted on cell_id join WITHOUT any Exchange — the physical plan proof
that pre-bucketing removes the shuffle a plain sort-merge join pays."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark):
    # warehouse dir is a static conf — unique table names + DROP TABLE
    # keep the session-default warehouse clean instead
    a_name = f"pts_a_{uuid.uuid4().hex[:8]}"
    b_name = f"pts_b_{uuid.uuid4().hex[:8]}"
    pts = spark.range(20000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 997).alias("cell_id"),
        (F.col("id") * 2.0).alias("val"),
    )
    for name in (a_name, b_name):
        (
            pts.write.bucketBy(8, "cell_id")
            .sortBy("cell_id")
            .mode("overwrite")
            .saveAsTable(name)
        )
    try:
        a = spark.table(a_name)
        b = spark.table(b_name).select(
            "cell_id", F.col("doc_id").alias("doc_b"), F.col("val").alias("val_b")
        )
        # disable broadcast so the join must be SMJ — bucketing should
        # then satisfy the distribution requirement with NO Exchange
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
        try:
            j = a.join(b, "cell_id")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan[:4000]
            assert j.count() > 0
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        for name in (a_name, b_name):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
