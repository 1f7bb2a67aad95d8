"""t2: replicate the driver's correctness gate locally — run every
queries() entry on sf0.01 via Spark AND the matching oracle_sql() via
DuckDB, compare row count + column set + order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(9)
        if pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("Int64")
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
    return pdf.sort_values(list(pdf.columns), na_position="first").reset_index(
        drop=True
    )


QUERY_NAMES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got = normalize(fn(spark, SF_DIR).toPandas())
    want = normalize(ddb.sql(sql).df())
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            np.testing.assert_allclose(
                g.astype(float).to_numpy(),
                w.astype(float).to_numpy(),
                rtol=1e-9,
                atol=1e-9,
                equal_nan=True,
                err_msg=f"{name}.{c}",
            )
        else:
            assert g.astype(str).tolist() == w.astype(str).tolist(), f"{name}.{c}"


def test_rows_only_queries_run(spark):
    """Spatial queries without SQL oracles: run at sf0.01, rows > 0,
    flat schema (the golden correctness lives in tests/test_tiling.py)."""
    qs = entrymod.queries()
    for name in qs:
        if name in QUERY_NAMES:
            continue
        df = qs[name](spark, SF_DIR)
        pdf = df.limit(2000).toPandas()
        assert len(pdf) > 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema is not None
