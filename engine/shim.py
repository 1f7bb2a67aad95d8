"""Adapter from the driver's FLAT documents table to the interleaved
corpus shape (FIXTURES.md §4) — pure column arithmetic, no Python.

The driver's ``documents.parquet`` is ``(doc_id:int64, text, lang,
source, n_chars)`` with no spans column; the engine's contract input
(BASELINE.json:15) is ``(doc_id:string, spans:array<struct<...>>)``.
The shim derives a deterministic geo position from doc_id via two
Knuth-style hash folds so the same SQL is expressible in the DuckDB
oracle:

    lat = (doc_id * 2654435761 mod 2^32) / 2^32 * 120 - 60
    lon = (doc_id * 2246822519 mod 2^32) / 2^32 * 360 - 180
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

LAT_MULT = 2654435761
LON_MULT = 2246822519
TWO32 = 2**32


def shim_lat_col(doc_id: Column) -> Column:
    return (doc_id * F.lit(LAT_MULT)) % F.lit(TWO32) / F.lit(float(TWO32)) * 120.0 - 60.0


def shim_lon_col(doc_id: Column) -> Column:
    return (doc_id * F.lit(LON_MULT)) % F.lit(TWO32) / F.lit(float(TWO32)) * 360.0 - 180.0


# the same derivation as ANSI SQL fragments for the DuckDB oracle
SHIM_LAT_SQL = f"((doc_id * {LAT_MULT}) % {TWO32}) / {TWO32}.0 * 120 - 60"
SHIM_LON_SQL = f"((doc_id * {LON_MULT}) % {TWO32}) / {TWO32}.0 * 360 - 180"


def documents_interleaved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver documents → (doc_id:string, spans, part_id): one text span
    + one geo span whose media_ref carries the derived position."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lat, lon = shim_lat_col(F.col("doc_id")), shim_lon_col(F.col("doc_id"))
    geo_ref = F.format_string("geo:%.6f,%.6f", lat, lon)
    spans = F.array(
        F.struct(
            F.lit("text").alias("kind"),
            F.col("text").alias("text"),
            F.lit("").alias("media_ref"),
            F.lit(0).cast("int").alias("offset"),
        ),
        F.struct(
            F.lit("geo").alias("kind"),
            F.lit("").alias("text"),
            geo_ref.alias("media_ref"),
            F.col("n_chars").cast("int").alias("offset"),
        ),
    )
    return d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        spans.alias("spans"),
        (F.col("doc_id") % 16).cast("int").alias("part_id"),
    )
