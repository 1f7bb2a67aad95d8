"""J5 skew handling: histogram-driven salt factor (SURVEY.md §4.3).

AQE's skew-join splitting does not help ``applyInPandas`` groups — a
hot group key lands in one Python worker regardless — so the salt
factor is chosen explicitly from an observed key histogram:
``S = ceil(hot_key_count / p95_key_count)``, capped at 32. The
histogram comes from a bounded sample so the pre-pass is cheap at any
scale (one extra narrow scan; at 100 TB run it on a table sample or
reuse stage metrics from the previous snapshot instead).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_CAP = 32
# default histogram sample for internal callers (engine.tiling) — at
# 100 TB an unsampled key histogram is a full extra scan+shuffle of the
# input; the salt factor is a perf knob, so a 5% sample is plenty
DEFAULT_SAMPLE_FRACTION = 0.05


def key_histogram(df: DataFrame, keys: list[str], sample_fraction: float | None = None) -> DataFrame:
    d = df.sample(sample_fraction, seed=42) if sample_fraction else df
    return d.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))


def choose_salt(
    df: DataFrame, keys: list[str], sample_fraction: float | None = None, cap: int = SALT_CAP
) -> int:
    """ceil(max_key_count / p95_key_count), in [1, cap]."""
    hist = key_histogram(df, keys, sample_fraction)
    row = hist.agg(
        F.max("n").alias("mx"),
        F.percentile_approx("n", 0.95).alias("p95"),
    ).first()
    if row is None or row.mx is None or not row.p95:
        return 1
    return int(min(max(1, math.ceil(row.mx / max(row.p95, 1))), cap))
