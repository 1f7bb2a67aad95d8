"""Z-order clustered table layout (S10, round 4).

At 100 TB the dominant cost of a selective spatial query is the data it
does NOT read. The engine's cell id is already a Z-order (Morton) key
(engine/grid.py packs level(5b)|morton(58b)), so laying a table out as
``repartitionByRange(cell_id) + sortWithinPartitions(cell_id)`` gives
every parquet file a TIGHT [min, max] cell-id interval; any bbox query
— which P4 (grid.bbox_to_cell_ranges) compiles to a union of cell-id
ranges — can then skip whole files from footer statistics alone,
before a single data byte is read. This is the Iceberg/Delta
"Z-ORDER BY" layout expressed with stock Spark primitives:

- ``repartitionByRange`` samples the key distribution, so files are
  balanced by ROW COUNT even when the spatial distribution is skewed
  (a hash layout balances too, but destroys locality — the contrast
  test in tests/test_layout.py measures exactly this);
- parquet min/max stats per file/row-group are written by Spark for
  free on sorted data; the same intervals a manifest-based pruner
  (lakehouse.py) or Spark's own row-group filter pushdown consult.

``file_cell_spans``/``pruned_files`` read ONLY parquet footers (no
data I/O) — the driver-side planning cost is O(files), the same scan
a real table format's manifest replaces.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["file_cell_spans", "pruned_files", "write_clustered"]


def write_clustered(
    df: DataFrame, cell_col: str, path: str, n_files: int
) -> None:
    """Write `df` as `n_files` parquet files range-clustered on
    ``cell_col`` (Z-order layout — see module docstring)."""
    (
        df.repartitionByRange(n_files, F.col(cell_col))
        .sortWithinPartitions(cell_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_cell_spans(path: str, cell_col: str) -> dict[str, tuple[int, int]]:
    """{file: (min, max)} of ``cell_col`` from parquet FOOTERS only.

    A file with ANY row group missing min/max statistics (stats
    disabled, all-NULL chunk) gets the FULL int64 span — a pruner must
    treat unknown as must-read; silently omitting such a file would
    make prune-then-refine DROP its rows, the one failure a
    conservative planner can never have."""
    import pyarrow.parquet as pq

    full = (-(2**63), 2**63 - 1)
    out: dict[str, tuple[int, int]] = {}
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(cell_col)
        lo, hi = None, None
        unknown = False
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                unknown = True
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out[f] = full if (unknown or lo is None) else (int(lo), int(hi))
    return out


def pruned_files(
    spans: dict[str, tuple[int, int]], ranges: list[tuple[int, int]]
) -> list[str]:
    """Files whose [min, max] interval overlaps ANY query cell range —
    the candidate set a footer/manifest pruner would actually read."""
    return [
        f
        for f, (lo, hi) in spans.items()
        if any(lo <= rhi and hi >= rlo for rlo, rhi in ranges)
    ]
