"""moving_window_spark engine — a from-scratch PySpark-native spatial
tiling + join engine with the query capabilities of ahhz/moving_window,
generalized per BASELINE.json's north rule into a lakehouse pipeline.

Modules:
  grid       — pure-NumPy hierarchical cell index (H3/S2 stand-in)
  kernels    — per-tile NumPy focal (moving-window) statistics
  fixtures   — deterministic synthetic inputs (FIXTURES.md)
  session    — SparkSession builder
  udfs       — vectorized pandas/Arrow UDF wrappers over grid
  tiling     — rasterize, halo exchange, focal-apply (Spark operators)
  joins      — point-in-polygon + kNN spatial joins
  patches    — connected components + edge-corrected patch statistics
  lakehouse  — Iceberg-style snapshots/manifests over parquet
  pipeline   — end-to-end staged pipeline with resume
  textops    — dedup / text-analysis operators over documents
  simsearch  — embedding similarity search (brute force + LSH)
"""

__version__ = "0.1.0"
