#!/usr/bin/env python
"""Per-round benchmark harness (driver contract).

Runs the headline jobs at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line:

    {"metric": "tiles_per_sec_focal_circle_r7", "value": N,
     "unit": "tiles/sec", "queries": {<name>: sec, ...}, "sf": 0.1, ...}

Headline legs (deterministic synthetic inputs, materialized before the
timed section — engine/bench_jobs.py):
  focal      circular-kernel r=7 focal mean over a dense 2048-tile
             (T=256) raster — the BASELINE.json tiles/sec metric
  pipeline   corpus → geocode → encode → rasterize → focal, end to end
  pip        broadcast-cover + exact-refine point-in-polygon join —
             the BASELINE.json join rows/sec metric
plus every driver-contract query from __spark_entry__.queries() timed
against the sf tables.

Scaling-efficiency evidence (N vs 4N parallelism) is produced by
BENCH/run_scaling.py, which reuses the same legs; its latest result is
folded into this JSON when present.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    scale = float(os.environ.get("SPARK_GRAFT_BENCH_SCALE", "1.0"))
    scratch = os.environ.get(
        "SPARK_GRAFT_SCRATCH", os.path.join(tempfile.gettempdir(), "mw_bench")
    )
    os.makedirs(scratch, exist_ok=True)

    from engine import bench_jobs
    from engine.deploy import ensure_shipped
    from engine.session import get_spark

    spark = get_spark("bench", cores=cpus)
    ensure_shipped(spark)

    t_all = time.perf_counter()
    queries: dict[str, float] = {}

    def steady(fn):
        # same discipline as the scaling harness: the first run per JVM
        # pays codegen/JIT/python-worker spin-up; time the second
        fn()
        return fn()

    # --- headline legs -----------------------------------------------------
    ny = max(int(32 * scale), 2)
    n_tiles, s_focal = steady(
        lambda: bench_jobs.leg_focal(spark, scratch, nx=2 * ny, ny=ny)
    )
    queries["focal_circle_r7_2048tiles"] = round(s_focal, 3)

    n_docs, n_ptiles, s_pipe = steady(
        lambda: bench_jobs.leg_pipeline(spark, scratch, n_docs=int(1_000_000 * scale))
    )
    queries["pipeline_docs_to_stats"] = round(s_pipe, 3)

    n_pts, n_pip_rows, s_pip = steady(
        lambda: bench_jobs.leg_pip(spark, scratch, n_points=int(4_000_000 * scale))
    )
    queries["pip_join_4m_points"] = round(s_pip, 3)

    # --- driver-contract queries at sf_dir ---------------------------------
    import __spark_entry__ as entrymod

    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            queries[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # a broken query must not sink the bench
            queries[name] = -1.0
            print(f"# bench query {name} FAILED: {e}", file=sys.stderr)

    total = time.perf_counter() - t_all

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "tiles_per_sec_focal_circle_r7",
        "value": round(n_tiles / s_focal, 2),
        "unit": "tiles/sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "total_sec": round(total, 2),
        "throughput": {
            "focal_tiles_per_sec": round(n_tiles / s_focal, 2),
            "pipeline_docs_per_sec": round(n_docs / s_pipe, 2),
            "pipeline_out_tiles": n_ptiles,
            "pip_join_rows_per_sec": round(n_pip_rows / s_pip, 2),
            "pip_join_out_rows": n_pip_rows,
            "pip_join_in_rows": n_pts,
        },
    }

    # fold in the latest N-vs-4N scaling evidence if the harness ran
    scaling_path = os.path.join(_REPO, "BENCH", "scaling.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            result["scaling"] = json.load(f)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
