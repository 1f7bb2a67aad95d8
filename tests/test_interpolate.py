"""IDW golden tests: Spark grid == brute-force NumPy interpolant."""

from __future__ import annotations

import numpy as np
import pandas as pd

from engine import interpolate


def brute_idw(pts: pd.DataFrame, radius: float, nx: int, ny: int, eps=1e-12):
    out = {}
    for i in range(nx):
        for j in range(ny):
            d2 = (pts.px - (i + 0.5)) ** 2 + (pts.py - (j + 0.5)) ** 2
            sel = d2 <= radius * radius
            if not sel.any():
                continue
            w = 1.0 / np.maximum(d2[sel], eps)
            out[(i, j)] = float((w * pts.v[sel]).sum() / w.sum())
    return out


def test_idw_matches_bruteforce(spark):
    rng = np.random.default_rng(7)
    pts = pd.DataFrame(
        {
            "px": rng.uniform(-2, 18, 60),  # some out-of-grid points still contribute
            "py": rng.uniform(-2, 18, 60),
            "v": rng.uniform(0, 10, 60),
        }
    )
    got = (
        interpolate.idw_grid(spark.createDataFrame(pts), 3.0, 16, 16)
        .toPandas()
        .set_index(["i", "j"])["value"]
        .to_dict()
    )
    want = brute_idw(pts, 3.0, 16, 16)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-9)


def test_idw_exact_hit_dominates(spark):
    """A point sitting on a cell center takes that cell over via the
    eps floor; far cells blend."""
    pts = pd.DataFrame({"px": [2.5, 4.5], "py": [2.5, 2.5], "v": [100.0, 0.0]})
    got = (
        interpolate.idw_grid(spark.createDataFrame(pts), 4.0, 8, 8)
        .toPandas()
        .set_index(["i", "j"])["value"]
    )
    np.testing.assert_allclose(got[(2, 2)], 100.0, atol=1e-6)
    np.testing.assert_allclose(got[(4, 2)], 0.0, atol=1e-6)
    assert 0.0 < got[(3, 2)] < 100.0


def test_idw_plan_is_jvm_only(spark):
    """The whole path must stay in whole-stage codegen: no Python
    evals, exactly one shuffle (the cell-key combine)."""
    pts = spark.range(10).selectExpr(
        "CAST(id AS DOUBLE) AS px", "CAST(id AS DOUBLE) AS py", "1.0 AS v"
    )
    plan = (
        interpolate.idw_grid(pts, 2.0, 16, 16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in plan.lower() or "partial" in plan.lower()
