"""Inverse-distance-weighted (IDW) point-to-raster interpolation — the
``gdal_grid``-style vector→raster transfer that complements rasterize
(A2: points binned per cell) with a true scattered-data interpolant.

Scale design: pure JVM column arithmetic, ONE shuffle. Each point
fans out map-side to its candidate cells (two nested
``explode(sequence(...))`` — (2⌈R⌉+3)² rows per point, a bounded
constant), the euclidean radius filter prunes the corners, and the
per-cell combine ``sum(w·v)/sum(w)`` is an algebraic groupBy —
map-side partial aggregation absorbs dense point clusters before the
one shuffle on the cell key. No Python anywhere in the path, no
per-cell loop, no driver materialization; at 10^12 points this is a
map + one combine-enabled shuffle of ≤(2⌈R⌉+3)²·points rows.

Pinned semantics (SQL-replicable — oracle = cells×points cross join):
- pixel (i, j) covers [i, i+1)×[j, j+1), center (i+0.5, j+0.5);
  points live in the same continuous pixel coordinate frame;
- a point contributes to every in-bounds cell whose CENTER is within
  euclidean distance R (d² ≤ R², exact in both engines);
- weight w = 1 / max(d², ε), ε = 1e-12 — the ε floor IS the
  exact-hit rule (a point on a cell center dominates that cell by
  ~R²/ε without a divergent special case);
- value = Σ w·v / Σ w over contributing points; cells with no point
  within R emit no row (sparse output).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["idw_grid"]


def idw_grid(
    points: DataFrame,
    radius: float,
    nx: int,
    ny: int,
    eps: float = 1e-12,
) -> DataFrame:
    """``points`` (px double, py double, v double) → sparse cell grid
    (i, j, value) of the IDW interpolant on [0,nx)×[0,ny)."""
    rr = int(math.ceil(radius)) + 1
    px, py = F.col("px"), F.col("py")
    i, j = F.col("i"), F.col("j")
    base_i = F.floor(px - 0.5).cast("long")
    base_j = F.floor(py - 0.5).cast("long")
    cand = (
        points.select("px", "py", "v")
        .withColumn("i", F.explode(F.sequence(base_i - rr, base_i + rr)))
        .withColumn("j", F.explode(F.sequence(base_j - rr, base_j + rr)))
        .filter((i >= 0) & (i < nx) & (j >= 0) & (j < ny))
    )
    dx = px - (i.cast("double") + 0.5)
    dy = py - (j.cast("double") + 0.5)
    d2 = dx * dx + dy * dy
    w = F.lit(1.0) / F.greatest(F.col("d2"), F.lit(eps))
    return (
        cand.withColumn("d2", d2)
        .filter(F.col("d2") <= radius * radius)
        .groupBy("i", "j")
        .agg((F.sum(w * F.col("v")) / F.sum(w)).alias("value"))
    )
