"""Zonal statistics: per-zone aggregates of a value raster (A-family
extension; the classic companion of focal stats in every raster
engine).

Scale design (the part that matters at 100 TB): statistics are
decomposable, so ONE ``applyInPandas`` pass computes per-(tile, zone)
partials — the raster never leaves its tiles and the only shuffle is
the tiny per-zone final merge (#zones rows per tile, not T^2). This is
the same partial+final shape Catalyst generates for a hash aggregate,
expressed at tile granularity because the inputs are packed tile
payloads rather than cell rows. Zones defined by polygons reduce to
this: rasterize the polygon ids (J1 cover join + A2) into a zone band,
then run ``zonal_stats``.

Pinned semantics:
- zone ids are the integer cast of the zone band's cell values;
- a cell contributes iff BOTH its zone and its value are valid
  (non-NaN); empty zones don't appear;
- mean = sum/count at extract time (one division, SQL-replicable).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["zonal_stats"]

_PARTIAL_SCHEMA = "zone long, n long, s double, mn double, mx double"


def zonal_stats(
    tiles: DataFrame,
    T: int,
    zone_band: str = "zone",
    value_band: str = "z",
) -> DataFrame:
    """tiles (two bands per tile) -> one row per zone:
    (zone, n_cells, z_sum, z_mean, z_min, z_max), sums/extrema rounded
    to 4 decimals (the oracle convention for float-hash stability)."""
    both = tiles.filter(F.col("band").isin([zone_band, value_band]))

    def partials(key, pdf: pd.DataFrame) -> pd.DataFrame:
        by_band = {r.band: r for r in pdf.itertuples(index=False)}
        zr = by_band.get(zone_band)
        vr = by_band.get(value_band)
        if zr is None or vr is None:
            return pd.DataFrame(columns=["zone", "n", "s", "mn", "mx"])
        zone = np.asarray(zr.data, dtype=np.float64)
        val = np.asarray(vr.data, dtype=np.float64)
        m = min(len(zone), len(val))
        zone, val = zone[:m], val[:m]
        ok = np.isfinite(zone) & np.isfinite(val)
        if not ok.any():
            return pd.DataFrame(columns=["zone", "n", "s", "mn", "mx"])
        z = zone[ok].astype(np.int64)
        v = val[ok]
        uniq, inv = np.unique(z, return_inverse=True)
        n = np.bincount(inv)
        s = np.bincount(inv, weights=v)
        mn = np.full(len(uniq), np.inf)
        mx = np.full(len(uniq), -np.inf)
        np.minimum.at(mn, inv, v)
        np.maximum.at(mx, inv, v)
        return pd.DataFrame({"zone": uniq, "n": n, "s": s, "mn": mn, "mx": mx})

    part = both.groupBy("tile_x", "tile_y").applyInPandas(partials, _PARTIAL_SCHEMA)
    return (
        part.groupBy("zone")
        .agg(
            F.sum("n").alias("n_cells"),
            F.round(F.sum("s"), 4).alias("z_sum"),
            F.round(F.sum("s") / F.sum("n"), 4).alias("z_mean"),
            F.round(F.min("mn"), 4).alias("z_min"),
            F.round(F.max("mx"), 4).alias("z_max"),
        )
    )
