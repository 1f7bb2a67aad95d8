"""Bilinear 2x upsampling of a tiled raster — the warp direction the
overview pyramid (engine/pyramid.py, downsample) doesn't cover; the
engine analogue of a gdalwarp/zoom-in resample.

Scale design: ONE 1-pixel halo exchange (the same JVM-side strip
machinery as every focal op — engine/tiling.halo_exchange) then one
applyInPandas per parent tile that emits its <=4 child tiles. No other
shuffle: output volume is 4x input, produced map-side after the halo
groupBy. Fusing interpolation into the halo-assembly stage is the plan
that survives scale-up — the alternative (explode per-pixel, join 4
corners) would shuffle 4 rows per OUTPUT pixel.

Pinned semantics (SQL-replicable; oracle = 4-corner arithmetic join):
- child pixel (ci, cj) at level L+1 interpolates parent coordinate
  p = (c + 0.5)/2 - 0.5 per axis: corners floor(p), floor(p)+1 with
  weights (1-frac, frac);
- NaN-aware renormalization: out = sum(w*v over valid corners) /
  sum(w over valid corners); no valid corner -> NaN. This gives
  border pixels (outside-raster corners) and interior-nodata the same
  rule — no special edge clamp;
- a corner weight of exactly 0 with a NaN corner still yields NaN
  denominator contribution 0 — i.e. 0-weight corners never poison a
  pixel (frac = 0.25/0.75 everywhere on the 2x grid, so every pixel
  has 4 nonzero corners except through this rule);
- child tile (2*tx + qx, 2*ty + qy) exists iff its slice of the 2x
  parent array is non-empty (ragged edge parents emit ragged/absent
  children).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from engine import tiling

__all__ = [
    "bilinear_2x",
    "inverse_mercator_to_platecarree",
    "sample_bilinear",
    "upsample_bilinear",
    "warp_affine",
    "warp_transform",
]


def _bilinear_corners(fx, fy):
    """THE pinned bilinear corner rule, in one place: corner order
    (0,0),(0,1),(1,0),(1,1) with per-axis weights (1-f, f). Every
    bilinear implementation in this module (_sample_from_rows,
    bilinear_2x, sample_bilinear) iterates this generator — the DuckDB
    oracles mirror the same rule bit-for-bit, so a weight/order change
    must happen here and nowhere else. The anchor convention
    (floor(p - 0.5), NaN-renormalize, den==0 -> NaN) is shared by the
    three call sites per their docstrings."""
    for dy in (0, 1):
        wy = (1.0 - fy) if dy == 0 else fy
        for dx in (0, 1):
            wx = (1.0 - fx) if dx == 0 else fx
            yield dy, dx, wy, wx


def _sample_from_rows(
    pdf: pd.DataFrame, p_i: np.ndarray, p_j: np.ndarray, method: str, T: int
) -> np.ndarray:
    """Sample source-pixel coordinates (p_i, p_j) from the gathered
    source-tile rows of one output group — the shared kernel of
    warp_affine and warp_transform. NaN coordinates (out of the
    transform's domain) and uncovered coordinates yield NaN.

    nearest: value of the containing cell floor(p). bilinear: 4 corners
    at floor(p−.5)(+1), fractional weights, NaN-renormalizing
    valid-corner rule (the engine's pinned corner convention)."""
    n = len(p_i)
    ok = np.isfinite(p_i) & np.isfinite(p_j)
    pi = np.where(ok, p_i, -(2.0**40))  # sentinel far outside any tile
    pj = np.where(ok, p_j, -(2.0**40))
    if method == "nearest":
        si = np.floor(pi).astype(np.int64)
        sj = np.floor(pj).astype(np.int64)
        out = np.full(n, np.nan)
        for row in pdf.itertuples(index=False):
            snr, snc = int(row.nrows), int(row.ncols)
            arr = np.asarray(row.data, dtype=np.float64)
            li = si - row.tile_x * T
            lj = sj - row.tile_y * T
            sel = (li >= 0) & (li < snc) & (lj >= 0) & (lj < snr)
            if sel.any():
                out[sel] = arr[lj[sel] * snc + li[sel]]
        return out
    # bilinear, pinned corner order (0,0),(0,1),(1,0),(1,1)
    i0 = np.floor(pi - 0.5).astype(np.int64)
    j0 = np.floor(pj - 0.5).astype(np.int64)
    fx = (pi - 0.5) - i0
    fy = (pj - 0.5) - j0
    num = np.zeros(n)
    den = np.zeros(n)
    for dy, dx, wy, wx in _bilinear_corners(fx, fy):
        ci, cj = i0 + dx, j0 + dy
        for row in pdf.itertuples(index=False):
            snr, snc = int(row.nrows), int(row.ncols)
            arr = np.asarray(row.data, dtype=np.float64)
            li = ci - row.tile_x * T
            lj = cj - row.tile_y * T
            sel = (li >= 0) & (li < snc) & (lj >= 0) & (lj < snr)
            if not sel.any():
                continue
            v = arr[lj[sel] * snc + li[sel]]
            okc = ~np.isnan(v)
            w = (wy * wx)[sel]
            num[sel] += np.where(okc, w * v, 0.0)
            den[sel] += np.where(okc, w, 0.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = num / den
    out[den == 0.0] = np.nan
    return out


def bilinear_2x(padded: np.ndarray, nr: int, nc: int, g: int = 1) -> np.ndarray:
    """(nr+2g, nc+2g) halo-padded parent -> (2nr, 2nc) bilinear child
    (NaN-aware renormalizing). Vectorized: one gather per corner."""
    # parent-local coords of child samples along one axis
    def axis(n: int) -> tuple[np.ndarray, np.ndarray]:
        p = (np.arange(2 * n) + 0.5) / 2.0 - 0.5
        i0 = np.floor(p).astype(np.int64)
        return i0, p - i0

    iy0, fy = axis(nr)
    ix0, fx = axis(nc)
    num = np.zeros((2 * nr, 2 * nc))
    den = np.zeros((2 * nr, 2 * nc))
    for dy, dx, wy, wx in _bilinear_corners(fx, fy):
        v = padded[np.ix_(iy0 + dy + g, ix0 + dx + g)]
        w = wy[:, None] * wx[None, :]
        ok = ~np.isnan(v)
        num += np.where(ok, w * v, 0.0)
        den += np.where(ok, w, 0.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = num / den
    out[den == 0.0] = np.nan
    return out


def upsample_bilinear(
    tiles: DataFrame, T: int, level: int, band: str | None = None
) -> DataFrame:
    """Tiled raster at ``level`` -> bilinear 2x raster at ``level+1``
    (same tile size T; 4x the tiles). Single-band input expected
    (filter by ``band`` if given)."""
    if band is not None:
        tiles = tiles.filter(tiles.band == band)
    g = 1
    exchanged = tiling.halo_exchange(tiles, T, g)

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        got = tiling.assemble_padded(pdf, T, g)
        if got is None:
            return pd.DataFrame(
                columns=["tile_x", "tile_y", "level", "band", "nrows", "ncols", "data"]
            )
        bands, nr, nc = got
        (band_name, padded), = bands.items()
        child = bilinear_2x(padded, nr, nc, g)
        rows = []
        for qy in (0, 1):
            y0, y1 = qy * T, min((qy + 1) * T, 2 * nr)
            for qx in (0, 1):
                x0, x1 = qx * T, min((qx + 1) * T, 2 * nc)
                if y0 >= y1 or x0 >= x1:
                    continue
                sub = child[y0:y1, x0:x1]
                rows.append(
                    {
                        "tile_x": 2 * int(key[0]) + qx,
                        "tile_y": 2 * int(key[1]) + qy,
                        "level": level + 1,
                        "band": band_name,
                        "nrows": sub.shape[0],
                        "ncols": sub.shape[1],
                        "data": sub.ravel(),
                    }
                )
        return pd.DataFrame(
            rows,
            columns=["tile_x", "tile_y", "level", "band", "nrows", "ncols", "data"],
        )

    return exchanged.groupBy("dst_tx", "dst_ty").applyInPandas(
        run, tiling.TILES_SCHEMA
    )


def sample_bilinear(
    points: DataFrame,
    tiles: DataFrame,
    T: int,
    band: str,
    point_cols: tuple[str, ...] = ("pt_id",),
) -> DataFrame:
    """Bilinear point drill — the interpolated sibling of
    engine/algebra.sample_raster (L3 reads the containing pixel; this
    blends the 4 surrounding pixel CENTERS with the same NaN-aware
    renormalizing corner rule as bilinear_2x, so the two resampling ops
    share one pinned semantics).

    ``points`` carries ``point_cols`` + continuous global pixel coords
    (gx, gy) in [0, nx)×[0, ny); pixel (i, j) center is (i+0.5, j+0.5).
    Sample at (gx, gy): p = g − 0.5 per axis, corners floor(p),
    floor(p)+1, weights (1−frac, frac); out = Σ w·v / Σ w over valid
    (non-NaN, in-raster) corners; NO valid corner → no output row.

    Scale design: ONE 1-pixel halo exchange ships each tile payload
    once with its neighbor rim, then ONE cogrouped applyInPandas
    joins the points of a tile against its padded array — corners that
    cross a tile boundary read the halo, never a second tile row, and
    the payload is never copied per point (the same
    join-would-duplicate-512KB argument as L3). Points shuffle once on
    their tile key.
    """
    t = tiles.filter(F.col("band") == band)
    exchanged = tiling.halo_exchange(t, T, 1)
    cols = list(point_cols)
    # anchor tile = the tile of the clamped floor corner: every corner
    # of the sample then lies inside that tile's 1-pixel padded array
    i0 = F.floor(F.col("gx") - 0.5).cast("long")
    j0 = F.floor(F.col("gy") - 0.5).cast("long")
    p = points.select(
        *cols,
        "gx",
        "gy",
        (F.greatest(i0, F.lit(0)) / T).cast("int").alias("s_tx"),
        (F.greatest(j0, F.lit(0)) / T).cast("int").alias("s_ty"),
    )

    def run(key, pts_pdf: pd.DataFrame, tiles_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(columns=[*cols, "value"])
        if len(pts_pdf) == 0 or len(tiles_pdf) == 0:
            return empty
        got = tiling.assemble_padded(tiles_pdf, T, 1)
        if got is None:
            # anchor tile ABSENT in a sparse raster: the halo exchange
            # still addressed the present neighbors' 1-pixel strips
            # here, so points whose corners reach into a present
            # neighbor get the documented valid-corner renormalization
            # instead of silently dropping (r3 ADVICE fix); the absent
            # center region stays NaN.
            padded = np.full((T + 2, T + 2), np.nan)
            for row in tiles_pdf.itertuples(index=False):
                block = np.asarray(row.data, dtype=np.float64).reshape(
                    row.nrows, row.ncols
                )
                padded[
                    row.oy : row.oy + row.nrows, row.ox : row.ox + row.ncols
                ] = block
        else:
            bands, nr, nc = got
            (_, padded), = bands.items()
        tx, ty = int(key[0]), int(key[1])
        px = pts_pdf["gx"].to_numpy(dtype=np.float64) - 0.5 - tx * T
        py = pts_pdf["gy"].to_numpy(dtype=np.float64) - 0.5 - ty * T
        ix0 = np.floor(px).astype(np.int64)
        iy0 = np.floor(py).astype(np.int64)
        fx, fy = px - ix0, py - iy0
        num = np.zeros(len(pts_pdf))
        den = np.zeros(len(pts_pdf))
        for dy, dx, wy, wx in _bilinear_corners(fx, fy):
            yy = np.clip(iy0 + dy + 1, 0, padded.shape[0] - 1)
            xx = np.clip(ix0 + dx + 1, 0, padded.shape[1] - 1)
            # clip only guards indexing; out-of-pad corners are NaN
            # pad anyway, and anchor choice keeps true corners in-pad
            v = padded[yy, xx]
            ok = ~np.isnan(v)
            w = wy * wx
            num += np.where(ok, w * v, 0.0)
            den += np.where(ok, w, 0.0)
        out = pts_pdf[cols].copy()
        with np.errstate(invalid="ignore", divide="ignore"):
            out["value"] = num / den
        return out[den > 0.0]

    out_schema = ", ".join(
        f"{c} {t_}" for c, t_ in zip(
            [*cols, "value"],
            [*[dict(p.dtypes)[c] for c in cols], "double"],
        )
    )
    return (
        p.groupBy("s_tx", "s_ty")
        .cogroup(exchanged.groupBy("dst_tx", "dst_ty"))
        .applyInPandas(run, out_schema)
    )


def warp_affine(
    tiles: DataFrame,
    T: int,
    coeffs: tuple[float, float, float, float, float, float],
    out_shape: tuple[int, int],
    band: str = "z",
    out_band: str = "warp",
    level: int = 0,
    method: str = "nearest",
    max_fanout: float = 4.0,
    stats: dict | None = None,
) -> DataFrame:
    """Affine warp / reproject (R2, round 3): output cell (oi, oj)
    samples the source at the continuous coordinate
    ``p_i = a·(oi+.5) + b·(oj+.5) + c``, ``p_j = d·(oi+.5) + e·(oj+.5)
    + f`` (pixel-center convention, coeffs = (a, b, c, d, e, f);
    i = x/col, j = y/row).

    method='nearest': the containing cell ``floor(p)``; out-of-raster
    or nodata → NaN. method='bilinear': 4 corners at
    ``floor(p−.5) (+1)`` with fractional weights and the engine's
    NaN-renormalizing valid-corner rule (same corner convention as
    bilinear_2x / sample_bilinear); no valid corner → NaN. The general
    gdalwarp shape: scale, rotate, translate, flip are all affine.

    Scale design: a PLANNING join on tile METADATA only — each output
    tile's pixel-center bbox maps through the affine to a source bbox
    (exact for an affine: extrema at corners), JVM `sequence`-exploded
    to the covered source-tile ids; the DATA join ships each source
    tile to exactly the output tiles that need it (fan-out ≈ the area
    ratio), then ONE applyInPandas per output tile gathers vectorized
    per present source tile. No per-pixel rows ever shuffle;
    absent/out-of-extent output tiles are simply absent (sparse-raster
    convention).

    Minification guard (round 4, pinned semantics; r5 fix): a strongly
    minifying affine would gather O(extent-ratio) source tiles into one
    output group — an executor-memory cliff at, say, 32x downscale.
    TWO guarded quantities (|det| alone misses anisotropic scales and
    pure shears entirely — (256, 0, …, 1/64, …) has |det| = 4 but
    spans ~257 source tile columns):
    the per-axis extent product ``fan = (|a|+|b|) · (|d|+|e|)``
    (source pixels per output pixel, == |det| for axis-aligned
    scales), reduced past ``max_fanout``; AND each single-axis extent
    (``|a|+|b|``, ``|d|+|e|``), reduced past 16 tiles so a skinny
    bbox can't gather a whole tile row. Pre-reduction goes through
    the overview pyramid (engine/pyramid.block_reduce semantics, the
    standard warp-with-overviews behavior) — MEAN for bilinear, MODE
    for nearest (averaging class codes would fabricate new classes
    under the categorical-preserving sampler) — and the warp samples
    that level with the coeffs rescaled by 2^levels. A loud 256-tile
    backstop in the gather kernel (warp_transform's contract) guards
    whatever the planner did not foresee. ``stats`` records {'det',
    'fanout_xy', 'overview_levels', 'residual_det'} for plan tests.
    """
    if method not in ("nearest", "bilinear"):
        raise ValueError(f"unknown warp method: {method}")
    a, b, c, d, e, f = (float(x) for x in coeffs)

    det = abs(a * e - b * d)
    fx, fy = abs(a) + abs(b), abs(d) + abs(e)
    n_over = 0
    if max_fanout and np.isfinite(max_fanout):
        while (fx * fy) / (4.0 ** n_over) > max_fanout or (
            max(fx, fy) / (2.0 ** n_over) > 16.0
        ):
            n_over += 1
    if stats is not None:
        stats["det"] = det
        stats["fanout_xy"] = (fx, fy)
        stats["overview_levels"] = n_over
        stats["residual_det"] = det / (4.0 ** n_over)
    if n_over:
        from engine import pyramid

        # band-filter FIRST: the overview reduction is Python-side
        # work per tile and must not run over the other bands
        reduced = tiles.filter(F.col("band") == band)
        agg = "mode" if method == "nearest" else "mean"
        for k in range(n_over):
            reduced = pyramid.build_overview(reduced, T, level - k, agg)
        s = float(2 ** n_over)
        return warp_affine(
            reduced, T,
            (a / s, b / s, c / s, d / s, e / s, f / s),
            out_shape, band=band, out_band=out_band, level=level,
            method=method, max_fanout=float("inf"),
        )

    H, W = out_shape
    nx_out = (W + T - 1) // T
    ny_out = (H + T - 1) // T
    # bilinear corners reach one pixel beyond the containing cell
    margin = 0 if method == "nearest" else 1

    out_tiles = tiles.sparkSession.range(nx_out * ny_out).select(
        (F.col("id") % nx_out).cast("int").alias("otx"),
        (F.col("id") / nx_out).cast("int").alias("oty"),
    )
    # ragged edge: actual pixel extent of each output tile
    ow = F.least(F.lit(W) - F.col("otx") * T, F.lit(T))
    oh = F.least(F.lit(H) - F.col("oty") * T, F.lit(T))
    x0 = F.col("otx") * T + F.lit(0.5)
    y0 = F.col("oty") * T + F.lit(0.5)
    x1 = F.col("otx") * T + ow - F.lit(0.5)
    y1 = F.col("oty") * T + oh - F.lit(0.5)
    corners_i = [
        F.lit(a) * xx + F.lit(b) * yy + F.lit(c)
        for xx in (x0, x1) for yy in (y0, y1)
    ]
    corners_j = [
        F.lit(d) * xx + F.lit(e) * yy + F.lit(f)
        for xx in (x0, x1) for yy in (y0, y1)
    ]
    si_min = F.floor(F.least(*corners_i)).cast("long") - margin
    si_max = F.floor(F.greatest(*corners_i)).cast("long") + margin
    sj_min = F.floor(F.least(*corners_j)).cast("long") - margin
    sj_max = F.floor(F.greatest(*corners_j)).cast("long") + margin
    plan = (
        out_tiles.select(
            "otx", "oty",
            F.explode(
                F.sequence(
                    F.floor(si_min / T).cast("int"), F.floor(si_max / T).cast("int")
                )
            ).alias("tile_x"),
            # F.floor on BOTH axes: a bare int cast truncates toward
            # zero and would under-cover negative tile rows (r3 ADVICE)
            F.floor(sj_min / T).cast("int").alias("_sty0"),
            F.floor(sj_max / T).cast("int").alias("_sty1"),
        )
        .select(
            "otx", "oty", "tile_x",
            F.explode(F.sequence("_sty0", "_sty1")).alias("tile_y"),
        )
    )
    joined = plan.join(
        tiles.filter(F.col("band") == band).select(
            "tile_x", "tile_y", "nrows", "ncols", "data"
        ),
        ["tile_x", "tile_y"],
    )

    def gather(key, pdf: pd.DataFrame) -> pd.DataFrame:
        otx, oty = int(key[0]), int(key[1])
        if len(pdf) > 256:
            # belt-and-braces executor-memory backstop (the
            # warp_transform contract): the fanout guard should keep
            # groups small; anything past it must fail loudly, not OOM
            raise RuntimeError(
                f"warp_affine: output tile ({otx},{oty}) gathers "
                f"{len(pdf)} source tiles — raise max_fanout guarding "
                "or pre-reduce the source"
            )
        onr = min(H - oty * T, T)
        onc = min(W - otx * T, T)
        oj, oi = np.divmod(np.arange(onr * onc), onc)
        gx = otx * T + oi + 0.5
        gy = oty * T + oj + 0.5
        p_i = a * gx + b * gy + c
        p_j = d * gx + e * gy + f
        out = _sample_from_rows(pdf, p_i, p_j, method, T)
        return pd.DataFrame(
            [{
                "tile_x": otx, "tile_y": oty, "level": level,
                "band": out_band, "nrows": onr, "ncols": onc, "data": out,
            }]
        )

    return joined.groupBy("otx", "oty").applyInPandas(gather, tiling.TILES_SCHEMA)


def inverse_mercator_to_platecarree(
    src_shape: tuple[int, int], out_shape: tuple[int, int], max_lat: float = 85.05112877980659
):
    """Inverse map for reprojecting an equirectangular (plate-carrée)
    source raster onto a Web-Mercator output grid — the classic
    tile-server warp. Output pixel (gx, gy) on an out_shape Mercator
    grid spanning lon [-180, 180] x gudermannian lat [-max_lat,
    max_lat]; returns the source pixel coordinates on an src_shape
    equirectangular grid spanning the same lon and lat [-90, 90].
    lat = 2*atan(exp(y)) - pi/2 (the inverse Mercator), vectorized."""
    sh, sw = src_shape
    oh, ow = out_shape
    y_max = np.log(np.tan(np.pi / 4.0 + np.radians(max_lat) / 2.0))

    def inv(gx: np.ndarray, gy: np.ndarray):
        lon = gx / ow * 360.0 - 180.0
        y = y_max - gy / oh * (2.0 * y_max)
        lat = np.degrees(2.0 * np.arctan(np.exp(y)) - np.pi / 2.0)
        p_i = (lon + 180.0) / 360.0 * sw
        p_j = (90.0 - lat) / 180.0 * sh
        return p_i, p_j

    return inv


def warp_transform(
    tiles: DataFrame,
    T: int,
    inverse,
    out_shape: tuple[int, int],
    band: str = "z",
    out_band: str = "warp",
    level: int = 0,
    method: str = "nearest",
    edge_samples: int = 9,
    margin: float = 2.0,
    max_gather_tiles: int = 64,
    stats: dict | None = None,
) -> DataFrame:
    """General (non-affine) warp / reprojection: output cell (oi, oj)
    samples the source at ``(p_i, p_j) = inverse(oi+.5, oj+.5)`` —
    ``inverse`` is any vectorized NumPy callable mapping output pixel
    coordinates to source pixel coordinates (plate-carrée → Mercator,
    sinusoidal, lens distortion, ...). NaN/inf from ``inverse`` =
    outside the transform's domain → NaN output. Sampling (nearest /
    bilinear NaN-renormalizing corners) is pinned identically to
    warp_affine (shared kernel ``_sample_from_rows``).

    Scale design — the warp_affine planning-join shape generalized:
    the source bbox of an output tile is no longer corner-exact, so a
    METADATA-ONLY mapInPandas over the output-tile list (ny·nx rows,
    never pixels) pushes ``edge_samples`` points per tile boundary edge
    through ``inverse`` and takes the sample bbox ± ``margin`` source
    pixels. Contract (standard gdalwarp sampling assumption): the
    transform is smooth enough that its coordinate extrema over a tile
    rectangle occur on (within ``margin`` px of) the boundary samples —
    true for every map projection at practical tile sizes. The bbox
    explodes JVM-side to covered source-tile ids, the DATA join ships
    each source tile only where needed, and ONE applyInPandas per
    output tile gathers. Per-pixel rows never shuffle.

    Guard: a tile whose bbox covers more than ``max_gather_tiles``
    source tiles raises (executor-memory cliff — strongly minifying
    transforms should pre-reduce through the overview pyramid, as
    warp_affine does automatically for the uniform-|det| affine case,
    or warp at a parent level). ``stats`` records
    {'max_fanout_tiles': n} for plan tests."""
    if method not in ("nearest", "bilinear"):
        raise ValueError(f"unknown warp method: {method}")
    H, W = out_shape
    nx_out = (W + T - 1) // T
    ny_out = (H + T - 1) // T
    marg = float(margin) + (0.0 if method == "nearest" else 1.0)
    S = int(edge_samples)

    out_tiles = tiles.sparkSession.range(nx_out * ny_out).select(
        (F.col("id") % nx_out).cast("int").alias("otx"),
        (F.col("id") / nx_out).cast("int").alias("oty"),
    )

    def plan_bbox(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                otx, oty = int(r.otx), int(r.oty)
                onr = min(H - oty * T, T)
                onc = min(W - otx * T, T)
                # boundary samples: S points per edge, pixel-center span
                tx = np.linspace(otx * T + 0.5, otx * T + onc - 0.5, S)
                ty = np.linspace(oty * T + 0.5, oty * T + onr - 0.5, S)
                gx = np.concatenate([tx, tx, np.full(S, tx[0]), np.full(S, tx[-1])])
                gy = np.concatenate([np.full(S, ty[0]), np.full(S, ty[-1]), ty, ty])
                p_i, p_j = inverse(gx, gy)
                p_i = np.asarray(p_i, dtype=np.float64)
                p_j = np.asarray(p_j, dtype=np.float64)
                ok = np.isfinite(p_i) & np.isfinite(p_j)
                if not ok.any():
                    continue  # fully outside the transform's domain
                rows.append({
                    "otx": otx, "oty": oty,
                    "sti0": int(np.floor((p_i[ok].min() - marg) / T)),
                    "sti1": int(np.floor((p_i[ok].max() + marg) / T)),
                    "stj0": int(np.floor((p_j[ok].min() - marg) / T)),
                    "stj1": int(np.floor((p_j[ok].max() + marg) / T)),
                })
            yield pd.DataFrame(
                rows, columns=["otx", "oty", "sti0", "sti1", "stj0", "stj1"]
            )

    planned = out_tiles.mapInPandas(
        plan_bbox, "otx int, oty int, sti0 int, sti1 int, stj0 int, stj1 int"
    )
    fanout = (
        (F.col("sti1") - F.col("sti0") + 1)
        * (F.col("stj1") - F.col("stj0") + 1)
    )
    planned = planned.withColumn("_fan", fanout)
    if stats is not None:
        # the stats aggregation runs the (metadata-only) planning pass
        # an extra time — deliberately NOT checkpointed/persisted: a
        # checkpoint pins non-recomputable blocks (executor loss kills
        # the query) and the plan is ny·nx ROWS of boundary samples,
        # cheap next to the warp itself; stats is a diagnostic path
        mf = planned.agg(F.max("_fan")).collect()[0][0]
        stats["max_fanout_tiles"] = int(mf or 0)
        if mf is not None and mf > max_gather_tiles:
            raise ValueError(
                f"warp_transform: an output tile's source bbox covers "
                f"{mf} tiles (> max_gather_tiles={max_gather_tiles}) — "
                "pre-reduce via the overview pyramid or warp at a parent "
                "level"
            )
    plan = (
        planned.select(
            "otx", "oty", "stj0", "stj1", "_fan",
            F.explode(F.sequence("sti0", "sti1")).alias("tile_x"),
        )
        .select(
            "otx", "oty", "tile_x", "_fan",
            F.explode(F.sequence("stj0", "stj1")).alias("tile_y"),
        )
    )
    joined = plan.join(
        tiles.filter(F.col("band") == band).select(
            "tile_x", "tile_y", "nrows", "ncols", "data"
        ),
        ["tile_x", "tile_y"],
    )

    def gather(key, pdf: pd.DataFrame) -> pd.DataFrame:
        otx, oty = int(key[0]), int(key[1])
        if len(pdf) and int(pdf["_fan"].iloc[0]) > max_gather_tiles:
            # executor-side guard: fires even when stats wasn't requested
            raise ValueError(
                f"warp_transform: output tile ({otx},{oty}) gathers "
                f"{int(pdf['_fan'].iloc[0])} source tiles "
                f"(> max_gather_tiles={max_gather_tiles})"
            )
        onr = min(H - oty * T, T)
        onc = min(W - otx * T, T)
        oj, oi = np.divmod(np.arange(onr * onc), onc)
        p_i, p_j = inverse(otx * T + oi + 0.5, oty * T + oj + 0.5)
        out = _sample_from_rows(
            pdf, np.asarray(p_i, dtype=np.float64),
            np.asarray(p_j, dtype=np.float64), method, T
        )
        return pd.DataFrame(
            [{
                "tile_x": otx, "tile_y": oty, "level": level,
                "band": out_band, "nrows": onr, "ncols": onc, "data": out,
            }]
        )

    return joined.groupBy("otx", "oty").applyInPandas(gather, tiling.TILES_SCHEMA)
