"""Polygon-overlay goldens (engine/overlay.py): the Sutherland-Hodgman
kernel against independent area references (even-odd point sampling,
exact bbox-quadrant tiling, convex commutativity), and the distributed
grid-bin operator against the per-pair kernel."""

from __future__ import annotations

import numpy as np

from engine.overlay import clip_convex, overlay_intersection, ring_area_q


def shoelace(xs, ys):
    return abs(float(np.sum(xs * np.roll(ys, -1) - np.roll(xs, -1) * ys))) / 2.0


def point_in_ring(px, py, xs, ys):
    """Even-odd rule, independent of the engine's PIP code."""
    n = len(xs)
    inside = np.zeros(len(px), dtype=bool)
    for k in range(n):
        x0, y0 = xs[k], ys[k]
        x1, y1 = xs[(k + 1) % n], ys[(k + 1) % n]
        crosses = (y0 > py) != (y1 > py)
        with np.errstate(invalid="ignore", divide="ignore"):
            xint = x0 + (py - y0) / (y1 - y0) * (x1 - x0)
        inside ^= crosses & (px < xint)
    return inside


SUBJ = (
    np.array([2.0, 22.0, 21.0, 12.0, 3.5]),
    np.array([2.0, 3.0, 13.5, 7.25, 14.0]),
)  # non-convex pentagon
CLIP = (
    np.array([6.0, 26.0, 26.0, 6.0]),
    np.array([5.0, 5.0, 17.0, 17.0]),
)  # rectangle


def test_clip_area_matches_point_sampling():
    """area(clip_convex(S, C)) ~ measure{p : p in S and p in C} on a
    dense grid — an algorithm-independent reference."""
    xs, ys = clip_convex(*SUBJ, *CLIP)
    assert len(xs) >= 3
    g = np.linspace(0.005, 29.995, 600)
    px, py = (a.ravel() for a in np.meshgrid(g, g))
    both = point_in_ring(px, py, *SUBJ) & point_in_ring(px, py, *CLIP)
    mc = both.sum() * (30.0 / 600) ** 2
    assert abs(shoelace(xs, ys) - mc) < 0.35  # grid-resolution error


def test_clip_bbox_quadrants_tile_the_subject():
    """Clipping by the 4 quadrant rectangles of the subject's bbox
    partitions it: piece areas sum exactly to the subject area."""
    sx, sy = SUBJ
    x0, x1 = sx.min(), sx.max()
    y0, y1 = sy.min(), sy.max()
    mx, my = (x0 + x1) / 2, (y0 + y1) / 2
    total = 0.0
    for qx0, qx1 in ((x0 - 1, mx), (mx, x1 + 1)):
        for qy0, qy1 in ((y0 - 1, my), (my, y1 + 1)):
            rect = (
                np.array([qx0, qx1, qx1, qx0]),
                np.array([qy0, qy0, qy1, qy1]),
            )
            xs, ys = clip_convex(sx, sy, *rect)
            if len(xs) >= 3:
                total += shoelace(xs, ys)
    np.testing.assert_allclose(total, shoelace(sx, sy), rtol=1e-12)


def test_convex_intersection_commutes():
    a = (np.array([0.0, 10, 12, 2]), np.array([0.0, 1, 9, 8]))
    b = (np.array([5.0, 15, 15, 5]), np.array([-2.0, -2, 6, 6]))
    ab = clip_convex(*a, *b)
    ba = clip_convex(*b, *a)
    np.testing.assert_allclose(shoelace(*ab), shoelace(*ba), rtol=1e-12)
    assert shoelace(*ab) > 1.0


def test_clip_winding_and_degenerate():
    # clip winding must not matter (re-oriented at entry)
    xs1, ys1 = clip_convex(*SUBJ, *CLIP)
    xs2, ys2 = clip_convex(*SUBJ, CLIP[0][::-1], CLIP[1][::-1])
    np.testing.assert_array_equal(np.sort(xs1), np.sort(xs2))
    # disjoint -> empty; fully inside -> identical ring
    empty = clip_convex(*SUBJ, CLIP[0] + 100.0, CLIP[1])
    assert len(empty[0]) == 0
    inside = clip_convex(
        *SUBJ, np.array([-10.0, 50, 50, -10]), np.array([-10.0, -10, 50, 50])
    )
    np.testing.assert_array_equal(inside[0], SUBJ[0])
    # quantized area/vsum on the empty ring
    assert ring_area_q(np.zeros(0), np.zeros(0)) == (0.0, 0)


def test_overlay_intersection_distributed_matches_kernel(spark):
    """The grid-bin candidate join + mapInPandas clip == a brute
    all-pairs kernel loop, including pairs spanning several bins and
    bbox-overlap-but-empty-intersection pairs."""
    rng_polys = [
        # a ring of shifted copies of the pentagon, crossing bin lines
        (i, (SUBJ[0] + 7.0 * i).tolist(), (SUBJ[1] + 3.0 * i).tolist())
        for i in range(6)
    ]
    clip_polys = [
        (j, (CLIP[0] + 9.0 * j).tolist(), (CLIP[1] + 5.0 * j).tolist())
        for j in range(4)
    ]
    ddl = "poly_id long, xs array<double>, ys array<double>"
    out = overlay_intersection(
        spark.createDataFrame(rng_polys, ddl),
        spark.createDataFrame(clip_polys, ddl),
        bin_size=16.0,
    ).collect()
    got = {(r.a_id, r.b_id): (r.n_pts, r.area_q, r.vsum_q) for r in out}
    want = {}
    for i, axs, ays in rng_polys:
        for j, bxs, bys in clip_polys:
            xs, ys = clip_convex(
                np.array(axs), np.array(ays), np.array(bxs), np.array(bys)
            )
            if len(xs) >= 3:
                area_q, vsum = ring_area_q(xs, ys)
                want[(i, j)] = (len(xs), area_q, vsum)
    assert got == want
    assert len(want) >= 6  # the fixture really produces overlaps


def test_overlay_plan_no_cartesian_one_clip_pass(spark):
    """The candidate join is a grid-bin EQUI-join (never a cartesian
    product), and the clip runs in ONE Python stage."""
    from engine.overlay import overlay_intersection

    ddl = "poly_id long, xs array<double>, ys array<double>"
    a = spark.createDataFrame(
        [(i, [0.0 + i, 5.0 + i, 5.0 + i, 0.0 + i], [0.0, 0.0, 5.0, 5.0])
         for i in range(20)], ddl,
    )
    b = spark.createDataFrame(
        [(j, [2.0 + j, 6.0 + j, 6.0 + j, 2.0 + j], [1.0, 1.0, 6.0, 6.0])
         for j in range(20)], ddl,
    )
    out = overlay_intersection(a, b)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("MapInPandas") == 1, plan
