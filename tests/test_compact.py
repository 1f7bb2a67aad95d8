"""C8 compact/uncompact goldens: minimality, disjoint-exact cover, and
the uncompact round-trip."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from engine import udfs

P58 = 1 << 58


def _cells(spark, mortons, level):
    return spark.createDataFrame(
        [(int((level << 58) + m),) for m in mortons], "cell_id long"
    )


def test_compact_telescopes_complete_block(spark):
    """The full morton block [0, 64) at level 6 is exactly one level-3
    cell; a lone extra cell stays at level 6."""
    out = (
        udfs.compact_cells(_cells(spark, list(range(64)) + [1000], 6), 6, 3)
        .toPandas()
    )
    by_level = out.groupby("level")["cell_id"].apply(list).to_dict()
    assert by_level[3] == [3 * P58 + 0]
    assert by_level[6] == [6 * P58 + 1000]
    assert set(out.level) == {3, 6}


def test_compact_uncompact_roundtrip(spark):
    """uncompact(compact(S), L) == S for a deterministic scattered set
    (compact is lossless), and the compacted set is strictly smaller."""
    rng = np.random.default_rng(9)
    mortons = set()
    # plant complete sibling groups + scattered singles
    for p in rng.integers(0, 1024, 40):
        mortons.update(int(p) * 4 + np.arange(4))
    mortons.update(int(x) for x in rng.integers(0, 4096, 300))
    cells = _cells(spark, sorted(mortons), 6)
    comp = udfs.compact_cells(cells, 6, 3)
    n_comp = comp.count()
    assert n_comp < len(mortons)
    back = (
        udfs.uncompact_cells(comp, 6)
        .select((F.col("cell_id") - 6 * P58).alias("m"))
        .toPandas()["m"]
    )
    assert not back.duplicated().any()  # disjoint cover
    assert set(back) == mortons


def test_compact_deep_levels_checkpointed(spark):
    """level 22 → min_level 1 (21 chained rounds): the periodic
    localCheckpoint keeps the plan tree analyzable at depth; the
    round-trip stays lossless. A complete 4^3 block at morton 0
    telescopes exactly 3 levels; scattered singles survive at 22."""
    import numpy as np

    rng = np.random.default_rng(4)
    mortons = set(range(64))  # telescopes 22 → 19
    mortons.update(int(x) + 4096 for x in rng.integers(0, 1 << 20, 50))
    comp = udfs.compact_cells(_cells(spark, sorted(mortons), 22), 22, 1)
    pdf = comp.toPandas()
    assert 19 in set(pdf.level)
    assert (pdf.level >= 19).all()  # nothing promotes past the block's top
    back = (
        udfs.uncompact_cells(comp, 22)
        .select((F.col("cell_id") - 22 * P58).alias("m"))
        .toPandas()["m"]
    )
    assert not back.duplicated().any()
    assert set(back) == mortons
