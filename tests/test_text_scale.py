"""Scale-shape guards for the text/embedding dedup operators: the q25
SRP-LSH candidate set must be sublinear in n² (the round-1 16-bucket
variant was nominally bucketed but quadratic), with near-total recall
of the deterministic clone pairs."""

from __future__ import annotations

from engine import text_queries as tq

SF = "/root/testdata/sf0.1"  # 2000 embeddings -> 4000-vector corpus


def test_srp_lsh_candidates_sublinear(spark):
    corpus = tq._neardup_corpus(spark, SF)
    n = corpus.count()
    assert n == 4000
    n_cand = tq.neardup_candidates(corpus).count()
    all_pairs = n * (n - 1) / 2
    assert n_cand < all_pairs / 20, (n_cand, all_pairs)


def test_srp_lsh_recall_of_clone_pairs(spark):
    res = tq.q25_embedding_neardup(spark, SF).toPandas()
    clones = res[(res.vec_b - res.vec_a) == tq._CLONE_OFFSET]
    assert len(clones) >= 0.99 * 2000, len(clones)
    assert (clones.cos_sim > 0.999).all()
    # nothing except clone pairs clears TAU on this corpus
    assert len(res) == len(clones)


def test_neardup_clusters_chain_and_forest(spark):
    """The q37 connected-components core on synthetic graphs a clique
    fixture can't exercise: a 12-doc CHAIN (multi-hop label travel —
    the pointer-jump rounds must converge, not just clique broadcast),
    a separate triangle, and an isolated pair."""
    from engine.text_queries import neardup_clusters

    chain = [(f"d{i:02d}", f"d{i+1:02d}") for i in range(11)]
    tri = [("t1", "t2"), ("t2", "t3"), ("t1", "t3")]
    pair = [("z8", "z9")]
    pairs = spark.createDataFrame(
        chain + tri + pair, "doc_a string, doc_b string"
    )
    rows = {r.doc_id: r for r in neardup_clusters(pairs).collect()}
    assert len(rows) == 12 + 3 + 2
    for i in range(12):
        r = rows[f"d{i:02d}"]
        assert r.cluster_id == "d00" and r.cluster_size == 12
        assert r.keep == (1 if i == 0 else 0)
    assert {rows[d].cluster_id for d in ("t1", "t2", "t3")} == {"t1"}
    assert rows["t1"].cluster_size == 3 and rows["t1"].keep == 1
    assert rows["z8"].cluster_id == "z8" and rows["z9"].cluster_size == 2


def test_q39_plan_broadcasts_benchmark_grams(spark):
    """D23's scale contract is its physical shape: the bounded
    benchmark gram set must BROADCAST (train windows never shuffle for
    the semi-join). Locks the plan, not just the values."""
    from engine.text_queries import q39_decontamination

    df = q39_decontamination(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "BroadcastHashJoin" in plan
    # NO join in this query may regress to sort-merge — the gram
    # semi-join is the scale-critical one and must stay broadcast
    assert "SortMergeJoin" not in plan


def test_q43_plan_broadcasts_thresholds(spark):
    """D27's per-group threshold table is tiny and must broadcast; the
    corpus-side filter stays map-only."""
    from engine.queries import q43_balanced_mixture

    df = q43_balanced_mixture(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "BroadcastHashJoin" in plan
