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
