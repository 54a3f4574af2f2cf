"""operators.graph.quality_ranked_survivors: keep the best-scoring copy
per near-dup cluster, smallest id on ties, singletons untouched."""

from __future__ import annotations

from pyspark.sql import Row

from autonomous_orchestrator_ai_spark.operators.graph import (
    dedup_survivors,
    quality_ranked_survivors,
)


def _corpus(spark):
    # clusters: {1,2,3} (chain), {4,5}; 6 and 7 edge-free
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, score=0.2),
            Row(doc_id=2, score=0.9),
            Row(doc_id=3, score=0.9),
            Row(doc_id=4, score=0.1),
            Row(doc_id=5, score=0.8),
            Row(doc_id=6, score=0.0),
            Row(doc_id=7, score=0.5),
        ]
    )
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=4, id_b=5)]
    )
    return docs, pairs


def test_best_score_survives_ties_break_to_smallest_id(spark):
    docs, pairs = _corpus(spark)
    got = {
        r["doc_id"]
        for r in quality_ranked_survivors(docs, pairs, "score").collect()
    }
    # cluster {1,2,3}: 2 and 3 tie at 0.9 -> 2; cluster {4,5}: 5 wins;
    # 6 and 7 are singletons.
    assert got == {2, 5, 6, 7}


def test_survivor_count_matches_min_id_policy(spark):
    docs, pairs = _corpus(spark)
    n_quality = quality_ranked_survivors(docs, pairs, "score").count()
    n_min_id = dedup_survivors(docs, pairs, "doc_id").count()
    assert n_quality == n_min_id == 4


def test_columns_and_rows_preserved(spark):
    docs, pairs = _corpus(spark)
    out = quality_ranked_survivors(docs, pairs, "score")
    assert set(out.columns) == {"doc_id", "score"}
    by_id = {r["doc_id"]: r["score"] for r in out.collect()}
    assert by_id[5] == 0.8 and by_id[6] == 0.0


def test_no_edges_means_everyone_survives(spark):
    docs, _ = _corpus(spark)
    empty = docs.select("doc_id").limit(0).selectExpr(
        "doc_id AS id_a", "doc_id AS id_b"
    )
    assert quality_ranked_survivors(docs, empty, "score").count() == docs.count()
