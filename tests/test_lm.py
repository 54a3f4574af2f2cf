"""operators.lm: bigram occurrences, add-one model, perplexity — hand-
computed invariants on a tiny corpus plus degenerate-document handling."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.lm import (
    bigram_model,
    bigram_occurrences,
    bigram_perplexity,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b a b"),  # bigrams: (a,b) (b,a) (a,b)
            (2, "a b c"),  # bigrams: (a,b) (b,c)
            (3, "x"),  # 1 token -> unscorable
            (4, ""),  # empty -> unscorable
        ],
        "doc_id long, text string",
    )


class TestOccurrences:
    def test_counts_and_order(self, docs):
        occ = bigram_occurrences(docs).collect()
        per_doc = {}
        for r in occ:
            per_doc.setdefault(r.doc_id, []).append((r.w1, r.w2))
        assert sorted(per_doc[1]) == [("a", "b"), ("a", "b"), ("b", "a")]
        assert sorted(per_doc[2]) == [("a", "b"), ("b", "c")]
        assert 3 not in per_doc and 4 not in per_doc

    def test_normalizes_case_and_whitespace(self, spark):
        df = spark.createDataFrame([(1, "  A   b ")], "doc_id long, text string")
        occ = bigram_occurrences(df).collect()
        assert [(r.w1, r.w2) for r in occ] == [("a", "b")]


class TestModel:
    def test_counts(self, docs):
        occ = bigram_occurrences(docs)
        c2, c1, v = bigram_model(occ)
        c2m = {(r.w1, r.w2): r.c2 for r in c2.collect()}
        assert c2m == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
        c1m = {r.w1: r.c1 for r in c1.collect()}
        assert c1m == {"a": 3, "b": 2}
        # vocabulary spans both bigram positions: {a, b, c}
        assert v.collect()[0].v_size == 3

    def test_context_totals_sum_bigrams(self, docs):
        occ = bigram_occurrences(docs)
        c2, c1, _ = bigram_model(occ)
        assert (
            c1.agg(F.sum("c1")).collect()[0][0]
            == c2.agg(F.sum("c2")).collect()[0][0]
        )


class TestPerplexity:
    def test_hand_computed(self, docs):
        # model: p(b|a)=(3+1)/(3+3)=2/3, p(a|b)=(1+1)/(2+3)=2/5,
        #        p(c|b)=(1+1)/(2+3)=2/5
        ppl = {r.doc_id: r for r in bigram_perplexity(docs).collect()}
        nll1 = -(math.log(2 / 3) * 2 + math.log(2 / 5)) / 3
        nll2 = -(math.log(2 / 3) + math.log(2 / 5)) / 2
        assert ppl[1].n_bigrams == 3 and ppl[2].n_bigrams == 2
        assert ppl[1].mean_nll == pytest.approx(nll1)
        assert ppl[2].perplexity == pytest.approx(math.exp(nll2))
        assert set(ppl) == {1, 2}  # unscorable docs drop out

    def test_repetitive_doc_is_more_predictable(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a b a b a b"), (2, "a c b a b c c a")],
            "doc_id long, text string",
        )
        ppl = {r.doc_id: r.perplexity for r in bigram_perplexity(df).collect()}
        assert ppl[1] < ppl[2]

    def test_no_python_udfs_in_plan(self, docs):
        plan = bigram_perplexity(docs)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
