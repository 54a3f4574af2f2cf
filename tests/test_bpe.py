"""BPE trainer unit tests (operators/bpe.py) — the registered queries are
hash-exact vs the unrolled-SQL oracle (plans/bpe_queries.py); these pin
the merge semantics on hand-computable corpora, especially the
left-to-right non-overlap rule the delimited-replace encoding relies on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.bpe import (
    SEP,
    bpe_apply_merge,
    bpe_initial_state,
    bpe_pair_counts,
    bpe_segment,
    bpe_train,
    bpe_word_counts,
)


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_word_counts_normalize_and_filter(spark):
    wc = {r["word"]: r["cnt"] for r in bpe_word_counts(
        _docs(spark, ["Low low! lower", "low-er low"])
    ).collect()}
    # "Low"->"low"; "low!" and "low-er" fail ^[a-z0-9]+$ and drop
    assert wc == {"low": 2, "lower": 1}


def test_pair_counts_weighted(spark):
    wc = _docs(spark, ["ab ab ab cd"])
    pc = {(r["a"], r["b"]): r["cnt"] for r in
          bpe_pair_counts(bpe_initial_state(
              bpe_word_counts(wc))).collect()}
    assert pc == {("a", "b"): 3, ("c", "d"): 1}


def test_apply_merge_left_to_right_non_overlapping(spark):
    state = spark.createDataFrame(
        [(f"a{SEP}a{SEP}a{SEP}", 1)], f"seq string, cnt long"
    )
    out = bpe_apply_merge(state, "a", "a").collect()[0]["seq"]
    # "aaa" merges the LEFTMOST pair only: [aa, a], never [a, aa]
    assert out == f"aa{SEP}a{SEP}"


def test_train_pins_known_merges(spark):
    # 5x "abab", 2x "abc": pairs round1 -> (a,b):12, (b,a):5, (b,c):2
    docs = _docs(spark, ["abab abab abab abab abab abc abc"])
    merges = bpe_train(docs, "text", n_merges=3)
    assert merges[0][1:] == ("a", "b", 12)
    # after merging 'ab': "ab|ab" -> pair (ab,ab):5 ; "ab|c" -> (ab,c):2
    assert merges[1][1:] == ("ab", "ab", 5)
    assert merges[2][1:] == ("abab", "c", 0) or merges[2][1:] == ("ab", "c", 2)


def test_segment_applies_merges_in_order(spark):
    merges = [(1, "a", "b", 0), (2, "ab", "c", 0)]
    df = spark.createDataFrame([("abcd",), ("xaby",)], "word string")
    got = {r["word"]: r["bpe_tokens"] for r in
           bpe_segment(df, "word", merges).collect()}
    assert got["abcd"] == ["abc", "d"]
    assert got["xaby"] == ["x", "ab", "y"]


def test_train_early_stop_on_single_chars(spark):
    # every word is one char: no pairs -> zero merges, no crash
    assert bpe_train(_docs(spark, ["a b c a"]), "text", 4) == []
