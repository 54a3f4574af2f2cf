"""Blocked edit-distance join (entity resolution) operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.fuzzy import (
    blocked_levenshtein_join,
    first_token,
)


def _dirty(spark):
    return spark.createDataFrame(
        [
            (1, "small rng"),  # deletion inside 'ring'
            (2, "small ringg"),  # insertion
            (3, "large bol"),  # deletion inside 'bolt'
            (4, "large zebra"),  # no clean counterpart within distance
            (5, "tiny ring"),  # blocking key with no clean entry
        ],
        ["rec_id", "name"],
    )


def _clean(spark):
    return spark.createDataFrame(
        [("small ring",), ("large bolt",), ("large gear",)], ["clean_name"]
    )


def test_blocked_join_finds_expected_matches(spark):
    out = blocked_levenshtein_join(
        _dirty(spark),
        _clean(spark),
        "name",
        "clean_name",
        first_token("name"),
        first_token("clean_name"),
        max_dist=1,
    ).collect()
    got = {(r["rec_id"], r["clean_name"], r["edit_distance"]) for r in out}
    assert got == {
        (1, "small ring", 1),
        (2, "small ring", 1),
        (3, "large bolt", 1),
    }


def test_blocking_equals_naive_when_key_preserved(spark):
    # every dirty name keeps its first token, so first-token blocking is
    # lossless: the blocked join must equal the unblocked cross filter
    dirty, clean = _dirty(spark), _clean(spark)
    blocked = blocked_levenshtein_join(
        dirty,
        clean,
        "name",
        "clean_name",
        first_token("name"),
        first_token("clean_name"),
        max_dist=2,
    ).select("rec_id", "clean_name", "edit_distance")
    naive = (
        dirty.crossJoin(clean)
        .withColumn("edit_distance", F.levenshtein("name", "clean_name"))
        .where(
            (F.col("edit_distance") <= 2)
            & (first_token("name") == first_token("clean_name"))
        )
        .select("rec_id", "clean_name", "edit_distance")
    )
    assert sorted(map(tuple, blocked.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_length_prefilter_is_lossless(spark):
    # a pair at exactly max_dist via pure insertions sits on the length
    # prefilter boundary and must survive it
    dirty = spark.createDataFrame([(1, "ab")], ["rec_id", "name"])
    clean = spark.createDataFrame([("abxy",)], ["clean_name"])
    out = blocked_levenshtein_join(
        dirty, clean, "name", "clean_name",
        F.lit(1), F.lit(1), max_dist=2,
    ).collect()
    assert len(out) == 1 and out[0]["edit_distance"] == 2


def test_negative_max_dist_rejected(spark):
    with pytest.raises(ValueError):
        blocked_levenshtein_join(
            _dirty(spark), _clean(spark), "name", "clean_name",
            F.lit(1), F.lit(1), max_dist=-1,
        )
