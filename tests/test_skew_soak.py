"""Skew soak for the dedup/ANN guarded paths (VERDICT r2 item 7).

A deliberately skewed corpus — one boilerplate sentence shared by 50% of
docs, and one hot LSH bucket of near-identical docs — and assertions that
the guarded forms bound the candidate/intermediate volume while the
unguarded baselines blow up quadratically. The pinned quantity is the
CANDIDATE-PAIR COUNT, which is deterministic and is precisely what drives
runtime at scale (each candidate is a shuffled+verified row); wall-clock
ratios on shared CI hosts are noise.
"""

import pytest
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
)

N_DOCS = 400
N_BOILER = 200  # docs carrying the shared boilerplate sentence
BOILER = "all rights reserved terms of service apply contact support for help"


@pytest.fixture(scope="module")
def skewed_docs(spark):
    rows = []
    for i in range(N_DOCS):
        # per-doc unique content: no cross-doc shingles of its own
        body = f"document {i} alpha{i} beta{i} gamma{i} delta{i} epsilon{i}"
        text = f"{body} {BOILER}" if i < N_BOILER else body
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id bigint, text string").persist()


class TestBoilerplateShingleGuard:
    def test_df_cap_bounds_candidate_pairs(self, skewed_docs):
        # threshold=0 keeps EVERY pair sharing >=1 shingle: the candidate
        # set itself, i.e. the work the self-join must shuffle and verify
        unguarded = ngram_jaccard_pairs(
            skewed_docs, shingle_k=3, threshold=0.0
        ).count()
        guarded = ngram_jaccard_pairs(
            skewed_docs, shingle_k=3, threshold=0.0, max_shingle_df=10
        ).count()
        # the boilerplate shingles alone force all C(200,2) pairs
        assert unguarded >= N_BOILER * (N_BOILER - 1) // 2  # >= 19900
        # the df-cap kills the boilerplate join keys entirely: unique
        # per-doc content shares nothing, so no candidates survive
        assert guarded == 0
        assert unguarded / max(guarded, 1) > 100

    def test_guard_preserves_genuine_near_dups(self, spark):
        """The cap must only drop boilerplate-driven pairs: two docs that
        genuinely share non-boilerplate content keep their pair."""
        rows = [(i, f"doc {i} unique{i} filler{i} words{i} {BOILER}")
                for i in range(50)]
        rows.append((100, "real shared content here about spark engines"))
        rows.append((101, "real shared content here about spark engines too"))
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = ngram_jaccard_pairs(
            df, shingle_k=3, threshold=0.2, max_shingle_df=10
        ).collect()
        assert [(r.id_a, r.id_b) for r in out] == [(100, 101)]


class TestHotLshBucketGuard:
    @pytest.fixture(scope="class")
    def hot_bucket_sigs(self, spark):
        # 100 byte-identical docs -> identical minhash signatures -> one
        # bucket in EVERY band; 300 unique docs around them
        rows = [(i, "identical boilerplate page body " * 3) for i in range(100)]
        rows += [
            (i, f"unique doc {i} alpha{i} beta{i} gamma{i}")
            for i in range(100, N_DOCS)
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        return minhash_signatures(df, num_hashes=8).persist()

    def test_bucket_cap_bounds_candidates(self, hot_bucket_sigs):
        unguarded = lsh_candidate_pairs(hot_bucket_sigs, num_hashes=8).count()
        guarded = lsh_candidate_pairs(
            hot_bucket_sigs, num_hashes=8, max_bucket_size=20
        ).count()
        assert unguarded >= 100 * 99 // 2  # the hot bucket's 4950 pairs
        # capped: the hot bucket is dropped wholesale; random 16-bit band
        # collisions among 300 unique docs are the only residue
        assert guarded < 100
        assert unguarded / max(guarded, 1) > 40

    def test_cap_only_drops_oversized_buckets(self, spark):
        """Pairs from buckets at or under the cap survive unchanged."""
        rows = [(i, "small duplicate cluster body " * 2) for i in range(5)]
        rows += [(i, f"unique doc {i} x{i} y{i} z{i}") for i in range(5, 50)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        sigs = minhash_signatures(df, num_hashes=8)
        capped = {
            (r.id_a, r.id_b)
            for r in lsh_candidate_pairs(sigs, num_hashes=8, max_bucket_size=20)
            .collect()
        }
        # the 5-doc duplicate cluster (bucket size 5 <= 20) is intact
        expected = {(a, b) for a in range(5) for b in range(a + 1, 5)}
        assert expected <= capped
