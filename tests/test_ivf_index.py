"""Persisted IVF index (operators/ivf_index.py): probe parity with the
inline operator, partition pruning, frozen-quantizer appends."""

import pytest
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.ivf import (
    ivf_topk,
    kmeans_sample,
)
from autonomous_orchestrator_ai_spark.operators.ivf_index import (
    append_to_ivf_index,
    build_ivf_index,
    load_ivf_centroids,
    query_ivf_index,
)
from autonomous_orchestrator_ai_spark.plans.registry import table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r.query_id, r.neighbor_id, r.cosine_sim, r.rank) for r in df.collect()
    )


@pytest.fixture(scope="module")
def emb(spark):
    return table(spark, SF, "embeddings")


@pytest.fixture(scope="module")
def centroids(emb):
    return kmeans_sample(emb, k=8, sample_size=200)


class TestIvfIndex:
    def test_probe_matches_inline_operator(self, spark, tmp_path, emb, centroids):
        queries = emb.filter(F.col("vec_id") < 10)
        path = str(tmp_path / "ivf")
        build_ivf_index(emb, path, centroids)
        via_index = query_ivf_index(spark, path, queries, k=5, n_probe=2)
        inline = ivf_topk(emb, queries, centroids, k=5, n_probe=2)
        assert _rows(via_index) == _rows(inline)

    def test_probe_scan_is_partition_pruned(self, spark, tmp_path, emb, centroids):
        path = str(tmp_path / "ivf")
        build_ivf_index(emb, path, centroids)
        probed = query_ivf_index(
            spark, path, emb.filter(F.col("vec_id") < 2), k=3, n_probe=1
        )
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        assert "bucket" in plan.split("PartitionFilters:")[1][:300]

    def test_append_uses_frozen_centroids_and_is_idempotent(
        self, spark, tmp_path, emb, centroids
    ):
        base = emb.filter(F.col("vec_id") < 100)
        extra = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 150))
        path = str(tmp_path / "ivf")
        build_ivf_index(base, path, centroids)
        append_to_ivf_index(extra, path, batch_id=0)
        n1 = spark.read.parquet(path).count()
        append_to_ivf_index(extra, path, batch_id=0)  # replay: no change
        assert spark.read.parquet(path).count() == n1 == 150
        # appended vectors are findable through the probe path
        out = query_ivf_index(
            spark, path, emb.filter(F.col("vec_id") == 120), k=3, n_probe=8
        )
        assert out.count() == 3
        # the quantizer round-trips exactly through the metadata
        assert (load_ivf_centroids(spark, path) == centroids).all()
        with pytest.raises(ValueError, match="batch_id must be >= 0"):
            append_to_ivf_index(extra, path, batch_id=-1)

    def test_missing_index_meta_raises(self, spark, tmp_path):
        with pytest.raises(ValueError, match="no IVF index metadata"):
            load_ivf_centroids(spark, str(tmp_path / "nope"))

    def test_empty_query_batch(self, spark, tmp_path, emb, centroids):
        path = str(tmp_path / "ivf")
        build_ivf_index(emb, path, centroids)
        out = query_ivf_index(
            spark, path, emb.filter(F.col("vec_id") < 0), k=3
        )
        assert out.count() == 0
