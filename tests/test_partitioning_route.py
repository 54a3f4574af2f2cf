"""The exploding-join pin and its env-driven cost route (r10, VERDICT r9
item 2): default pins unconditionally (the measured-best behavior — the
A/B that routed the pin off at sf0.1 ran 0.77x), `never` disables, and
`auto` with a byte threshold prices the feeding scan. All branches are
result-invariant — only physical partitioning may differ."""

from __future__ import annotations

from autonomous_orchestrator_ai_spark.operators.partitioning import (
    repartition_for_exploding_join,
    source_input_bytes,
)
from autonomous_orchestrator_ai_spark.plans.registry import (
    table,
    table_row_count,
)

SF = "/root/testdata/sf0.001"


def _pinned(df) -> bool:
    # the explicit-count repartition survives as RepartitionByExpression
    # [keys], N in the optimized logical plan
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return "RepartitionByExpression" in plan


def test_default_pins(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_EXPLODE_PIN", raising=False)
    monkeypatch.delenv(
        "SPARK_GRAFT_EXPLODE_PIN_MIN_INPUT_BYTES", raising=False
    )
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    out = repartition_for_exploding_join(li, "l_orderkey")
    assert _pinned(out)
    assert out.rdd.getNumPartitions() == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )


def test_never_skips(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_EXPLODE_PIN", "never")
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    out = repartition_for_exploding_join(li, "l_orderkey")
    assert out is li


def test_auto_routes_on_priced_bytes(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_EXPLODE_PIN", "auto")
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    size = source_input_bytes(li)
    assert size is not None and size > 0
    # threshold above the scan -> skip; at or below -> pin
    monkeypatch.setenv(
        "SPARK_GRAFT_EXPLODE_PIN_MIN_INPUT_BYTES", str(size * 10)
    )
    assert repartition_for_exploding_join(li, "l_orderkey") is li
    monkeypatch.setenv("SPARK_GRAFT_EXPLODE_PIN_MIN_INPUT_BYTES", "1")
    assert _pinned(repartition_for_exploding_join(li, "l_orderkey"))
    # expansion multiplies the priced bytes past the threshold
    monkeypatch.setenv(
        "SPARK_GRAFT_EXPLODE_PIN_MIN_INPUT_BYTES", str(size * 5)
    )
    assert _pinned(
        repartition_for_exploding_join(li, "l_orderkey", expansion=10.0)
    )


def test_route_is_result_invariant(spark, monkeypatch):
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    monkeypatch.setenv("SPARK_GRAFT_EXPLODE_PIN", "always")
    pinned = sorted(
        repartition_for_exploding_join(li, "l_orderkey").collect()
    )
    monkeypatch.setenv("SPARK_GRAFT_EXPLODE_PIN", "never")
    skipped = sorted(
        repartition_for_exploding_join(li, "l_orderkey").collect()
    )
    assert pinned == skipped


def test_table_row_count_matches_count(spark):
    for name in ("embeddings", "documents", "lineitem"):
        assert table_row_count(SF, name) == table(spark, SF, name).count()
