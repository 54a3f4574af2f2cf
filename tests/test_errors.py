"""Error-policy tests (reference decision table, tests/test_spark_jobs.py:
462-495, made executable)."""

from __future__ import annotations

from autonomous_orchestrator_ai_spark.agent.errors import (
    classify_error,
    should_retry,
)


def test_reference_scenarios():
    kafka = classify_error("kafka_connection_failed")
    assert kafka.action == "retry_with_backoff" and kafka.max_retries == 3

    parse = classify_error("schema_parse_error")
    assert parse.action == "log_and_continue" and parse.quarantine is True

    sink = classify_error("sink_write_failure")
    assert sink.action == "fail_job" and sink.escalate is True


def test_unknown_errors_fail_safe():
    p = classify_error("something_never_seen")
    assert p.action == "fail_job" and p.escalate is True


def test_retry_budget():
    assert should_retry("kafka_connection_failed", 0) is True
    assert should_retry("kafka_connection_failed", 2) is True
    assert should_retry("kafka_connection_failed", 3) is False
    assert should_retry("sink_write_failure", 0) is False
