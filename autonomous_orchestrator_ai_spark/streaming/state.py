"""Custom stateful streaming operators (SURVEY.md §2.9 T7 scale path).

``streaming_session_stats`` demonstrates arbitrary per-key state with
``applyInPandasWithState`` — the escape hatch for semantics neither windowed
aggregation nor dropDuplicates can express (here: running session counting
with persistent per-user state across micro-batches).

``streaming_value_stats`` covers the same surface on Spark 4's successor
API, ``transformWithStateInPandas`` (StatefulProcessor + typed state
handles): composable named state variables and native per-state TTL —
the TTL is what keeps key-cardinality-unbounded state (e.g. per-user
stats over an open-ended user population) from growing forever without
hand-rolled timer bookkeeping.

State stays bounded because keys are users and the state row is constant
size; on a cluster the state store backend (RocksDB) holds it off-heap.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.DoubleType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_key", T.StringType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _session_fn(gap_seconds: float):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        for pdf in pdfs:
            for ts in sorted(pdf["event_seconds"]):
                if last_ts is None or ts - last_ts > gap_seconds:
                    n_sessions += 1
                last_ts = float(ts)
                n_events += 1
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_key": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return update


def streaming_session_stats(
    events: DataFrame,
    key_col: str = "id",
    ts_col: str = "event_timestamp",
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """Per-key running (n_sessions, n_events) maintained across
    micro-batches via GroupState. Emits the updated row for every key seen
    in a batch (update semantics)."""
    from pyspark.sql import functions as F

    prepared = events.select(
        F.col(key_col).cast("string").alias("user_key"),
        F.unix_timestamp(F.col(ts_col)).cast("double").alias("event_seconds"),
    )
    return prepared.groupBy("user_key").applyInPandasWithState(
        _session_fn(gap_seconds),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 StatefulProcessor API)
# ---------------------------------------------------------------------------

VALUE_STATS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_key", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


def _make_value_stats_processor(ttl_ms: int | None):
    from pyspark.sql.streaming import StatefulProcessor

    class ValueStatsProcessor(StatefulProcessor):
        """Running per-key (count, sum, max) in one named ValueState."""

        def init(self, handle) -> None:
            self._stats = handle.getValueState(
                "stats",
                "n_events BIGINT, total_value DOUBLE, max_value DOUBLE",
                ttlDurationMs=ttl_ms,
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._stats.exists():
                n, total, mx = self._stats.get()
            else:
                n, total, mx = 0, 0.0, float("-inf")
            for pdf in rows:
                v = pdf["value"]
                n += int(len(v))
                total += float(v.sum())
                mx = max(mx, float(v.max()))
            self._stats.update((n, total, mx))
            yield pd.DataFrame(
                {
                    "user_key": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return ValueStatsProcessor()


def streaming_value_stats(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key running value stats via ``transformWithStateInPandas``.

    ``ttl_ms`` bounds state lifetime natively (expired keys are evicted by
    the state store, not by user timer code) — the knob that makes
    unbounded key populations safe at stream scale.
    """
    from pyspark.sql import functions as F

    prepared = events.select(
        F.col(key_col).cast("string").alias("user_key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepared.groupBy("user_key").transformWithStateInPandas(
        _make_value_stats_processor(ttl_ms),
        outputStructType=VALUE_STATS_OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
