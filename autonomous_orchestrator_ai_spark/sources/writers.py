"""Sinks (reference S4/S5/S8 quarantine + partitioned parquet, SURVEY.md §2.1).

Partitioning choice mirrors the reference (country, plan —
ingest_transform.py:267) which enables partition pruning on read. At 100 TB,
(country, plan) yields ~40 partitions/day of manageable size; adding a date
partition column keeps file counts bounded and retention cheap (drop whole
date partitions instead of the reference's os.walk sweep, S10).
"""

from __future__ import annotations

import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] = ("country", "plan"),
    mode: str = "append",
) -> None:
    """Batch partitioned parquet writer (reference S4's batch twin)."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def stream_to_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] = ("country", "plan"),
    trigger: dict | None = None,
):
    """Streaming partitioned parquet sink (reference S4, ingest_transform.py:
    255-271): append mode, checkpointed, 30s processing-time trigger by
    default; pass ``trigger={"availableNow": True}`` for bounded test runs."""
    trigger = trigger or {"processingTime": "30 seconds"}
    return (
        df.writeStream.format("parquet")
        .outputMode("append")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy(*partition_by)
        .trigger(**trigger)
        .start()
    )


def foreach_batch_jdbc_sink(url: str, table: str, options: dict | None = None):
    """foreachBatch relational sink (reference S5's Snowflake writer,
    ingest_transform.py:273-305), generalized to any JDBC target.

    Skips empty batches with ``isEmpty()`` — the reference used
    ``count() > 0`` which forces a full extra job per micro-batch
    (SURVEY.md §4 note)."""

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        writer = batch_df.write.format("jdbc").option("url", url).option("dbtable", table)
        for k, v in (options or {}).items():
            writer = writer.option(k, v)
        writer.mode("append").save()

    return _write


#: connector option keys the reference's writer builds
#: (ingest_transform.py:282-289); config must provide every one + "table"
_SNOWFLAKE_CONFIG_KEYS = (
    "account",
    "user",
    "password",
    "database",
    "schema",
    "warehouse",
    "role",
    "table",
)


def snowflake_sink_options(config: dict) -> dict:
    """Option map for the PUBLIC Snowflake Spark connector
    (spark-snowflake, format name "snowflake") exactly as the reference
    constructs it (ingest_transform.py:282-289)."""
    return {
        "sfUrl": f"{config['account']}.snowflakecomputing.com",
        "sfUser": config["user"],
        "sfPassword": config["password"],
        "sfDatabase": config["database"],
        "sfSchema": config["schema"],
        "sfWarehouse": config["warehouse"],
        "sfRole": config["role"],
    }


def foreach_batch_snowflake_sink(config: dict, save=None):
    """S5 proper: the reference's Snowflake foreachBatch writer
    (ingest_transform.py:273-305) on the public connector. Validates the
    config up front the way the reference gates sink selection
    (`all(config values)`, :366) so a half-configured sink fails at
    pipeline build, not mid-stream. Empty batches are skipped with
    ``isEmpty()`` (cheaper than the reference's count()>0, §4 note).

    ``save`` injects the terminal write for tests (the connector jar is
    absent in this container); when None, the real
    ``format("snowflake")`` write runs and raises Spark's clear
    ClassNotFound error if the jar is missing — same failure contract as
    the Kafka/Avro readers."""
    missing = [k for k in _SNOWFLAKE_CONFIG_KEYS if not (config or {}).get(k)]
    if missing:
        raise ValueError(f"incomplete snowflake config, missing: {missing}")
    opts = snowflake_sink_options(config)
    table = config["table"]

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if save is not None:
            save(batch_df, dict(opts), table)
            return
        (
            batch_df.write.format("snowflake")
            .options(**opts)
            .option("dbtable", table)
            .mode("append")
            .save()
        )

    return _write


def write_quarantine(
    quarantined: DataFrame, base_path: str, metadata: dict, timestamp: str | None = None
) -> str:
    """Write quarantined rows + metadata JSON to a timestamped dir (reference
    D8, agent/tools.py:136-177 — the reference only wrote the metadata; the
    record movement it deferred happens here)."""
    import json

    ts = timestamp or time.strftime("%Y%m%d_%H%M%S")
    qdir = Path(base_path) / f"quarantine_{ts}"
    quarantined.write.mode("overwrite").parquet(str(qdir / "records"))
    qdir.mkdir(parents=True, exist_ok=True)
    (qdir / "metadata.json").write_text(json.dumps(metadata, indent=2))
    return str(qdir)


def cleanup_old_data(base_path: str, retention_days: int = 7) -> list[str]:
    """Retention sweep (reference S10/C6, pipeline_dag.py:392-423): remove
    top-level entries older than the retention window. For partitioned
    tables prefer dropping date partitions."""
    cutoff = time.time() - retention_days * 86400
    removed: list[str] = []
    base = Path(base_path)
    if not base.exists():
        return removed
    for entry in base.iterdir():
        if entry.stat().st_ctime < cutoff:
            shutil.rmtree(entry) if entry.is_dir() else entry.unlink()
            removed.append(str(entry))
    return removed


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-file compaction: rewrite ``src``'s parquet into ``dst`` with
    file sizes near ``target_file_bytes``. The streaming sink's
    per-trigger micro-files are the classic 100 TB operational hazard
    (every file is a task + a NameNode/listing entry); compaction restores
    scan efficiency. File count comes from the on-disk byte size, the
    rewrite is a shuffle-free ``coalesce``, and stats are returned so an
    orchestrator can log/assert them. ``dst`` must not exist."""
    src_p, dst_p = Path(src), Path(dst)
    if dst_p.exists():
        raise FileExistsError(f"compaction target already exists: {dst}")
    files = [p for p in src_p.rglob("*.parquet") if p.is_file()]
    total_bytes = sum(p.stat().st_size for p in files)
    n_out = max(1, -(-total_bytes // target_file_bytes))  # ceil division
    df = spark.read.parquet(src)
    df.coalesce(int(n_out)).write.parquet(str(dst_p))
    out_files = [p for p in dst_p.rglob("*.parquet") if p.is_file()]
    return {
        "files_before": len(files),
        "files_after": len(out_files),
        "bytes": total_bytes,
    }


def write_versioned_snapshot(df: DataFrame, base_path: str) -> int:
    """Append-only versioned snapshot (mini-lakehouse commit protocol):
    data lands under ``base_path/v=N/`` FIRST, and only then is the
    single-file manifest ``_latest`` swapped to N — readers following the
    manifest never observe a half-written version, giving atomic
    publish on any filesystem with atomic rename. Returns N."""
    import os
    import tempfile

    base = Path(base_path)
    base.mkdir(parents=True, exist_ok=True)
    current = read_latest_version(base_path)
    version = current + 1
    df.write.parquet(str(base / f"v={version}"))
    fd, tmp = tempfile.mkstemp(dir=base, prefix="._latest")
    with os.fdopen(fd, "w") as f:
        f.write(str(version))
    os.replace(tmp, base / "_latest")
    return version


def read_latest_version(base_path: str) -> int:
    """Version in the ``_latest`` manifest, or 0 if never written."""
    manifest = Path(base_path) / "_latest"
    if not manifest.exists():
        return 0
    return int(manifest.read_text().strip())


def read_latest_snapshot(spark, base_path: str) -> DataFrame:
    """The DataFrame for the manifest's current version."""
    version = read_latest_version(base_path)
    if version == 0:
        raise FileNotFoundError(f"no snapshot published under {base_path}")
    return spark.read.parquet(str(Path(base_path) / f"v={version}"))


# ---------------------------------------------------------------------------
# Kafka produce path (the write twin of readers.parse_avro_value /
# decode_avro_values — reference kafka/produce_events.py publishes these
# wire bytes; the engine can now emit them too)
# ---------------------------------------------------------------------------


def serialize_avro_value(df: DataFrame, avro_schema_json: str) -> DataFrame:
    """JVM to_avro encode of a struct column ``value`` into Avro binary —
    the spark-avro produce path, mirroring ``readers.parse_avro_value``.
    Requires the spark-avro package (absent in this container → clear
    ImportError at call time); ``encode_avro_values`` below is the
    vendored no-jar twin."""
    from pyspark.sql import functions as F

    try:
        from pyspark.sql.avro.functions import to_avro
    except ImportError as exc:  # pragma: no cover
        raise ImportError("pyspark avro functions unavailable") from exc
    return df.withColumn("value", to_avro(F.col("value"), avro_schema_json))


def encode_avro_values(
    df: DataFrame, avro_schema_json: str, value_cols: list[str] | None = None
) -> DataFrame:
    """No-jar Avro ENCODE: pack ``value_cols`` (default: every column
    except ``key``) of each row into Avro binary per the writer schema,
    via the vendored codec (sources.avro_codec.encode), Arrow-batched
    through ``mapInPandas``. Output is Kafka-producer-shaped —
    ``key: binary, value: binary`` — ready for a ``kafka`` sink's
    required columns, and round-trips bit-exactly through
    ``readers.decode_avro_values`` (tested). Unions/enums/nesting follow
    the codec's full surface, so the reference's v1/v2/v3 producer
    payloads (produce_events.py:149-164) are all emittable."""
    import pandas as pd
    from pyspark.sql import types as T

    from autonomous_orchestrator_ai_spark.sources.avro_codec import (
        default_value,
        encode,
        parse_schema,
    )

    schema = parse_schema(avro_schema_json)
    if schema.get("type") != "record":
        raise ValueError("top-level avro schema must be a record")
    cols = value_cols or [c for c in df.columns if c != "key"]
    # columns absent from the frame take the schema's declared defaults —
    # a v1-shaped frame emits valid v3 wire bytes, the producer-evolution
    # direction; fields with no default must be present
    field_names, defaults, missing = [], {}, []
    for f in schema["fields"]:
        if f["name"] in cols:
            field_names.append(f["name"])
        elif "default" in f:
            defaults[f["name"]] = default_value(f["type"], f["default"])
        else:
            missing.append(f["name"])
    if missing:
        raise ValueError(f"dataframe lacks schema fields {missing}")
    has_key = "key" in df.columns
    out_schema = T.StructType(
        [
            T.StructField("key", T.BinaryType()),
            T.StructField("value", T.BinaryType()),
        ]
    )

    def batches(it):
        for pdf in it:
            keys = (
                [None if k is None else bytes(k) for k in pdf["key"]]
                if has_key
                else [None] * len(pdf)
            )
            values = [
                encode(
                    schema,
                    {f: _py(pdf[f].iloc[i]) for f in field_names} | defaults,
                )
                for i in range(len(pdf))
            ]
            yield pd.DataFrame({"key": keys, "value": values})

    return df.mapInPandas(batches, schema=out_schema)


def _py(v):
    """numpy/pandas scalar -> plain Python for the avro codec (None for
    the missing-value sentinels pandas substitutes in object columns)."""
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return None
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float) and v != v:  # NaN marks a missing value here
        return None
    return v


def kafka_sink_options(
    brokers: str, topic: str, extra: dict | None = None
) -> dict:
    """Option surface for a Kafka writeStream/batch-write sink (public
    spark-sql-kafka connector; reference docker-compose.yml:30-70 broker).
    The jar is absent in this container, so like ``readers.kafka_stream``
    this exposes the exact production options without executing: use
    ``df.write.format("kafka").options(**kafka_sink_options(...))`` on a
    cluster with the package."""
    opts = {"kafka.bootstrap.servers": brokers, "topic": topic}
    if extra:
        opts.update(extra)
    return opts
