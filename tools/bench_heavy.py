"""Spot-benchmark the heaviest registered queries at a promoted scale
factor (VERDICT r3 item 2: push the scale evidence one octave past sf1).

Usage: python tools/bench_heavy.py SF_DIR [query ...] [--passes N]

Prints one JSON line {"sf_dir": ..., "queries": {name: sec}, ...} — the
growth-exponent companion to bench.py (which owns the headline set).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

DEFAULT_HEAVY = [
    "part_copurchase_pagerank",
    "winnowing_near_dup_pairs_lsh",
    "ngram_jaccard_pairs_guarded",
    "minhash_lsh_near_dups",
    "split_leakage_report",
]


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser(
        description="Spot-benchmark heavy registered queries at a scale dir"
    )
    parser.add_argument("sf_dir", help="parquet scale directory, e.g. .scale/sf10")
    parser.add_argument(
        "queries", nargs="*", help=f"query names (default: {DEFAULT_HEAVY})"
    )
    parser.add_argument(
        "--passes", type=int, default=2, help="timing passes per query"
    )
    parser.add_argument(
        "--partitions", type=int, default=128,
        help="shuffle partitions (scale with input: 128 at sf10, 512 at sf100)",
    )
    ns = parser.parse_args()
    passes = ns.passes
    sf_dir = ns.sf_dir
    names = ns.queries or DEFAULT_HEAVY

    import os

    from autonomous_orchestrator_ai_spark.plans import registry
    from autonomous_orchestrator_ai_spark.session import (
        get_spark,
        release_session_storage,
    )

    # scale-appropriate sizing (the point of this harness): at sf10 the
    # default cpus-many shuffle partitions put ~8M-edge aggregation maps in
    # every one of 32 concurrent tasks — execution memory exhausts before
    # the spill path can even allocate its sorter (observed
    # AGGREGATE_OUT_OF_MEMORY at 16g). 4x-cpus partitions bounds per-task
    # state; the heap env default rises to a third of this host.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark("bench-heavy", cpus=32, shuffle_partitions=ns.partitions)
    registry.load_all()
    try:  # codegen warmup; partial scale dirs may lack TPC-H tables
        registry.QUERIES["tpch_q6_forecast_revenue"](spark, sf_dir).collect()
    except Exception:
        spark.range(1_000_000).selectExpr("sum(id * 2 + 1)").collect()

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in names:
        fn = registry.QUERIES[name]
        samples = []
        for _ in range(passes):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
            release_session_storage(spark)
        timings[name] = round(min(samples), 3)
        rows[name] = n
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)
    print(
        json.dumps(
            {"sf_dir": sf_dir, "queries": timings, "rows": rows,
             "passes": passes}
        )
    )


if __name__ == "__main__":
    main()
