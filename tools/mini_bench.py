"""Subset bench: time a list of registered queries with EXACTLY the
headline bench's methodology (same session factory, same warm-up, same
min-of-N-passes with release_session_storage between passes), without
paying for the full 113-query run while iterating on one operator.

Usage: python tools/mini_bench.py QUERY [QUERY ...] [--passes N] [--sf DIR]
Prints one JSON line {"queries": {...}, "stddev": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf", default=None)
    args = ap.parse_args()
    sf_dir = args.sf or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    from autonomous_orchestrator_ai_spark.session import (
        get_spark,
        release_session_storage,
    )
    from autonomous_orchestrator_ai_spark.plans import registry

    spark = get_spark("mini-bench")
    registry.load_all()
    registry.QUERIES["tpch_q6_forecast_revenue"](spark, sf_dir).collect()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(cpus).repartition(cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    timings, stddevs = {}, {}
    for name in args.queries:
        fn = registry.QUERIES[name]
        samples = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
            release_session_storage(spark)
        timings[name] = round(min(samples), 3)
        mean = sum(samples) / len(samples)
        stddevs[name] = round(
            (sum((s - mean) ** 2 for s in samples) / max(1, len(samples) - 1))
            ** 0.5,
            3,
        )
    print(json.dumps({"queries": timings, "stddev": stddevs, "sf": sf_dir}))


if __name__ == "__main__":
    main()
