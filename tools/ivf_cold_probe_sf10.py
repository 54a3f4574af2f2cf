"""Measure the IVF index's cold-probe cost at sf10 — the r7 mirror of the
round-6 LSH bucket-manifest measurement (PERF.md "LSH index bucket
manifest").

Scenario: a LONG-LIVED serving index. At build time IVF has only n_lists
directories (a model constant — cheap to list), but every streaming append
adds a __batch level under each touched list, so after B batches the tree
holds up to n_lists x (B+1) directories and full discovery grows with
index AGE, not corpus size. This script builds the index over the sf10
embeddings (200k vectors, n_lists=64), appends 100 batches (~12.9k total
partition dirs — comparable to the 8.2k-dir LSH measurement), then times,
each in a FRESH subprocess (true cold: no FS caches inside the JVM, no
codegen):

  1. cold probe via the bucket manifest (query_ivf_index, no index_df)
  2. cold probe via load_ivf_index handle (full discovery, then probe)

and a second probe in each process for the steady-state number.

Usage: python tools/ivf_cold_probe_sf10.py [build|probe_manifest|probe_handle]
Run with no argument to orchestrate all three and print a JSON summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("IVF_PROBE_SF_DIR", ".scale/sf10")
INDEX = os.environ.get("IVF_PROBE_INDEX", ".scale/ivf_index_sf10")
# n_lists defaults to the sqrt(N) serving rule (~450 for 200k vectors,
# rounded to 512); overridable to measure the narrow-index regime too
N_LISTS = int(os.environ.get("IVF_PROBE_N_LISTS", "512"))
N_BATCHES = int(os.environ.get("IVF_PROBE_N_BATCHES", "100"))
BASE_ROWS = 100_000  # build on the first half; append the rest in batches


def _spark():
    from autonomous_orchestrator_ai_spark.session import get_spark

    return get_spark("ivf-cold-probe", cpus=32)


def _emb(spark):
    from autonomous_orchestrator_ai_spark.plans.registry import table

    return table(spark, SF_DIR, "embeddings")


def build() -> None:
    import shutil

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from autonomous_orchestrator_ai_spark.operators.ivf import kmeans_sample
    from autonomous_orchestrator_ai_spark.operators.ivf_index import (
        append_to_ivf_index,
        build_ivf_index,
    )

    if os.path.exists(INDEX):
        shutil.rmtree(INDEX)
    spark = _spark()
    emb = _emb(spark).withColumn(
        "__rank", F.row_number().over(Window.orderBy("vec_id"))
    )
    emb = emb.persist()
    emb.count()
    centroids = kmeans_sample(emb, k=N_LISTS, sample_size=4096)
    base = emb.filter(F.col("__rank") <= BASE_ROWS).drop("__rank")
    t0 = time.time()
    build_ivf_index(base, INDEX, centroids)
    build_sec = time.time() - t0
    rest = emb.filter(F.col("__rank") > BASE_ROWS)
    per = (200_000 - BASE_ROWS) // N_BATCHES
    t0 = time.time()
    for b in range(N_BATCHES):
        lo, hi = BASE_ROWS + b * per, BASE_ROWS + (b + 1) * per
        batch = rest.filter(
            (F.col("__rank") > lo) & (F.col("__rank") <= hi)
        ).drop("__rank")
        append_to_ivf_index(batch, INDEX, batch_id=b)
    append_sec = time.time() - t0
    n_dirs = sum(len(d) for _, d, _ in os.walk(INDEX))
    print(
        json.dumps(
            {
                "stage": "build",
                "build_sec": round(build_sec, 1),
                "append_sec_total": round(append_sec, 1),
                "n_batches": N_BATCHES,
                "n_partition_dirs": n_dirs,
            }
        )
    )


def probe(use_manifest: bool) -> None:
    from pyspark.sql import functions as F

    from autonomous_orchestrator_ai_spark.operators.ivf_index import (
        load_ivf_index,
        query_ivf_index,
    )

    spark = _spark()
    queries = _emb(spark).limit(8)
    timings = {}
    t0 = time.time()
    if use_manifest:
        out = query_ivf_index(spark, INDEX, queries, k=5, n_probe=2)
        n = out.count()
        timings["cold_first_probe_sec"] = round(time.time() - t0, 1)
    else:
        handle = load_ivf_index(spark, INDEX)
        handle.schema  # force the file listing now (discovery cost)
        timings["discovery_sec"] = round(time.time() - t0, 1)
        t0 = time.time()
        out = query_ivf_index(
            spark, INDEX, queries, k=5, n_probe=2, index_df=handle
        )
        n = out.count()
        timings["probe_after_discovery_sec"] = round(time.time() - t0, 1)
        timings["cold_first_probe_sec"] = round(
            timings["discovery_sec"] + timings["probe_after_discovery_sec"], 1
        )
    # steady state: second probe in the same process
    t0 = time.time()
    q2 = _emb(spark).filter(F.col("vec_id") % 97 == 0).limit(8)
    kwargs = {} if use_manifest else {"index_df": load_ivf_index(spark, INDEX)}
    n2 = query_ivf_index(spark, INDEX, q2, k=5, n_probe=2, **kwargs).count()
    timings["steady_probe_sec"] = round(time.time() - t0, 1)
    print(
        json.dumps(
            {
                "stage": "probe_manifest" if use_manifest else "probe_handle",
                **timings,
                "rows": n + n2,
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1:
        stage = sys.argv[1]
        if stage == "build":
            build()
        elif stage == "probe_manifest":
            probe(use_manifest=True)
        elif stage == "probe_handle":
            probe(use_manifest=False)
        else:
            raise SystemExit(f"unknown stage {stage}")
        return
    results = []
    for stage in ("build", "probe_manifest", "probe_handle"):
        out = subprocess.run(
            [sys.executable, __file__, stage],
            capture_output=True,
            text=True,
            check=True,
        )
        line = out.stdout.strip().splitlines()[-1]
        results.append(json.loads(line))
        print(line, flush=True)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
