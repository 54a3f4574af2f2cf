"""Oracle determinism soak (VERDICT r4 item 9): run the FULL registered
query sweep twice back-to-back in ONE Spark session — storage released
between passes, caches warm on pass 2 — and diff the canonicalized
results. A zero-diff run proves no query's output depends on execution
order, leftover cached state, or localCheckpoint residue (the r4
``release_session_storage`` lesson). Pass 1 additionally compares every
query against its DuckDB oracle, so one run of this tool produces both
the round's full-sweep artifact and the soak evidence.

Usage: python tools/soak_oracle.py [sf_dir] [--out ORACLE_SOAK_r5.md]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, ".")

from tools.check_oracle import canonical, frame_to_rows  # noqa: E402


def run_spark_pass(spark, qs, sf_dir, release):
    """One full Spark pass -> {name: (cols, canonical_rows) | ('ERR', msg)}."""
    out = {}
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            cols, rows = frame_to_rows(
                sdf.columns, [tuple(r) for r in sdf.collect()]
            )
            out[name] = (cols, rows)
        except Exception as e:  # noqa: BLE001 — recorded, not swallowed
            out[name] = ("ERR", f"{type(e).__name__}: {e}")
        release(spark)
    return out


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    parser.add_argument("--out", default="ORACLE_SOAK_r5.md")
    ns = parser.parse_args()

    import __spark_entry__ as entrymod
    from autonomous_orchestrator_ai_spark.session import (
        get_spark,
        release_session_storage,
    )

    spark = get_spark("oracle-soak")
    qs = entrymod.queries()
    # resolve callable oracles against the sf dir being soaked (see
    # registry.resolve_oracle); oracle_sql() would pin them to sf0.01
    from autonomous_orchestrator_ai_spark.plans import registry as _reg

    oracles = {
        name: _reg.resolve_oracle(name, ns.sf_dir) for name in _reg.ORACLES
    }

    t0 = time.time()
    pass1 = run_spark_pass(spark, qs, ns.sf_dir, release_session_storage)
    t1 = time.time()
    pass2 = run_spark_pass(spark, qs, ns.sf_dir, release_session_storage)
    t2 = time.time()

    # intra-session determinism diff
    diffs = []
    for name in qs:
        if pass1[name] != pass2[name]:
            diffs.append(name)

    # pass-1 oracle comparison (the full-sweep gate)
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{ns.sf_dir}/{t}.parquet'"
        )
    oracle_fail, rows_only, ok = [], [], []
    for name in qs:
        if pass1[name][0] == "ERR":
            oracle_fail.append((name, pass1[name][1]))
            continue
        if name not in oracles:
            rows_only.append(name)
            continue
        cur = con.execute(oracles[name])
        dcols = [d[0] for d in cur.description]
        dck = frame_to_rows(dcols, cur.fetchall())
        if dck == pass1[name]:
            ok.append(name)
        else:
            oracle_fail.append((name, "oracle mismatch"))

    lines = [
        "# Oracle determinism soak + full sweep (round 5)",
        "",
        f"- sf_dir: `{ns.sf_dir}`; {len(qs)} registered queries",
        f"- pass 1 (cold, storage released after each query): {t1-t0:.1f}s",
        f"- pass 2 (same session, warm JVM): {t2-t1:.1f}s",
        f"- **intra-session diff: {len(diffs)} queries differ"
        + (f" — {diffs}" if diffs else " (zero)**"),
        f"- oracle-exact: {len(ok)}; rows-only (no SQL oracle): "
        f"{len(rows_only)} {sorted(rows_only)}; failures: {len(oracle_fail)}",
    ]
    for name, msg in oracle_fail:
        lines.append(f"  - FAIL {name}: {msg}")
    lines.append("")
    Path(ns.out).write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
    spark.stop()
    return 1 if (diffs or oracle_fail) else 0


if __name__ == "__main__":
    sys.exit(main())
