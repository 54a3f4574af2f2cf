"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry at a scale factor, runs the matching
``oracle_sql()`` in DuckDB over the same parquet views, and compares
row-count + column names + order-insensitive values (exact string match
after canonical formatting — stricter than a hash, so passing here implies
hash-match).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")


def canonical(value) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # repr keeps full double precision; rounding upstream handles noise
        return repr(value)
    return str(value)


def frame_to_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canonical(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from autonomous_orchestrator_ai_spark.session import get_spark

    spark = get_spark("oracle-check")
    qs = entrymod.queries()
    # resolve oracles against the sf dir being CHECKED (callable oracles
    # adapt deterministic parameters — e.g. auto-sized LSH planes — to the
    # corpus, exactly as the Spark side does); entrymod.oracle_sql() would
    # pin them to the driver's sf0.01
    from autonomous_orchestrator_ai_spark.plans import registry as _reg

    oracles = {
        name: _reg.resolve_oracle(name, sf_dir) for name in _reg.ORACLES
    }

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(spark_rows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            duck_cols = [d[0] for d in cur.description]
            duck_rows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        sc, sr = frame_to_rows(spark_cols, spark_rows)
        dc, dr = frame_to_rows(duck_cols, duck_rows)
        status = []
        if sc != dc:
            status.append(f"cols spark={sc} duck={dc}")
        if len(sr) != len(dr):
            status.append(f"rowcount spark={len(sr)} duck={len(dr)}")
        elif sc == dc and sr != dr:
            n_bad = sum(1 for a, b in zip(sr, dr) if a != b)
            first_bad = next((i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b)
            status.append(f"values {n_bad}/{len(sr)} differ; first: {first_bad}")
        if status:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(status)}")
        else:
            print(f"OK    {name}: {len(sr)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
