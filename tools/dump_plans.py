"""Dump ``explain("formatted")`` for registered queries to files.

Usage:
  python tools/dump_plans.py OUTDIR SUFFIX QUERY [QUERY ...] [--sf DIR]

Writes ``OUTDIR/<query><SUFFIX>.txt`` for each query. Plan capture only —
no timed action — so it is safe to run alongside other work (iterative
queries still execute their construction-time checkpoint jobs).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("suffix")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    from autonomous_orchestrator_ai_spark.session import get_spark
    from autonomous_orchestrator_ai_spark.plans import registry

    spark = get_spark()
    registry.load_all()
    for name in args.queries:
        if name not in registry.QUERIES:
            print(f"SKIP {name}: not registered", flush=True)
            continue
        df = registry.QUERIES[name](spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.outdir, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"WROTE {path} ({len(plan)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
