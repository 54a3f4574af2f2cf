"""Same-host A/B bench: run an older tree's bench.py and the current
tree's bench.py back to back (the r3 "second-session refresh"
methodology, made standing hygiene by VERDICT r5 item 4 / r6 item 9),
then emit a comparison artifact over the shared query set.

Usage:
    python tools/ab_bench.py OLD_TREE_DIR OUT_JSON [--label-old r5]

Both benches run with the same SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) in fresh subprocesses so neither inherits the
other's JVM, code cache, or OS page cache beyond what a real
back-to-back rerun would. The old tree runs FIRST (matching how
BENCH_AB_r4_vs_r6_sf0.1.json was produced) so any systematic
second-run page-cache advantage favors... the same side it favored
last time, keeping artifacts comparable round over round.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path


def run_bench(tree: Path, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env.setdefault("SPARK_GRAFT_BENCH_PASSES", "3")
    # a stale PYTHONPATH would let the old tree import the new package
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(
            f"bench.py in {tree} failed rc={out.returncode}:\n{out.stderr[-2000:]}"
        )
    # bench.py prints ONE JSON line (other lines are progress on stderr)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line in bench.py stdout from {tree}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("old_tree")
    p.add_argument("out_json")
    p.add_argument("--label-old", default="old")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ns = p.parse_args()

    old_tree = Path(ns.old_tree).resolve()
    cur_tree = Path(__file__).resolve().parent.parent

    print(f"# running OLD tree bench: {old_tree}", file=sys.stderr)
    old = run_bench(old_tree, ns.sf_dir)
    print(f"# old total: {old['value']}s / {len(old['queries'])} queries",
          file=sys.stderr)
    print(f"# running CURRENT tree bench: {cur_tree}", file=sys.stderr)
    cur = run_bench(cur_tree, ns.sf_dir)
    print(f"# current total: {cur['value']}s / {len(cur['queries'])} queries",
          file=sys.stderr)

    shared = sorted(set(old["queries"]) & set(cur["queries"]))
    old_total = round(sum(old["queries"][q] for q in shared), 2)
    cur_total = round(sum(cur["queries"][q] for q in shared), 2)
    slower = {
        q: {f"{ns.label_old}_tree": old["queries"][q], "current": cur["queries"][q]}
        for q in shared
        if cur["queries"][q] > 1.5 * old["queries"][q]
        and cur["queries"][q] - old["queries"][q] > 0.3
    }
    artifact = {
        "method": (
            "same-host back-to-back: git worktree of the "
            f"{ns.label_old} end-state tree runs bench.py first, current "
            f"tree second, both SPARK_GRAFT_SF_DIR={ns.sf_dir}, fresh "
            "subprocesses, same local[32] host"
        ),
        "shared_queries": len(shared),
        f"{ns.label_old}_tree_total_sec": old_total,
        "current_tree_total_sec": cur_total,
        f"ratio_current_over_{ns.label_old}": round(cur_total / old_total, 3),
        "queries_over_1p5x_slower_and_0p3s": slower,
        "old_query_count": len(old["queries"]),
        "current_query_count": len(cur["queries"]),
        "per_query": {
            q: {f"{ns.label_old}_tree": old["queries"][q],
                "current": cur["queries"][q]}
            for q in shared
        },
    }
    Path(ns.out_json).write_text(json.dumps(artifact, indent=1) + "\n")
    print(json.dumps({k: artifact[k] for k in list(artifact)[:6]}))


if __name__ == "__main__":
    main()
