"""Whole-registry physical-plan audit.

Builds every registered query's physical plan at sf0.01 and tabulates the
scale-relevant plan features: shuffle (Exchange) count, broadcast joins,
whole-stage-codegen spans, Python-eval nodes, and the scale smells —
CartesianProduct, BroadcastNestedLoopJoin, row-at-a-time BatchEvalPython,
and Exchange SinglePartition (a global serial point).

Writes PLAN_AUDIT.md and exits 1 if a smell appears outside the explicit
whitelist (the documented exact/small-data baselines), so CI catches a
plan regression — e.g. a lost broadcast hint or a filter that stopped
pushing down — before it becomes a 100x-scale incident.

Usage: python tools/plan_audit.py [sf_dir] [--write]
"""

from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, ".")

#: queries allowed a GLOBAL serial sort/window (Exchange SinglePartition
#: directly feeding a Sort or Window): the documented exact small-data
#: anchors whose registered scale twins avoid it, plus final top-k
#: presentations of already-aggregated tiny frames.
GLOBAL_SORT_OK = {
    "value_equidepth_histogram",  # global NTILE anchor (…_approx is the scale form)
    "value_equidepth_histogram_approx",  # sorts only the 20 approx cut points
    "winnowing_near_dup_pairs",  # exact containment anchor (…_lsh is the scale form)
    "revenue_mom_growth",  # unpartitioned LAG over <=84 month rows (post-agg)
    "join_key_skew_profile",  # ranks 10 post-limit rows (documented benign)
    "event_volume_anomalies",  # trailing window over per-DAY aggregate rows
    "hourly_gapfill_locf",  # grid is bounded by the time range, not the data
    "tfidf_top_terms",  # global IDF ranking of the bounded vocab slice
    "rolling_7d_active_users",  # day-grid sequence (bounded by time range)
    "random_projection_sketch",  # orders the 20-row pinned output slice
    "unigram_logprob_by_source",  # bounded vocabulary aggregate
    "orders_column_profile",  # stack-unpivot of a single profile row
    "near_dup_survivors",  # single summary row
    "cosine_topk_bruteforce",  # pinned query-batch output ordering
    "embedding_near_dup_pairs",  # pinned-slice exact baseline
    "lsh_ann_topk",  # serving-batch (bounded) output ordering
    "ivf_ann_topk",
    "pq_ann_topk",
    "doc_winnowing_sketches",  # pinned 100-doc output slice
    "doc_fingerprints",
    "binary_payload_profile",
    "part_type_string_profile",
    "ddsketch_merge_identity",  # cumulative walk over ONE global sketch: <=~2.1k bucket rows at any corpus size (operators/ddsketch.py memory bound)
    "rfm_customer_segments",  # global NTILE anchor over the per-CUSTOMER aggregate (dimension-bounded); scale form assigns against broadcast approx-percentile cut points
    "hybrid_rrf_topk",  # in-leg row_number ranks a <=100-row post-limit frame (legs cut by TakeOrderedAndProject)
}


def _global_serial_sorts(plan: str) -> int:
    """Count Exchange SinglePartition nodes whose nearest shallower-indented
    ancestor within a few lines is a Sort or Window — the global serial
    sort/window pattern. A SinglePartition exchange under a final
    HashAggregate (merging partials into one scalar row) is NOT counted:
    that carries O(n_partitions) rows and is how every global aggregate
    ends."""
    lines = plan.splitlines()
    hits = 0
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        indent = len(line) - len(line.lstrip(" +-:*("))
        for j in range(i - 1, max(i - 6, -1), -1):
            up = lines[j]
            up_indent = len(up) - len(up.lstrip(" +-:*("))
            if up_indent >= indent:
                continue
            if re.search(r"\b(Sort|Window|WindowGroupLimit)\b", up):
                hits += 1
            break
    return hits


def _distinct_nodes(plan: str, pattern: str) -> int:
    """Count DISTINCT physical nodes matching ``pattern`` (one node per
    plan line; expression ids / plan_ids make real nodes textually
    unique).

    Why distinct and not raw matches: ``executedPlan().toString()``
    prints a persisted frame's ENTIRE build plan under every
    InMemoryRelation scan site — and once a cache is materialized
    (queries with an eager pre-flight materialize theirs at construction
    time), each site recursively prints the finalized AQE stage trees of
    every nested cache. The buffers are built ONCE however many sites
    scan them, so raw regex counts multiply per scan site (observed: the
    winnowing guarded twin jumped 7 -> 1724 "exchanges" purely from this
    print artifact — 477 repeated InMemoryRelation sections in a 16k-line
    string). Repeated prints of the same node are identical once the
    tree-drawing prefix (varying ':' columns, '+-', codegen '*(n)' tags)
    is stripped — plan_ids and expression ids keep genuinely distinct
    nodes distinct — so canonical-line identity == node identity; the
    AQE-sectioned indentation resets make subtree truncation unreliable,
    line identity is not."""
    nodes = set()
    for line in plan.splitlines():
        if not re.search(pattern, line):
            continue
        canon = re.sub(r"^[\s:+*-]*", "", line)
        canon = re.sub(r"^\(\d+\)\s*", "", canon).strip()
        nodes.add(canon)
    return len(nodes)


def audit(sf_dir: str, spark=None) -> tuple[list[dict], list[str]]:
    from autonomous_orchestrator_ai_spark.plans import registry
    from autonomous_orchestrator_ai_spark.session import get_spark

    registry.load_all()
    # getOrCreate may return a caller-owned session; only stop what we create
    own = spark is None
    if own:
        spark = get_spark("plan-audit", cpus=8)
    rows: list[dict] = []
    violations: list[str] = []
    for name in sorted(registry.QUERIES):
        t0 = time.time()
        df = registry.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_exchange = _distinct_nodes(plan, r"\bExchange\b")
        n_single = _distinct_nodes(plan, r"Exchange SinglePartition")
        n_bhj = _distinct_nodes(plan, r"BroadcastHashJoin")
        n_smj = _distinct_nodes(plan, r"SortMergeJoin")
        n_bnlj = _distinct_nodes(plan, r"BroadcastNestedLoopJoin")
        n_cart = _distinct_nodes(plan, r"CartesianProduct")
        n_wscg = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))
        n_arrow = _distinct_nodes(
            plan, r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"
        )
        n_rowpy = _distinct_nodes(plan, r"BatchEvalPython")
        rows.append(
            dict(
                name=name,
                exchanges=n_exchange,
                single_part=n_single,
                bhj=n_bhj,
                smj=n_smj,
                bnlj=n_bnlj,
                cartesian=n_cart,
                wscg=n_wscg,
                arrow_py=n_arrow,
                row_py=n_rowpy,
                secs=round(time.time() - t0, 1),
            )
        )
        n_gserial = _global_serial_sorts(plan)
        rows[-1]["global_serial"] = n_gserial
        if n_cart:
            violations.append(f"{name}: CartesianProduct in plan")
        if n_rowpy:
            violations.append(f"{name}: row-at-a-time BatchEvalPython in plan")
        if n_gserial and name not in GLOBAL_SORT_OK:
            violations.append(
                f"{name}: global Sort/Window over Exchange SinglePartition "
                "(not whitelisted)"
            )
    if own:
        spark.stop()
    return rows, violations


def render(rows: list[dict], violations: list[str], sf_dir: str) -> str:
    out = [
        "# PLAN_AUDIT — physical-plan features for every registered query",
        "",
        f"Generated by `tools/plan_audit.py {sf_dir}`. Columns: shuffle",
        "(Exchange) count, Exchange SinglePartition count (merging partials",
        "of a global aggregate — benign), global_serial = SinglePartition",
        "exchanges feeding a Sort/Window (a true serial point), broadcast-",
        "hash / sort-merge / broadcast-nested-loop join counts (bnlj is",
        "informational: every occurrence here is a one-row build side —",
        "global bounds/thresholds — or a documented pinned-slice baseline),",
        "CartesianProduct count, distinct WholeStageCodegen spans,",
        "Arrow-batched Python nodes, row-at-a-time Python nodes. Hard",
        "failures: any cartesian, any row_py, and non-whitelisted",
        "global_serial; the whitelist with per-query justification lives at",
        "the top of the tool.",
        "",
        "| query | exchanges | single_part | global_serial | bhj | smj | bnlj | cartesian | wscg | arrow_py | row_py |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        out.append(
            f"| {r['name']} | {r['exchanges']} | {r['single_part']} "
            f"| {r['global_serial']} | {r['bhj']} "
            f"| {r['smj']} | {r['bnlj']} | {r['cartesian']} | {r['wscg']} "
            f"| {r['arrow_py']} | {r['row_py']} |"
        )
    out += ["", f"Violations: {len(violations)}"]
    out += [f"- {v}" for v in violations]
    out.append("")
    return "\n".join(out)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--write"]
    write = "--write" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    rows, violations = audit(sf_dir)
    text = render(rows, violations, sf_dir)
    if write:
        with open("PLAN_AUDIT.md", "w") as f:
            f.write(text)
        print(f"wrote PLAN_AUDIT.md ({len(rows)} queries)")
    else:
        print(text)
    for v in violations:
        print(f"VIOLATION: {v}", file=sys.stderr)
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
