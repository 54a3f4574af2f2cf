#!/bin/sh
# End-of-round evidence refresh (r8, VERDICT r7 items 3-4): regenerate the
# committed artifacts the next round reads, all from the CURRENT tree, so
# the audit trail can never lag the registry again.
#
#   sh tools/refresh_evidence.sh r8
#
# runs, in order:
#   1. tools/plan_audit.py  --write  -> PLAN_AUDIT.md (all registered
#      queries; exits non-zero on any cartesian / row-Python /
#      non-whitelisted global-serial plan)
#   2. tools/check_oracle.py at sf0.1 -> ORACLE_sf0.1_<round>.md (full
#      registry, Spark vs DuckDB exact value compare)
#   3. bench.py at sf0.1 -> BENCH_sf0.1_<round>.json (headline timings)
#   4. tools/lsh_preflight_probe.py at sf0.1 -> LSH_PREFLIGHT_<round>.json
#      (r9, VERDICT r8 item 10: the guard-route calibration regenerates
#      every round instead of living as a one-off tool run, with a drift
#      check — the sf0.1 minhash/winnow candidate profiles must stay
#      within 2x of the r8-recorded anchors, else the priced constants
#      (20 B / 10 KB per candidate) need re-deriving before the routes
#      can be trusted)
#
# Run it AFTER the round's last engine change and commit the four
# artifacts together.
set -e
ROUND="${1:?usage: sh tools/refresh_evidence.sh <round-tag, e.g. r8>}"
cd "$(dirname "$0")/.."

python tools/plan_audit.py /root/testdata/sf0.01 --write

python tools/check_oracle.py /root/testdata/sf0.1 2>/dev/null \
  | tee "/tmp/oracle_sweep_${ROUND}.log"
python - "$ROUND" <<'EOF'
import re, sys
round_tag = sys.argv[1]
log = open(f"/tmp/oracle_sweep_{round_tag}.log").read()
oks = re.findall(r"^OK\s+(\S+?): (\d+) rows \(([\d.]+)s\)", log, re.M)
ros = re.findall(r"^rows-only\s+(\S+?): (\d+) rows \(([\d.]+)s\)", log, re.M)
fails = re.findall(r"^FAIL\s+(\S+)", log, re.M)
total = sum(float(s) for _, _, s in oks + ros)
slow = sorted(oks + ros, key=lambda t: -float(t[2]))[:10]
with open(f"ORACLE_sf0.1_{round_tag}.md", "w") as f:
    f.write(f"# ORACLE sweep at sf0.1 — round {round_tag.lstrip('r')}\n\n")
    f.write("Full registry, Spark vs DuckDB, exact value compare\n"
            "(`python tools/check_oracle.py /root/testdata/sf0.1` via\n"
            "`tools/refresh_evidence.sh`):\n\n")
    f.write(f"- **{len(oks)} oracle-exact**, **{len(ros)} rows-only** "
            f"({', '.join(n for n, _, _ in ros)}), **{len(fails)} failures** "
            f"out of {len(oks) + len(ros) + len(fails)} registered queries.\n")
    f.write(f"- Total Spark-side wall time {total:.1f} s (sequential, shared "
            "local[32] session, DuckDB oracle runs interleaved).\n")
    f.write("- Slowest ten (sec):\n\n")
    for n, r, s in slow:
        f.write(f"  - {n}: {s} ({r} rows)\n")
print(f"wrote ORACLE_sf0.1_{round_tag}.md:",
      len(oks), "exact,", len(ros), "rows-only,", len(fails), "failures")
assert not fails, fails
EOF

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py 2>/dev/null \
  | tail -1 > "BENCH_sf0.1_${ROUND}.json"
echo "wrote BENCH_sf0.1_${ROUND}.json"

python tools/lsh_preflight_probe.py /root/testdata/sf0.1 2>/dev/null \
  | tail -1 > "LSH_PREFLIGHT_${ROUND}.json"
python - "$ROUND" <<'EOF'
import json, sys
round_tag = sys.argv[1]
cur = json.load(open(f"LSH_PREFLIGHT_{round_tag}.json"))
# sf0.1 anchors measured on the r9 tree (minhash 1,420 / winnow 43,874
# candidate rows at 5,000 docs; consistent with LSH_PREFLIGHT_r8's sf10
# profiles — the fixture's hot-bucket mass concentrates as replicas are
# added, so small-scale profiles sit below exact /100 of sf10). If the
# profile drifts past 2x the anchor, the banding or the priced constants
# changed and the route crossovers must be re-derived.
ANCHORS = {"minhash": 1420, "winnow": 43874}
for fam, anchor in ANCHORS.items():
    got = cur.get(fam, {}).get("est_candidate_rows")
    assert got is not None, f"{fam}: probe emitted no profile"
    ratio = got / anchor
    assert 0.5 <= ratio <= 2.0, (
        f"{fam}: sf0.1 candidate profile drifted {ratio:.2f}x from the "
        f"r8 anchor ({got} vs ~{anchor:.0f}) — re-derive the guard-route "
        "constants before trusting the cost routes"
    )
    print(f"{fam}: est_candidate_rows={got} ({ratio:.2f}x of anchor) OK")
print(f"wrote LSH_PREFLIGHT_{round_tag}.json")
EOF
