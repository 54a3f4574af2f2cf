"""Regenerate COVERAGE.md's 'Appendix: registered query inventory' table
from the live registry (query name, oracle kind, first docstring line).

Usage: python tools/gen_coverage_appendix.py   # rewrites COVERAGE.md in place
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HEADER = "## Appendix: registered query inventory"


def build_table() -> str:
    from autonomous_orchestrator_ai_spark.plans import registry

    registry.load_all()
    lines = [HEADER, "", "| # | query | oracle | summary |", "|---|---|---|---|"]
    for i, name in enumerate(sorted(registry.QUERIES), start=1):
        doc = (registry.QUERIES[name].__doc__ or "").strip().splitlines()
        summary = doc[0].strip() if doc else ""
        if len(summary) > 72:
            summary = summary[:72].rstrip()
        kind = "DuckDB" if name in registry.ORACLES else "rows-only"
        lines.append(f"| {i} | `{name}` | {kind} | {summary} |")
    return "\n".join(lines) + "\n"


def main() -> None:
    path = Path(__file__).resolve().parent.parent / "COVERAGE.md"
    text = path.read_text()
    if HEADER not in text:
        raise SystemExit(f"{HEADER!r} not found in COVERAGE.md")
    head = text.split(HEADER)[0]
    path.write_text(head + build_table())
    n = len(re.findall(r"^\| \d+ \|", build_table(), re.M))
    print(f"rewrote appendix with {n} queries")


if __name__ == "__main__":
    main()
