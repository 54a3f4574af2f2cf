"""sf1000 documents fixture (50M docs): a 10x OUTER promotion of the
sf100 fixture — the recipe behind BENCH_sf1000_r7.json, now a committed
tool instead of an ad-hoc run (r9; the r7/r8 probes regenerated this by
hand and the script was lost with the scratch dir).

Outer replica r>0 applies a fresh injective letter permutation (seeded
8000+r — a DIFFERENT seed base than make_scale's inner 7000+r maps, so
outer-composed-with-inner maps stay pairwise distinct across all 10,000
effective replicas) and shifts doc_id by r*1e10 (above any inner id).
Replica 0 is the sf100 fixture verbatim. Within a replica every
text-equality structure (shingles, k-grams, winnowing sketches) is
preserved by the bijection, so near-dup pairs scale exactly 10x; across
replicas no letter-gram is shared, so no cross-replica pairs exist.

Documents ONLY — the fourth-octave probes (winnowing, minhash, edit,
classifier) read nothing else; lineitem at this scale would cost disk
for nothing.

Usage: python tools/make_sf1000_docs.py [src] [dst] [n_outer]
       python tools/make_sf1000_docs.py .scale/sf100 .scale/sf1000 10
"""
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, ".")
from tools.make_scale import _LOWER, _UPPER  # noqa: E402

import numpy as np  # noqa: E402

OUTER_SEED_BASE = 8000
OUTER_DOC_OFFSET = 10_000_000_000


def _outer_letter_map(r: int) -> str:
    rng = np.random.default_rng(OUTER_SEED_BASE + r)
    perm = rng.permutation(26)
    return "".join(_LOWER[i] for i in perm)


def main() -> None:
    src = Path(sys.argv[1] if len(sys.argv) > 1 else ".scale/sf100")
    dst = Path(sys.argv[2] if len(sys.argv) > 2 else ".scale/sf1000")
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    dst.mkdir(parents=True, exist_ok=True)
    parts = []
    for r in range(n):
        lo = _outer_letter_map(r)
        up = lo.upper()
        text = (
            "text"
            if r == 0
            else f"translate(text, '{_LOWER}{_UPPER}', '{lo}{up}')"
        )
        parts.append(
            f"""SELECT doc_id + {r * OUTER_DOC_OFFSET} AS doc_id,
                {text} AS text, lang, source, n_chars
                FROM '{src}/documents.parquet'"""
        )
    sql = " UNION ALL ".join(parts)
    con = duckdb.connect()
    con.execute("SET max_expression_depth TO 10000")
    con.execute(
        f"COPY ({sql}) TO '{dst}/documents.parquet' "
        "(FORMAT PARQUET, COMPRESSION ZSTD)"
    )
    rows = con.execute(
        f"SELECT count(*) FROM '{dst}/documents.parquet'"
    ).fetchone()[0]
    print(f"documents: {rows} rows -> {dst}")


if __name__ == "__main__":
    main()
