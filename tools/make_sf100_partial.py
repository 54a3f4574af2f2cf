"""sf100 documents + embeddings ONLY (the tables the two slowest sf10
queries read) — reuses make_scale's replica machinery; the TPC-H tables
are skipped because the sf100 probe doesn't touch them and lineitem at
sf100 (600M rows) would dominate generation time and disk for nothing.

Usage: python tools/make_sf100_partial.py [src] [dst] [n]
"""
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, ".")
from tools.make_scale import _documents_sql, make_embeddings  # noqa: E402

src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
dst = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf100")
n = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
dst.mkdir(parents=True, exist_ok=True)
con = duckdb.connect()
con.execute("SET max_expression_depth TO 10000")
con.execute(
    f"COPY ({_documents_sql(src, n)}) TO '{dst}/documents.parquet' "
    "(FORMAT PARQUET, COMPRESSION ZSTD)"
)
print("documents:", con.execute(f"SELECT count(*) FROM '{dst}/documents.parquet'").fetchone()[0])
make_embeddings(src, dst, n)
print("embeddings:", con.execute(f"SELECT count(*) FROM '{dst}/embeddings.parquet'").fetchone()[0])
