"""Deterministic scale-factor promotion: replicate an sf directory Nx with
key-shifted, FK-consistent copies (VERDICT r2 item 1 — scale evidence).

Usage:
    python tools/make_scale.py SRC_DIR DST_DIR [N]
    python tools/make_scale.py /root/testdata/sf0.1 /root/repo/.scale/sf1 10

Design (what makes the replica an honest 10x of the same workload, not a
pathological one):

- every key space shifts by ``replica * OFFSET`` with OFFSET > max key, so
  all FK joins (orders->customer, lineitem->part/supplier/orders) stay
  consistent and selectivities/group cardinalities scale linearly;
- dimension tables (region, nation) are NOT replicated — exactly how real
  star schemas scale, keeping broadcast-ability intact;
- events keep their timestamps (10x density in the same window — the
  realistic shape for a busier system) but shift user_id, so per-user
  event counts and session structure stay constant;
- document TEXT in replica r>0 is Caesar-shifted (letters rotate by r,
  case-preserving; digits/punct/whitespace untouched). The map is
  injective per replica, so within a replica EVERY text-equality
  structure — word shingles, char k-grams, winnowing sketches, simhash —
  is preserved verbatim and near-dup pairs scale exactly linearly; across
  replicas no letter-gram is shared, so cross-replica pairs don't exist.
  (Replicating text UNCHANGED would make every doc a 10-way exact dup and
  near-dup work quadratic; a per-word suffix — the first design — still
  shares long character runs across replicas and blows up the
  substring-sensitive winnowing join the same way. Both benchmark a
  degenerate corpus, not a 10x one.) Word lengths and counts are
  unchanged, so token/quality statistics are replica-invariant;
- embeddings in replica r>0 get small deterministic Gaussian perturbation
  (seed = 1000+r), so ANN neighbor structure is realistic rather than
  10-way-tied, while replica 0 remains the original corpus verbatim.

Replica 0 is byte-identical content for every table, so any query whose
result is replica-0-restrictable can be sanity-diffed against the source.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

#: key-shift offsets per replica (all > the sf0.1 max of their key space,
#: with room for ~sf10)
OFF = {
    "cust": 10_000_000,
    "supp": 1_000_000,
    "part": 10_000_000,
    "order": 100_000_000,
    "event": 100_000_000,
    "user": 1_000_000,
    "doc": 10_000_000,
    "vec": 10_000_000,
}


def _copy_sql(src: Path, dst: Path, n: int) -> list[tuple[str, str]]:
    s = lambda t: f"'{src}/{t}.parquet'"  # noqa: E731
    return [
        ("region", f"SELECT * FROM {s('region')}"),
        ("nation", f"SELECT * FROM {s('nation')}"),
        (
            "customer",
            f"""SELECT c_custkey + r*{OFF['cust']} AS c_custkey, c_name,
                c_nationkey, c_acctbal, c_mktsegment
                FROM {s('customer')} CROSS JOIN range({n}) t(r)""",
        ),
        (
            "supplier",
            f"""SELECT s_suppkey + r*{OFF['supp']} AS s_suppkey, s_name,
                s_nationkey, s_acctbal
                FROM {s('supplier')} CROSS JOIN range({n}) t(r)""",
        ),
        (
            "part",
            f"""SELECT p_partkey + r*{OFF['part']} AS p_partkey, p_name,
                p_brand, p_type, p_size, p_retailprice
                FROM {s('part')} CROSS JOIN range({n}) t(r)""",
        ),
        (
            "orders",
            f"""SELECT o_orderkey + r*{OFF['order']} AS o_orderkey,
                o_custkey + r*{OFF['cust']} AS o_custkey,
                o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
                FROM {s('orders')} CROSS JOIN range({n}) t(r)""",
        ),
        (
            "lineitem",
            f"""SELECT l_orderkey + r*{OFF['order']} AS l_orderkey,
                l_partkey + r*{OFF['part']} AS l_partkey,
                l_suppkey + r*{OFF['supp']} AS l_suppkey,
                l_linenumber, l_quantity, l_extendedprice, l_discount,
                l_tax, l_returnflag, l_linestatus, l_shipdate
                FROM {s('lineitem')} CROSS JOIN range({n}) t(r)""",
        ),
        (
            "events",
            f"""SELECT event_id + r*{OFF['event']} AS event_id, ts,
                user_id + r*{OFF['user']} AS user_id,
                event_type, value, props
                FROM {s('events')} CROSS JOIN range({n}) t(r)""",
        ),
        ("documents", _documents_sql(src, n)),
    ]


_LOWER = "abcdefghijklmnopqrstuvwxyz"
_UPPER = _LOWER.upper()


def _replica_letter_map(r: int) -> str:
    """Per-replica injective letter map. Replica 0 is identity; replica
    r>0 uses a seeded random permutation of the alphabet (NOT a Caesar
    rotation: there are only 26 rotations, so any n > 26 replication
    would repeat maps and create cross-replica exact-duplicate texts —
    degenerating every near-dup benchmark into quadratic duplicate
    groups). Random permutations stay pairwise gram-disjoint in practice
    at any n, while within a replica every text-equality structure is
    preserved verbatim (the map is a bijection, lengths unchanged)."""
    rng = np.random.default_rng(7000 + r)
    perm = rng.permutation(26)
    lo = "".join(_LOWER[i] for i in perm)
    return lo


def _documents_sql(src: Path, n: int) -> str:
    """UNION ALL of per-replica SELECTs, each with its own injective
    letter map via translate() — n_chars is length-invariant."""
    parts = []
    for r in range(n):
        lo = _replica_letter_map(r)
        up = lo.upper()
        text = (
            "text"
            if r == 0
            else f"translate(text, '{_LOWER}{_UPPER}', '{lo}{up}')"
        )
        parts.append(
            f"""SELECT doc_id + {r * OFF['doc']} AS doc_id, {text} AS text,
                lang, source, n_chars
                FROM '{src}/documents.parquet'"""
        )
    return " UNION ALL ".join(parts)


def make_embeddings(src: Path, dst: Path, n: int) -> None:
    t = pq.read_table(src / "embeddings.parquet")
    vec_ids = t.column("vec_id").to_numpy()
    labels = t.column("label").to_numpy()
    base = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    ids, labs, vecs = [], [], []
    for r in range(n):
        rng = np.random.default_rng(1000 + r)
        v = base if r == 0 else base + rng.normal(
            scale=0.01, size=base.shape
        ).astype(np.float32)
        ids.append(vec_ids + r * OFF["vec"])
        labs.append(labels)
        vecs.append(v)
    out = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids), pa.int64()),
            "embedding": pa.array(
                [row.tolist() for v in vecs for row in v],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(np.concatenate(labs), pa.int32()),
        }
    )
    pq.write_table(out, dst / "embeddings.parquet")


def main() -> None:
    src = Path(sys.argv[1])
    dst = Path(sys.argv[2])
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for name, sql in _copy_sql(src, dst, n):
        con.execute(
            f"COPY ({sql}) TO '{dst}/{name}.parquet' "
            "(FORMAT PARQUET, COMPRESSION ZSTD)"
        )
        rows = con.execute(
            f"SELECT count(*) FROM '{dst}/{name}.parquet'"
        ).fetchone()[0]
        print(f"{name}: {rows} rows")
    make_embeddings(src, dst, n)
    print(f"embeddings: done -> {dst}")


if __name__ == "__main__":
    main()
