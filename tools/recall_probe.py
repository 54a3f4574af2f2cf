"""Retrieval-quality probe for the capped corpus-wide LSH screens
(r8, VERDICT r7 item 6).

The hot-bucket cap's oracle-exactness proves DETERMINISM; this measures
what the approximations COST, on a deterministic sampled query slice,
against the exact brute-force answer at the same parameters:

1. ``knn_label_disagreement_lsh``'s retrieval core
   (``similarity.lsh_bucketed_topk``, own-bucket probing, auto planes,
   4 tables): recall@k of the UNCAPPED LSH screen vs exact brute-force
   top-k, and of the CAPPED screen (``max_bucket_candidates=64``, the
   registered query's guard) vs both — isolating banding loss from cap
   loss.
2. ``embedding_near_dup_clusters``'s edge generator
   (``similarity.embedding_near_dup_star_edges`` -> connected
   components): cluster recall — the fraction of exact
   cosine>=threshold neighbor pairs (per sampled query) whose endpoints
   land in the SAME component. Star edges are the linear substitute for
   the quadratic pair dump; this measures what that substitution loses.

Queries are the ``n_queries`` vectors with the smallest
md5('recallq:' || vec_id) draw — deterministic, engine-stable, corpus-
independent of insertion order.

Usage: python tools/recall_probe.py SF_DIR [--queries 500] [--k 5]
       [--threshold 0.4] [--partitions 128] [--skip-clusters]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("sf_dir")
    p.add_argument("--queries", type=int, default=500)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--threshold", type=float, default=0.4)
    p.add_argument("--partitions", type=int, default=128)
    p.add_argument("--skip-clusters", action="store_true")
    p.add_argument(
        "--caps", type=int, nargs="*", default=[],
        help="extra bucket caps to measure (e.g. 256 for the serving row)",
    )
    ns = p.parse_args()

    from pyspark.sql import functions as F

    from autonomous_orchestrator_ai_spark.operators.graph import (
        connected_components,
    )
    from autonomous_orchestrator_ai_spark.operators.similarity import (
        auto_planes,
        cosine,
        cosine_topk,
        embedding_near_dup_star_edges,
        lsh_bucketed_topk,
    )
    from autonomous_orchestrator_ai_spark.plans.registry import table
    from autonomous_orchestrator_ai_spark.session import get_spark

    spark = get_spark("recall-probe")
    spark.conf.set("spark.sql.shuffle.partitions", str(ns.partitions))
    emb = table(spark, ns.sf_dir, "embeddings").select("vec_id", "embedding")
    n_corpus = emb.count()
    planes = auto_planes(n_corpus)

    q = (
        emb.withColumn(
            "__draw",
            F.md5(F.concat(F.lit("recallq:"), F.col("vec_id").cast("string"))),
        )
        .orderBy("__draw", "vec_id")
        .limit(ns.queries)
        .drop("__draw")
        .persist()
    )
    q.count()
    out: dict = {
        "sf_dir": ns.sf_dir,
        "n_corpus": n_corpus,
        "n_queries": ns.queries,
        "k": ns.k,
        "n_planes": planes,
        "n_tables": 4,
    }

    def topk_sets(df) -> dict[int, set[int]]:
        got: dict[int, set[int]] = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return got

    t0 = time.time()
    exact = topk_sets(
        cosine_topk(emb, q, k=ns.k).select("query_id", "neighbor_id")
    )
    out["exact_sec"] = round(time.time() - t0, 1)

    def screen(cap, bits=0):
        t0 = time.time()
        got = topk_sets(
            lsh_bucketed_topk(
                emb, q, k=ns.k, n_planes=planes, n_tables=4,
                multiprobe_bits=bits, broadcast_queries=True,
                max_bucket_candidates=cap,
            ).select("query_id", "neighbor_id")
        )
        return got, round(time.time() - t0, 1)

    uncapped, t_un = screen(None)
    capped, t_cap = screen(64)

    def recall(found: dict, truth: dict) -> float:
        num = sum(len(found.get(k_, set()) & v) for k_, v in truth.items())
        den = sum(len(v) for v in truth.values())
        return round(num / den, 4) if den else 1.0

    out["knn_screen"] = {
        "uncapped_vs_exact_recall": recall(uncapped, exact),
        "capped_vs_exact_recall": recall(capped, exact),
        "capped_vs_uncapped_recall": recall(capped, uncapped),
        "uncapped_sec": t_un,
        "capped_sec": t_cap,
        "bucket_cap": 64,
    }

    # the REGISTERED screen's routed probe set (r9, VERDICT r8 item 6):
    # 1-bit flips engage exactly when the priced fan-out fits the budget
    from autonomous_orchestrator_ai_spark.plans.ml_queries import (
        _screen_multiprobe_route,
    )

    routed_bits = 1 if _screen_multiprobe_route(n_corpus, planes) else 0
    routed, t_routed = screen(64, bits=routed_bits)
    out["knn_screen"]["routed_multiprobe_bits"] = routed_bits
    out["knn_screen"]["routed_vs_exact_recall"] = recall(routed, exact)
    out["knn_screen"]["routed_sec"] = t_routed

    # cap-policy split rows (r9, VERDICT r8 item 7): measure serving-ish
    # cap settings to show where the cap-64 identity loss recovers
    for cap in ns.caps:
        got, t_c = screen(cap)
        out["knn_screen"][f"cap{cap}_vs_exact_recall"] = recall(got, exact)
        out["knn_screen"][f"cap{cap}_sec"] = t_c

    if not ns.skip_clusters:
        t0 = time.time()
        edges = embedding_near_dup_star_edges(
            emb, threshold=ns.threshold, n_tables=4
        )
        comp = connected_components(edges, src="src", dst="dst").persist()
        comp.count()
        # exact ground truth: every corpus vector within threshold of a
        # sampled query (brute force on the slice — candidate volume is
        # bounded by n_queries x cluster size)
        qa = q.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("__qv"),
        )
        pairs = (
            emb.crossJoin(F.broadcast(qa))
            .where(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                cosine(
                    F.col("embedding").cast("array<double>"),
                    F.col("__qv").cast("array<double>"),
                ).alias("__sim"),
            )
            .where(F.col("__sim") >= ns.threshold)
            .persist()
        )
        pairs.count()
        # edge-less vectors are SINGLETON clusters (coalesce to own id —
        # the registered query's assignment rule); an inner join would
        # silently drop their pairs and overstate recall
        ca = comp.withColumnRenamed("node", "query_id").withColumnRenamed(
            "component", "__cq"
        )
        cb = comp.withColumnRenamed("node", "neighbor_id").withColumnRenamed(
            "component", "__cn"
        )
        joined = (
            pairs.join(ca, "query_id", "left")
            .join(cb, "neighbor_id", "left")
            .select(
                "__sim",
                (
                    F.coalesce(F.col("__cq"), F.col("query_id"))
                    == F.coalesce(F.col("__cn"), F.col("neighbor_id"))
                ).alias("__same"),
            )
            .persist()
        )
        # recall at the census threshold AND at duplicate tightness
        # (0.9): the star-edge contract targets near-identical copies;
        # loose 0.4-neighbors legitimately spread across clusters
        rows = {}
        for tag, cut in (("at_threshold", ns.threshold), ("tight_0.9", 0.9)):
            sl = joined.where(F.col("__sim") >= cut)
            n_true = sl.count()
            n_same = sl.where("__same").count()
            rows[tag] = {
                "min_sim": cut,
                "n_true_pairs": n_true,
                "n_same_cluster": n_same,
                "cluster_recall": round(n_same / n_true, 4) if n_true else 1.0,
            }
        out["cluster_screen"] = {
            **rows,
            "sec": round(time.time() - t0, 1),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
