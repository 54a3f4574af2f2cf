"""Fourth-octave winnowing probe (r9, VERDICT r8 item 1): the auto-routed
sliced screen+verify at 50M docs, expected rows exactly 10x sf100's
256,595. Prints one JSON line with timing + the full routing decision."""
import json, sys, time
sys.path.insert(0, ".")

import os
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from autonomous_orchestrator_ai_spark.session import get_spark
from autonomous_orchestrator_ai_spark.operators.dedup import (
    winnowing_near_duplicates_lsh,
)
from autonomous_orchestrator_ai_spark.plans.dedup_queries import (
    _WK, _WW, _WLSH_CAP, _WLSH_SCREEN_K, _WLSH_CUT, NUM_HASHES, BANDS,
    WINNOW_CAND_ROW_BYTES, _lsh_budget_bytes, _winnow_slice_budget_bytes,
)
from autonomous_orchestrator_ai_spark.plans.registry import table

spark = get_spark("winnow-sf1000-r9")
spark.conf.set("spark.sql.shuffle.partitions", "1024")
docs = table(spark, ".scale/sf1000", "documents")
decision = {}
t0 = time.time()
df = winnowing_near_duplicates_lsh(
    docs, "text", "doc_id", k=_WK, w=_WW, containment=0.6,
    num_hashes=NUM_HASHES, bands=BANDS,
    max_bucket_sample=_WLSH_CAP, screen_k=_WLSH_SCREEN_K,
    screen_cut=_WLSH_CUT,
    guard_budget_bytes=_lsh_budget_bytes(),
    guard_row_bytes=WINNOW_CAND_ROW_BYTES,
    guard_decision=decision,
    slice_budget_bytes=_winnow_slice_budget_bytes(),
)
rows = df.count()
sec = round(time.time() - t0, 1)
print(json.dumps({"sf_dir": ".scale/sf1000", "query": "winnowing_near_dup_pairs_lsh",
                  "sec": sec, "rows": rows, "decision": decision}))
