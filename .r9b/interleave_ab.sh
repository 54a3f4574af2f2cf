#!/bin/bash
# Interleaved A/B: min over 4 alternating rounds x 2 passes each side.
Q="part_copurchase_pagerank knn_label_disagreement_lsh near_dup_clusters_star"
for i in 1 2 3 4; do
  (cd /root/.ab_r9_affb617 && python3 tools/mini_bench.py $Q --passes 2 2>/dev/null | tail -1) >> /root/repo/.r9b/ab3_old.jsonl
  (python3 tools/mini_bench.py $Q --passes 2 2>/dev/null | tail -1) >> /root/repo/.r9b/ab3_new.jsonl
  echo "round $i done" >&2
done
