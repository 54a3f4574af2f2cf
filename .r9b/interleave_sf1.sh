#!/bin/bash
Q="part_copurchase_pagerank knn_label_disagreement_lsh"
SF=/root/repo/.scale/sf1
for i in 1 2 3; do
  (cd /root/.ab_r9_affb617 && python3 tools/mini_bench.py $Q --passes 2 --sf $SF 2>/dev/null | tail -1) >> /root/repo/.r9b/sf1_old.jsonl
  (python3 tools/mini_bench.py $Q --passes 2 --sf $SF 2>/dev/null | tail -1) >> /root/repo/.r9b/sf1_new.jsonl
  echo "round $i done" >&2
done
