#!/bin/sh
cd /root/repo
while pgrep -f "bench_heavy.py .scale/sf1000" > /dev/null; do sleep 45; done
echo "minhash sf1000 done $(date +%H:%M:%S)" >> /root/repo/.r8/chain.log
python tools/bench_heavy.py .scale/sf1000 quality_classifier_trained_eval --passes 1 --partitions 1024 \
  > /root/repo/.r8/classifier_sf1000_try2.log 2>&1
echo "classifier retry done $(date +%H:%M:%S)" >> /root/repo/.r8/chain.log
