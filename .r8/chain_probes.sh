#!/bin/sh
cd /root/repo
# wait for the winnowing sf1000 run to finish
while pgrep -f "bench_heavy.py .scale/sf1000" > /dev/null; do sleep 60; done
echo "winnow done $(date +%H:%M:%S)" >> /root/repo/.r8/chain.log

# 2. minhash sf1000 re-probe (guard routed OFF there; confirms the number)
python tools/bench_heavy.py .scale/sf1000 minhash_lsh_near_dups --passes 1 --partitions 1024 \
  > /root/repo/.r8/minhash_sf1000.log 2>&1
echo "minhash sf1000 done $(date +%H:%M:%S)" >> /root/repo/.r8/chain.log

# 3. classifier sf1000 (item 8)
python tools/bench_heavy.py .scale/sf1000 quality_classifier_trained_eval --passes 1 --partitions 1024 \
  > /root/repo/.r8/classifier_sf1000.log 2>&1
echo "classifier sf1000 done $(date +%H:%M:%S)" >> /root/repo/.r8/chain.log

# 4. pipeline tick, fourth octave (item 7): 300M events
python tools/pipeline_tick_sf1.py 300000000 .scale/tick_sf300 \
  > /root/repo/.r8/tick_300m.log 2>&1
echo "tick 300M done $(date +%H:%M:%S)" >> /root/repo/.r8/chain.log
rm -rf .scale/tick_sf300
