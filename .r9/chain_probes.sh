#!/bin/sh
# r9 probe chain: waits for the winnowing sf1000 run, then runs the queued
# probes SEQUENTIALLY (r8 lesson: one heavy probe at a time), each behind
# a disk guard. Order: minhash sf1000 (VERDICT item 8, shortest path to a
# BENCH row), recall sf100 (item 4 + item 7 serving row), 200M tick
# (item 5) last because it needs ~38 GB of generated JSONL.
cd /root/repo
LOG=/root/repo/.r9/chain.log
echo "chain start $(date +%H:%M:%S)" >> $LOG

# stage 0: wait for the winnowing probe to exit
while pgrep -f "winnow_sf1000_probe.py" > /dev/null; do sleep 60; done
echo "winnow done $(date +%H:%M:%S)" >> $LOG
sleep 30

guard() {
  ( while true; do
      PCT=$(df / | tail -1 | awk '{print $5}' | tr -d '%')
      echo "disk ${PCT}% $(date +%H:%M:%S) [$1]" >> /root/repo/.r9/chain_disk.log
      if [ "$PCT" -ge 93 ]; then
        echo "DISK GUARD TRIPPED at ${PCT}% during $1" >> $LOG
        pkill -f "$2"
        break
      fi
      sleep 30
    done ) &
  echo $!
}

# stage 1: minhash sf1000 re-probe on the cost-routed plan (item 8)
MON=$(guard minhash_sf1000 "bench_heavy.py .scale/sf1000")
SPARK_DRIVER_MEMORY=48g timeout 5400 python tools/bench_heavy.py .scale/sf1000 minhash_lsh_near_dups --passes 1 --partitions 1024 \
  > /root/repo/.r9/minhash_sf1000.log 2>&1
echo "minhash_sf1000 exit=$? $(date +%H:%M:%S)" >> $LOG
kill $MON 2>/dev/null
sleep 15

# stage 2: recall probe at sf100 (VERDICT r8 item 4 + item 7 serving row)
MON=$(guard recall_sf100 "recall_probe.py")
SPARK_DRIVER_MEMORY=48g timeout 5400 python tools/recall_probe.py .scale/sf100 --caps 256 --partitions 512 \
  > /root/repo/.r9/recall_sf100.log 2>&1
echo "recall_sf100 exit=$? $(date +%H:%M:%S)" >> $LOG
kill $MON 2>/dev/null
sleep 15

# stage 3: pipeline tick, fourth octave at 200M events (item 5) — only if
# >=55 GB free (38 GB JSONL + working room)
AVAIL_GB=$(df -BG / | tail -1 | awk '{print $4}' | tr -d 'G')
if [ "$AVAIL_GB" -ge 55 ]; then
  MON=$(guard tick_200m "pipeline_tick_sf1.py")
  SPARK_DRIVER_MEMORY=48g timeout 7200 python tools/pipeline_tick_sf1.py 200000000 .scale/tick_sf200 \
    > /root/repo/.r9/tick_200m.log 2>&1
  echo "tick_200m exit=$? $(date +%H:%M:%S)" >> $LOG
  kill $MON 2>/dev/null
  rm -rf .scale/tick_sf200
else
  echo "tick_200m SKIPPED: ${AVAIL_GB}G free" >> $LOG
fi
echo "chain done $(date +%H:%M:%S)" >> $LOG
