#!/bin/sh
# r9 stage 1: minhash sf1000 re-probe on the cost-routed plan (VERDICT r8
# item 8). Disk guard runs as a fully detached process (stdout/stderr to
# the log file, NOT inherited — the chain_probes.sh version hung its
# caller's command substitution by keeping the pipe open).
cd /root/repo
LOG=/root/repo/.r9/chain.log
echo "minhash_sf1000 start $(date +%H:%M:%S)" >> $LOG
( while true; do
    PCT=$(df / | tail -1 | awk '{print $5}' | tr -d '%')
    echo "disk ${PCT}% $(date +%H:%M:%S) [minhash]" >> /root/repo/.r9/chain_disk.log
    if [ "$PCT" -ge 93 ]; then
      echo "DISK GUARD TRIPPED at ${PCT}% during minhash_sf1000" >> $LOG
      pkill -f "bench_heavy.py .scale/sf1000"
      break
    fi
    sleep 30
    pgrep -f "bench_heavy.py .scale/sf1000" > /dev/null || break
  done ) > /dev/null 2>&1 &
sleep 2
SPARK_DRIVER_MEMORY=48g timeout 5400 python tools/bench_heavy.py .scale/sf1000 minhash_lsh_near_dups --passes 1 --partitions 1024 \
  > /root/repo/.r9/minhash_sf1000.log 2>&1
echo "minhash_sf1000 exit=$? $(date +%H:%M:%S)" >> $LOG
