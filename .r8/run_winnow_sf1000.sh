#!/bin/sh
cd /root/repo
( while true; do
    PCT=$(df / | tail -1 | awk '{print $5}' | tr -d '%')
    echo "disk ${PCT}% $(date +%H:%M:%S)" >> /root/repo/.r8/winnow_sf1000_disk.log
    if [ "$PCT" -ge 93 ]; then
      echo "DISK GUARD TRIPPED at ${PCT}%" >> /root/repo/.r8/winnow_sf1000_disk.log
      pkill -f "bench_heavy.py .scale/sf1000" 
      break
    fi
    sleep 30
  done ) &
MON=$!
python tools/bench_heavy.py .scale/sf1000 winnowing_near_dup_pairs_lsh --passes 1 --partitions 1024 > /root/repo/.r8/winnow_sf1000.log 2>&1
kill $MON 2>/dev/null
echo done >> /root/repo/.r8/winnow_sf1000.log
