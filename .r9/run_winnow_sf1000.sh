#!/bin/sh
cd /root/repo
( while true; do
    PCT=$(df / | tail -1 | awk '{print $5}' | tr -d '%')
    echo "disk ${PCT}% $(date +%H:%M:%S)" >> /root/repo/.r9/winnow_sf1000_disk.log
    if [ "$PCT" -ge 93 ]; then
      echo "DISK GUARD TRIPPED at ${PCT}%" >> /root/repo/.r9/winnow_sf1000_disk.log
      pkill -f "winnow_sf1000_probe.py"
      break
    fi
    sleep 30
  done ) &
MON=$!
SPARK_DRIVER_MEMORY=80g python .r9/winnow_sf1000_probe.py > /root/repo/.r9/winnow_sf1000.log 2>&1
EXIT=$?
kill $MON 2>/dev/null
echo "exit=$EXIT done $(date +%H:%M:%S)" >> /root/repo/.r9/winnow_sf1000.log
