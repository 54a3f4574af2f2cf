#!/bin/sh
# r9 stage 2: recall probe at sf100 (VERDICT r8 item 4 + the item 7
# serving-cap row, --caps 256). Same detached-guard pattern as stage 1.
cd /root/repo
LOG=/root/repo/.r9/chain.log
echo "recall_sf100 start $(date +%H:%M:%S)" >> $LOG
( while true; do
    PCT=$(df / | tail -1 | awk '{print $5}' | tr -d '%')
    echo "disk ${PCT}% $(date +%H:%M:%S) [recall]" >> /root/repo/.r9/chain_disk.log
    if [ "$PCT" -ge 93 ]; then
      echo "DISK GUARD TRIPPED at ${PCT}% during recall_sf100" >> $LOG
      pkill -f "recall_probe.py"
      break
    fi
    sleep 30
    pgrep -f "recall_probe.py" > /dev/null || break
  done ) > /dev/null 2>&1 &
sleep 2
SPARK_DRIVER_MEMORY=48g timeout 5400 python tools/recall_probe.py .scale/sf100 --caps 256 --partitions 512 \
  > /root/repo/.r9/recall_sf100.log 2>&1
echo "recall_sf100 exit=$? $(date +%H:%M:%S)" >> $LOG
