#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=/root/repo/tools/pallas_decode_check.log
while [ ! -f /root/repo/tools/mosaic_probes.log ] || ! grep -q "ALL DONE" /root/repo/tools/mosaic_probes.log; do
    sleep 20
done
echo "=== pallas_decode_check $(date +%H:%M:%S) ===" >> "$LOG"
timeout 2400 python tools/pallas_decode_check.py >> "$LOG" 2>&1
echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
echo "ALL DONE" >> "$LOG"
