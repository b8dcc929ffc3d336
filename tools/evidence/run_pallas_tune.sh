#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/pallas_tune.log
for cfg in "pad32 2048" "pad32 512"; do
    echo "=== decode_tune $cfg $(date +%H:%M:%S) ===" >> "$LOG"
    timeout 1500 python tools/pallas_decode_tune.py $cfg >> "$LOG" 2>&1
    echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
done
echo "=== pallas_encode_check $(date +%H:%M:%S) ===" >> "$LOG"
timeout 2400 python tools/pallas_encode_check.py >> "$LOG" 2>&1
echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
echo "ALL DONE" >> "$LOG"
