#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/staged_decode.log
while ! grep -q "ALL DONE" tools/pallas_tune2.log 2>/dev/null; do sleep 20; done
for exp in v4_staged v5_staged3; do
    echo "=== $exp $(date +%H:%M:%S) ===" >> "$LOG"
    timeout 1200 python tools/decode_experiments.py "$exp" >> "$LOG" 2>&1
    echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
done
echo "=== pallas_encode_check $(date +%H:%M:%S) ===" >> "$LOG"
timeout 2400 python tools/pallas_encode_check.py >> "$LOG" 2>&1
echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
echo "ALL DONE" >> "$LOG"
