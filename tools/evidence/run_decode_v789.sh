#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/decode_v789.log
: > "$LOG"
while ! grep -q "ALL DONE" tools/pallas_encode_check5.log 2>/dev/null; do sleep 15; done
for exp in v8_mxu v9_mxudot v7_stride; do
    echo "=== $exp $(date +%H:%M:%S) ===" >> "$LOG"
    timeout 1500 python tools/decode_experiments.py "$exp" >> "$LOG" 2>&1
    echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
done
echo "ALL DONE" >> "$LOG"
