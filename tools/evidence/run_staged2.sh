#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/staged_decode2.log
while ! grep -q "ALL DONE" tools/staged_decode.log 2>/dev/null; do sleep 20; done
for exp in v4_staged v5_staged3; do
    echo "=== $exp $(date +%H:%M:%S) ===" >> "$LOG"
    timeout 1200 python tools/decode_experiments.py "$exp" >> "$LOG" 2>&1
    echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
done
echo "ALL DONE" >> "$LOG"
