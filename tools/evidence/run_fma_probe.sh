#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/fma_div_probe.log
: > "$LOG"
for k in pallas xla; do
    echo "=== $k $(date +%H:%M:%S) ===" >> "$LOG"
    timeout 900 python tools/fma_div_probe.py "$k" 8 >> "$LOG" 2>&1
    echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
done
echo "ALL DONE" >> "$LOG"
