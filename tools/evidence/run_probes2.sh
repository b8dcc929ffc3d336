#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/mosaic_probes2.log
: > "$LOG"
while ! grep -q "ALL DONE" tools/decode_v10.log 2>/dev/null; do sleep 15; done
for p in stride_read stride_write big_transpose; do
    echo "=== $p $(date +%H:%M:%S) ===" >> "$LOG"
    timeout 900 python tools/mosaic_probes.py "$p" >> "$LOG" 2>&1
    echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
done
echo "ALL DONE" >> "$LOG"
