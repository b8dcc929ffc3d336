#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/pallas_tune2.log
while ! grep -q "ALL DONE" tools/pallas_tune.log 2>/dev/null; do sleep 20; done
for cfg in "sublane 4096" "sublane 8192" "sublane 2048"; do
    echo "=== decode_tune $cfg $(date +%H:%M:%S) ===" >> "$LOG"
    timeout 1200 python tools/pallas_decode_tune.py $cfg >> "$LOG" 2>&1
    echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
done
echo "ALL DONE" >> "$LOG"
