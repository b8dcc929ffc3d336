#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/pallas_encode_check2.log
while ! grep -q "ALL DONE" tools/staged_decode2.log 2>/dev/null; do sleep 20; done
echo "=== pallas_encode_check $(date +%H:%M:%S) ===" >> "$LOG"
timeout 2400 python tools/pallas_encode_check.py >> "$LOG" 2>&1
echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
echo "ALL DONE" >> "$LOG"
