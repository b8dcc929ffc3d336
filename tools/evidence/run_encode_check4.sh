#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/pallas_encode_check4.log
echo "=== pallas_encode_check $(date +%H:%M:%S) ===" > "$LOG"
timeout 3000 python tools/pallas_encode_check.py >> "$LOG" 2>&1
echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
echo "ALL DONE" >> "$LOG"
