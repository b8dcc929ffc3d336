#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/encode_struct_tune.log
: > "$LOG"
echo "=== start $(date +%H:%M:%S) ===" >> "$LOG"
timeout 3000 python tools/encode_struct_tune.py >> "$LOG" 2>&1
echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
echo "ALL DONE" >> "$LOG"
