#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/encode_slim_check.log
: > "$LOG"
echo "=== slim cap128 $(date +%H:%M:%S) ===" >> "$LOG"
timeout 1500 python tools/encode_struct_tune.py cap128 >> "$LOG" 2>&1
echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
echo "ALL DONE" >> "$LOG"
