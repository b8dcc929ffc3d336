#!/bin/bash
# On-chip group-encode check, queued behind the pgroup decode runs.
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/group_encode.log
: > "$LOG"
while ! grep -q "ALL DONE" tools/pgroup.log 2>/dev/null; do sleep 15; done
echo "=== group_encode $(date +%T) ===" >> "$LOG"
timeout 1200 python tools/pallas_group_encode_check.py >> "$LOG" 2>&1
echo "rc=$? $(date +%T)" >> "$LOG"
echo "ALL DONE" >> "$LOG"
