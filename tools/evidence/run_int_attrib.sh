#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/int_encode_attrib.log
: > "$LOG"
timeout 1500 python tools/int_encode_attrib.py >> "$LOG" 2>&1
echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
echo "ALL DONE" >> "$LOG"
