#!/bin/bash
# Drive tools/decode_experiments.py on the real chip, one subprocess per
# experiment with a hard timeout (a Mosaic remote-compile stall in one
# variant must not wedge the batch).  Results append to the log as JSON
# lines.
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=${1:-/root/repo/tools/decode_experiments.log}
for exp in ceiling transpose gather v0_current v3_flatT v1_concat v2_lanegather; do
    echo "=== $exp $(date +%H:%M:%S) ===" >> "$LOG"
    timeout 1500 python tools/decode_experiments.py "$exp" >> "$LOG" 2>&1
    echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
done
echo "ALL DONE" >> "$LOG"
