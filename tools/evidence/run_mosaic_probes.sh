#!/bin/bash
# Wait for the decode-experiment batch to release the chip, then run the
# Mosaic capability probes, one subprocess per probe with a timeout.
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=${1:-/root/repo/tools/mosaic_probes.log}
while [ ! -f /root/repo/tools/decode_experiments.log ] || ! grep -q "ALL DONE" /root/repo/tools/decode_experiments.log; do
    sleep 20
done
for p in transpose u64mul reshape2d sliceconcat; do
    echo "=== $p $(date +%H:%M:%S) ===" >> "$LOG"
    timeout 900 python tools/mosaic_probes.py "$p" >> "$LOG" 2>&1
    echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
done
echo "ALL DONE" >> "$LOG"
