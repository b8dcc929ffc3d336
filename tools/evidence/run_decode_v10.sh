#!/bin/bash
# On-chip runs of the all-aligned decode variants, serialized with
# per-run timeouts (a Mosaic/XLA compile stall must not wedge the rest).
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/decode_v10.log
: > $LOG
for exp in transpose_aligned v10_group64 v11_group64b; do
  echo "=== $exp $(date +%T) ===" >> $LOG
  timeout 900 python tools/decode_experiments.py $exp >> $LOG 2>&1
  echo "rc=$? $(date +%T)" >> $LOG
done
echo "ALL DONE" >> $LOG
