#!/bin/bash
# Decode slope check (rows tuning) then the restructured bench, serialized.
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/bench_batch.log
: > $LOG
echo "=== decode_slope $(date +%T) ===" >> $LOG
timeout 1800 python tools/decode_slope_check.py >> $LOG 2>&1
echo "rc=$? $(date +%T)" >> $LOG
echo "=== bench $(date +%T) ===" >> $LOG
timeout 3600 python bench.py >> $LOG 2>&1
echo "rc=$? $(date +%T)" >> $LOG
echo "ALL DONE" >> $LOG
