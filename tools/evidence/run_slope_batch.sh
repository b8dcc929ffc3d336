#!/bin/bash
# Wide-spread decode slope + re-timed group encode, serialized on the chip.
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/slope_batch.log
: > $LOG
echo "=== decode_slope $(date +%T) ===" >> $LOG
timeout 1800 python tools/decode_slope_check.py >> $LOG 2>&1
echo "rc=$? $(date +%T)" >> $LOG
echo "=== group_encode $(date +%T) ===" >> $LOG
timeout 1800 python tools/pallas_group_encode_check.py >> $LOG 2>&1
echo "rc=$? $(date +%T)" >> $LOG
echo "ALL DONE" >> $LOG
