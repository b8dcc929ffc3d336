#!/bin/bash
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/enc2.log
: > $LOG
echo "=== group_encode $(date +%T) ===" >> $LOG
timeout 1800 python tools/pallas_group_encode_check.py >> $LOG 2>&1
echo "rc=$? $(date +%T)" >> $LOG
echo "=== bench $(date +%T) ===" >> $LOG
timeout 3600 python bench.py >> $LOG 2>&1
echo "rc=$? $(date +%T)" >> $LOG
echo "ALL DONE" >> $LOG
