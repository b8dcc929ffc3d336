#!/bin/bash
# On-chip runs of the aligned-group Pallas decode kernel, serialized
# with per-run timeouts (a Mosaic compile stall must not wedge the rest).
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/pgroup.log
: > $LOG
for exp in pgroup pgroup_r64 pgroup_r256 pgroup_unpack; do
  echo "=== $exp $(date +%T) ===" >> $LOG
  timeout 900 python tools/decode_experiments.py $exp >> $LOG 2>&1
  echo "rc=$? $(date +%T)" >> $LOG
done
echo "ALL DONE" >> $LOG
