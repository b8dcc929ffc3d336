#!/bin/bash
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/encode_attrib.log
: > $LOG
timeout 1800 python tools/encode_attrib.py >> $LOG 2>&1
echo "rc=$? $(date +%T)" >> $LOG
