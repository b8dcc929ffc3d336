#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
echo "=== pallas_decode_check $(date +%H:%M:%S) ===" >> tools/pallas_decode_check.log
timeout 2400 python tools/pallas_decode_check.py >> tools/pallas_decode_check.log 2>&1
echo "rc=$? $(date +%H:%M:%S)" >> tools/pallas_decode_check.log
echo "ALL DONE" >> tools/pallas_decode_check.log
echo "=== pallas_encode_check $(date +%H:%M:%S) ===" >> tools/pallas_encode_check.log
timeout 2400 python tools/pallas_encode_check.py >> tools/pallas_encode_check.log 2>&1
echo "rc=$? $(date +%H:%M:%S)" >> tools/pallas_encode_check.log
echo "ALL DONE" >> tools/pallas_encode_check.log
