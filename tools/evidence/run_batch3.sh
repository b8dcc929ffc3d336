#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/batch3.log
while ! grep -q "ALL DONE" tools/pallas_encode_check2.log 2>/dev/null; do sleep 20; done
echo "=== v6_twodispatch $(date +%H:%M:%S) ===" >> "$LOG"
timeout 1200 python tools/decode_experiments.py v6_twodispatch >> "$LOG" 2>&1
echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
for cfg in "pad32 2048" "pad32 1024"; do
    echo "=== decode_tune $cfg $(date +%H:%M:%S) ===" >> "$LOG"
    timeout 1200 python tools/pallas_decode_tune.py $cfg >> "$LOG" 2>&1
    echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
done
echo "ALL DONE" >> "$LOG"
