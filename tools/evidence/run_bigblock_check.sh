#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/bigblock_slim_check.log
: > "$LOG"
echo "=== bigblock $(date +%H:%M:%S) ===" >> "$LOG"
timeout 1800 python -c "
import json, bench
out = bench.bench_big_blocks()
print(json.dumps(out))
" >> "$LOG" 2>&1
echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
echo "ALL DONE" >> "$LOG"
