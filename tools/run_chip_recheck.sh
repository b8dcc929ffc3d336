#!/bin/bash
# Post-tunnel-recovery sequence: warm + gate the new kernels, then the
# full bench, then the int-encode attribution probe.
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=tools/chip_recheck.log
: > "$LOG"
echo "=== validate $(date +%H:%M:%S) ===" >> "$LOG"
timeout 4000 python -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
from minnow_tpu.ops import validate
import json
print(json.dumps(validate.validate_backend()))
" >> "$LOG" 2>&1
echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
echo "=== bench $(date +%H:%M:%S) ===" >> "$LOG"
# manual recheck wants the FULL section set even on a cold cache, so
# widen bench's (driver-sized) default budget
MINNOW_TPU_BENCH_BUDGET_S=5000 timeout 5400 python bench.py >> "$LOG" 2>&1
echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
echo "=== encode struct/const tune $(date +%H:%M:%S) ===" >> "$LOG"
timeout 3600 python tools/encode_struct_tune.py cap128 cap256 cap128p \
    const128 const256 const128p >> "$LOG" 2>&1
echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
echo "=== int attrib $(date +%H:%M:%S) ===" >> "$LOG"
timeout 1800 python tools/int_encode_attrib.py >> "$LOG" 2>&1
echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
echo "=== r3 kernel tune $(date +%H:%M:%S) ===" >> "$LOG"
timeout 3600 python tools/r3_kernel_tune.py >> "$LOG" 2>&1
echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
echo "=== every-width device sweep $(date +%H:%M:%S) ===" >> "$LOG"
timeout 5400 python tools/r3_kernel_fuzz_soak.py --device 2 >> "$LOG" 2>&1
echo "rc=$? $(date +%H:%M:%S)" >> "$LOG"
echo "ALL DONE" >> "$LOG"
