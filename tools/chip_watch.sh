#!/bin/bash
# Chip-recovery watcher: probe backend init (killable) every ~10 min;
# on success, record the timestamp and stop.  Poll /tmp/chip_up to see
# if the TPU came back.  Probe is a fresh interpreter (the axon plugin
# latches at startup) under timeout so a hung init can't leak.
while true; do
  if timeout 180 python -c "import jax; print(jax.devices())" \
      > /tmp/chip_probe.log 2>&1; then
    date > /tmp/chip_up
    # kick the full on-chip evidence batch immediately so no recovery
    # window is wasted (validate -> bench -> attrib -> kernel tunes;
    # log: tools/chip_recheck.log)
    nohup bash /root/repo/tools/run_chip_recheck.sh \
      > /tmp/chip_recheck_launch.log 2>&1 &
    exit 0
  fi
  sleep 600
done
