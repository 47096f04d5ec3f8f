#!/bin/bash
# Opportunistic TPU-tunnel probe: tries a fresh-subprocess jax.devices()
# every ~3 minutes (the round-2/3 capture pattern — the tunnel comes and
# goes; a hung probe must not wedge the caller).  Writes /tmp/tpu_up on
# success and exits 0; exits 1 after the probe budget with no window.
#
# Usage: bash scripts/tpu_probe.sh [n_probes]
set -u
N=${1:-3}
for i in $(seq 1 "$N"); do
  if timeout 90 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu', d; print(d)" \
      > /tmp/tpu_probe_last.log 2>&1; then
    date +%s > /tmp/tpu_up
    echo "TPU UP at $(date -u +%H:%M:%S)"
    exit 0
  fi
  echo "probe $i/$N: down at $(date -u +%H:%M:%S)"
  [ "$i" -lt "$N" ] && sleep 150
done
exit 1
