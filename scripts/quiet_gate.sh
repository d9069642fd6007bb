#!/bin/bash
# Run a command only once the box is quiet: waits until load1m drops
# below $QUIET_MAX (default 2.5), then execs the command. The sandbox's
# external load arrives in ~10-minute waves (BASELINE.md noise
# methodology); gating a measurement on a quiet launch window is the
# cheapest way to keep it uncontaminated. Max wait 25 min, then runs
# anyway (stamps tell the reader).
#
# Usage: scripts/quiet_gate.sh <cmd...>
max=${QUIET_MAX:-2.5}
deadline=$((SECONDS + 1500))
while :; do
  l=$(cut -d' ' -f1 /proc/loadavg)
  ok=$(python3 -c "print(1 if $l < $max else 0)")
  if [ "$ok" = "1" ] || [ $SECONDS -ge $deadline ]; then
    echo "quiet_gate: launching at load1m=$l" >&2
    exec "$@"
  fi
  sleep 45
done
