#!/bin/bash
# Wait for the axon TPU tunnel to recover, then exec a driver — with the
# round-end hygiene VERDICT r3 next #9 demands baked in:
#   * --deadline UNIX_TS (required): the waiter refuses to probe, and the
#     driver is told to wind down (R4_DEADLINE_TS), once the deadline minus
#     a 10-minute margin has passed. A wedged-tunnel recovery loop can
#     therefore never collide with the external end-of-round bench.
#   * a flock on /tmp/tpu_waiter.lock: a second waiter exits immediately
#     instead of stacking probe clients (the round-2 self-inflicted wedge).
#   * probes are STRICTLY SERIAL (one client, 150 s timeout, 240 s gaps).
#
# Usage: bash scripts/wait_and_run.sh --deadline 1750000000 \
#            python -u scripts/r4_driver.py
set -u
DEADLINE=0
if [ "${1:-}" = "--deadline" ]; then DEADLINE="$2"; shift 2; fi
if [ "$DEADLINE" -le 0 ]; then
  echo "wait_and_run.sh: --deadline UNIX_TS is required" >&2
  exit 2
fi
MARGIN=600
LOCK=/tmp/tpu_waiter.lock

exec 9>"$LOCK"
if ! flock -n 9; then
  echo "$(date +%H:%M:%S) another waiter holds $LOCK, exiting" >&2
  exit 1
fi

cd /root/repo
# Exponential backoff between failed probes: the round-2 postmortem says the
# tunnel needs IDLE time to recover (10-25 min observed), so a fixed 5-min
# cadence can plausibly keep re-wedging it forever. Gap grows 300 -> 900 s
# across consecutive failures and resets on success.
GAP=300
MAXGAP=900
while true; do
  now=$(date +%s)
  if [ $((now + MARGIN)) -ge "$DEADLINE" ]; then
    echo "$(date +%H:%M:%S) deadline margin reached, giving up (tunnel stays idle)"
    exit 3
  fi
  echo "$(date +%H:%M:%S) probe (next gap ${GAP}s)"
  if timeout 90 python -u -c "
import jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
x = jax.jit(lambda a: a @ a)(jnp.eye(8))
assert float(x.sum()) == 8.0
print('smoke ok', flush=True)
"; then
    echo "$(date +%H:%M:%S) tunnel alive, launching: $*"
    GAP=300
    sleep 5
    R4_DEADLINE_TS="$DEADLINE" "$@"
    rc=$?
    if [ "$rc" -eq 99 ]; then
      # Driver lost the tunnel mid-run (exit 99 = resume protocol; stages
      # are artifact-gated so the relaunch skips everything done). Wait a
      # full recovery interval before probing again.
      echo "$(date +%H:%M:%S) driver lost tunnel (rc=99), resuming probe loop"
      sleep 240
      continue
    fi
    echo "$(date +%H:%M:%S) driver exited rc=$rc, waiter done"
    exit "$rc"
  fi
  sleep "$GAP"
  GAP=$((GAP * 2)); [ "$GAP" -gt "$MAXGAP" ] && GAP=$MAXGAP
done
