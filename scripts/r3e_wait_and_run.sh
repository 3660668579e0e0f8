#!/bin/bash
# Wait for the axon TPU tunnel to recover, then run the r3e batched driver.
# Probes are STRICTLY SERIAL (one client at a time, generous gaps) per the
# CLAUDE.md tunnel rules; the whole loop + driver is one process tree so a
# single `kill -- -<pgid>` stops everything.
cd /root/repo
for i in $(seq 1 60); do
  echo "$(date +%H:%M:%S) probe $i" >> /tmp/r3e_wait.log
  if timeout 150 python -u -c "
import jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
x = jax.jit(lambda a: a @ a)(jnp.eye(8))
assert float(x.sum()) == 8.0
print('smoke ok', flush=True)
" >> /tmp/r3e_wait.log 2>&1; then
    echo "$(date +%H:%M:%S) tunnel recovered, launching driver" >> /tmp/r3e_wait.log
    sleep 5
    exec python -u scripts/r3e_driver.py > /tmp/r3e.log 2>&1
  fi
  sleep 300
done
echo "$(date +%H:%M:%S) giving up after 60 probes" >> /tmp/r3e_wait.log
