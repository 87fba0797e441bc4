#!/bin/bash
# Probe the axon tunnel (no kill/timeouts — a hung init self-terminates in
# ~25min); when a probe succeeds, run the queued TPU jobs.
cd /root/repo
for i in $(seq 1 100); do
  out=$(python -c "
import numpy as np, jax.numpy as jnp
print('TPU-OK', float(np.asarray(jnp.ones(4).sum())))" 2>&1 | grep TPU-OK)
  if [ -n "$out" ]; then
    echo "tunnel back at $(date): $out"
    bash .scratch/tunnel_return.sh
    exit 0
  fi
  echo "probe $i failed at $(date); sleeping 300s"
  sleep 300
done
echo "gave up"
