#!/bin/bash
# Poll the TPU every 5 min; when it answers, run r3_queue1.
cd /root/repo
for i in $(seq 1 72); do
  if timeout 300 python -c "
import jax, jax.numpy as jnp
print(jax.devices(), flush=True)
print(float(jnp.sum(jnp.arange(1024.0))), flush=True)
" > /root/repo/out/tpu_health.log 2>&1; then
    echo "TPU_BACK after $i probes" >> /root/repo/out/tpu_health.log
    bash /root/repo/scripts/r3_queue1.sh > /root/repo/out/r3_queue1.log 2>&1
    exit 0
  fi
  sleep 300
done
echo TPU_NEVER_RETURNED >> /root/repo/out/tpu_health.log
