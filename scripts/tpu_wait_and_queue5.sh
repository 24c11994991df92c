#!/bin/bash
# Poll the TPU every 10 min; when it answers, run queue5.
cd /root/repo/.tpuwt
export PYTHONPATH=/root/.axon_site:/root/repo/.tpuwt
for i in $(seq 1 60); do
  if timeout 300 python -c "
import jax, jax.numpy as jnp
print(jax.devices(), flush=True)
print(float(jnp.sum(jnp.arange(1024.0))), flush=True)
" > /root/repo/out/tpu_health.log 2>&1; then
    echo "TPU_BACK after $i probes" >> /root/repo/out/tpu_health.log
    bash /root/repo/.tpuwt/scripts/r2_queue5.sh >> /root/repo/out/r2_queue5.log 2>&1
    exit 0
  fi
  sleep 600
done
echo TPU_NEVER_RETURNED >> /root/repo/out/tpu_health.log
