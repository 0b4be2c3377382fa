#!/bin/bash
# Ping the tunneled TPU until it answers, then run the queued round-2
# validation pipeline in order: smoke suite -> speculation ablation ->
# full bench.  One log per stage under /tmp/tpu_queue/.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/tpu_queue
cd /root/repo
ok=0
for i in $(seq 1 60); do
  if timeout 500 python -u -c "
import time, jax, jax.numpy as jnp
t=time.time()
jax.device_get(jnp.zeros((1,)))
print('TPU-HEALTHY warmup', int(time.time()-t), 's', flush=True)
" > /tmp/tpu_queue/ping.log 2>&1; then
    echo "healthy at $(date +%H:%M) (attempt $i)"
    ok=1
    break
  fi
  echo "attempt $i failed $(date +%H:%M)"
  sleep 180
done
[ "$ok" = 1 ] || { echo "GAVE UP"; exit 1; }
echo "== stage 1: tpu_smoke =="
timeout 2400 python -u scripts/tpu_smoke.py > /tmp/tpu_queue/smoke.log 2>&1
echo "smoke exit $? : $(tail -1 /tmp/tpu_queue/smoke.log)"
echo "== stage 2: batch22 speculation ablation =="
timeout 3500 python -u scripts/tpu_batch22.py > /tmp/tpu_queue/batch22.log 2>&1
echo "batch22 exit $?"
tail -5 /tmp/tpu_queue/batch22.log
echo "== stage 3: bench =="
timeout 3500 python -u bench.py > /tmp/tpu_queue/bench.log 2>&1
echo "bench exit $?"
tail -8 /tmp/tpu_queue/bench.log
echo "== ALL DONE =="
