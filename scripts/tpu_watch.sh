#!/bin/bash
# TPU recovery watcher: probe the axon tunnel every 5 min; on recovery run
# the measurement queue and exit.  Logs under tpu_runs/.  Started detached
# (setsid) so it survives shell exits; PID in tpu_runs/watch.pid.
cd /root/repo || exit 1
mkdir -p tpu_runs
echo $$ > tpu_runs/watch.pid
while true; do
  if timeout 150 python -c 'import jax, numpy as np, jax.numpy as jnp; x=jnp.ones((128,128)); assert float(np.asarray((x@x).sum())) == 128.0*128*128' >/dev/null 2>&1; then
    echo "$(date -u) TUNNEL UP - running queue" >> tpu_runs/watch.log
    timeout 2400 python bench.py > tpu_runs/bench_stdout.txt 2> tpu_runs/bench_stderr.txt
    echo "$(date -u) bench done rc=$?" >> tpu_runs/watch.log
    timeout 2400 python scripts/accuracy_tpu.py > tpu_runs/accuracy_tpu.txt 2>&1
    echo "$(date -u) accuracy done rc=$?" >> tpu_runs/watch.log
    timeout 1500 python scripts/trace_backend.py > tpu_runs/trace_backend.txt 2>&1
    echo "$(date -u) trace backend done rc=$?" >> tpu_runs/watch.log
    DYNO_BENCH_SKIP_PIPELINE=1 DYNO_BENCH_BATCH=8 timeout 1500 python bench.py > tpu_runs/bench_batch.txt 2>&1
    echo "$(date -u) QUEUE DONE" >> tpu_runs/watch.log
    break
  fi
  echo "$(date -u) tunnel down" >> tpu_runs/watch.log
  sleep 300
done
