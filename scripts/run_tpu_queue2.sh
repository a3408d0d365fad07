#!/bin/bash
cd /root/repo
export XLA_PYTHON_CLIENT_MEM_FRACTION=0.92
run() {
  name=$1; shift
  echo "=== START $name $(date)" >> scale_logs/queue.log
  "$@" > "scale_logs/$name.log" 2>&1 || {
    echo "=== RETRY $name $(date)" >> scale_logs/queue.log
    "$@" >> "scale_logs/$name.log" 2>&1
  }
  echo "=== DONE $name $(date)" >> scale_logs/queue.log
}
run bench_full python bench.py
run n1e4_d20_s256 python scripts/scale_run.py 10000 50 20 256 3
run karate_b32 env MPBP_BATCH_MIN=32 python scripts/probe_karate.py
