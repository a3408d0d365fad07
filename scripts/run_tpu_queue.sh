#!/bin/bash
# Sequential TPU job queue. slots=512 for the big-N legs: at slots=1024 the
# transient peak (7.5 GiB residents + d*83MB gathers + chunk temps + pending
# segment + repair copy) exceeds HBM at N=3e4 (measured OOM).
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
run n3e4_d10 python scripts/scale_run.py 30000 50 10 512 3
run probe_d10 python scripts/probe_r05.py 10 4096 3
run n1e4_d20 python scripts/scale_run.py 10000 50 20 512 3
run n5e4_d10 python scripts/scale_run.py 50000 50 10 256 3
run n1e4_d10_chunked python scripts/scale_run.py 10000 50 10 2048 3 chunked
