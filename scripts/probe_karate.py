"""Karate-club SIS convergence wall-clock probe (bench phase 3b shape).

Usage: python scripts/probe_karate.py
Respects MPBP_BATCH_MIN (batched-path admission) for A/B runs.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, _ROOT)
import bench
import matrixproductbp_tpu as mp

accel = jax.devices()[0]
t0 = time.perf_counter()
res = bench.karate_converge(accel)
total = time.perf_counter() - t0
print(json.dumps({
    "karate": res, "total_incl_compile_s": round(total, 1),
    "batch_min": os.environ.get("MPBP_BATCH_MIN", "256"),
}), flush=True)
