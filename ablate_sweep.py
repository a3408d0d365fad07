"""Ablate one bench-shaped sweep (N=4096 3-regular, T=15, D=10, f32, sketch)
into its stages, timing each as a separate jit on the TPU.

Stages (per sweep, K=3):
  lift      - build B [N, K, T1, D, D, Y*q] from messages (one einsum)
  merge     - one vmapped merge_stta level over N nodes (x4 serial levels)
  pipe      - one vmapped mpem3_stta over N*(K+1) outputs
  norm      - normalize_eachmatrix + normalize over N*K messages
"""
import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from matrixproductbp_tpu.graph import random_regular_graph
from matrixproductbp_tpu.models import SIS, mpbp_sis
from matrixproductbp_tpu.ops.stta import merge_stta, mpem3_stta
from matrixproductbp_tpu.ops.tensortrain import (TensorTrain, normalize,
                                                 normalize_eachmatrix)
import matrixproductbp_tpu as mp

D, T, N, K = 10, 15, 4096, 3
T1 = T + 1
q, Y = 2, 2
dtype = jnp.float32
dev = jax.devices()[0]
res = {}


def fetch(x):
    return float(jnp.sum(x))


def timeit(f, *args, reps=3):
    out = f(*args)
    fetch(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    fetch(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps


rng = np.random.default_rng(0)
g = random_regular_graph(N, 3, rng)
sis = SIS(g, lam=0.2, rho=0.1, T=T, gamma=0.3)
bp = jax.device_put(mpbp_sis(sis, D=D, dtype=dtype), dev)
trunc = mp.TruncBond(D)

# full sweep baseline
res["full_sweep_s"] = timeit(
    lambda b: mp.bp_sweep(b, trunc, method="sketch"), bp)

# ---- lift ------------------------------------------------------------------
ga = bp.garrays
tb = bp.tables


@jax.jit
def lift(bp):
    A = bp.msg_cores[ga.in_edges].reshape(N, K, T1, D, D, q, q)
    psi_out = bp.psi[jnp.minimum(ga.out_edges, bp.graph.E - 1)]
    B = jnp.einsum("kyci,aktic,aktmuci->aktmuyi", tb.Pxy[0], psi_out, A)
    return B


res["lift_s"] = timeit(lift, bp)

# ---- one merge level -------------------------------------------------------
key = jax.random.PRNGKey(17)
Lc = jnp.asarray(rng.standard_normal((N, T1, D, D, Y * q)), dtype)
Rc = jnp.asarray(rng.standard_normal((N, T1, D, D, Y * q)), dtype)
lz = jnp.zeros((N,), dtype)
pyy = tb.Pyy[0, 0]


@jax.jit
def merge_level(Lc, lz, Rc):
    return jax.vmap(lambda a, al, b, bl: merge_stta(a, al, b, bl, pyy, D, Y,
                                                    q, key))(Lc, lz, Rc, lz)


res["merge_level_s"] = timeit(merge_level, Lc, lz, Rc)

# ---- output pipeline -------------------------------------------------------
NB = N * (K + 1)
B3 = jnp.asarray(rng.standard_normal((N, T1, D, D, q, q, q)), dtype)
lzb = jnp.zeros((N,), dtype)


@jax.jit
def pipe(B3, lzb):
    return jax.vmap(lambda b, l: mpem3_stta(b, l, D, key).cores)(B3, lzb)


res["pipe_per_N_s"] = timeit(pipe, B3, lzb)

# ---- normalize -------------------------------------------------------------
mc = bp.msg_cores


@jax.jit
def norm(mc, mlz):
    def one(c, z):
        t = normalize_eachmatrix(TensorTrain(c, z, (q, q)))
        t2, lg = normalize(t)
        return t2.cores, t2.logz

    return jax.vmap(one)(mc, mlz)


res["norm_all_msgs_s"] = timeit(norm, bp.msg_cores, bp.msg_logz)

pred = (res["lift_s"] + 4 * res["merge_level_s"]
        + 4 * res["pipe_per_N_s"] + res["norm_all_msgs_s"])
res["predicted_from_stages_s"] = pred
print("FINAL " + json.dumps(res, indent=1), flush=True)
