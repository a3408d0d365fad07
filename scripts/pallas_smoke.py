"""Smoke test: does Pallas compile + run through the axon TPU tunnel?"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print("backend:", jax.default_backend(), jax.devices())

from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kern(x_ref, o_ref, acc):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] = acc[:] + x_ref[0] * (1.0 + 0.01 * t)
    o_ref[0] = acc[:]


@jax.jit
def run(x):
    T, F, L = x.shape
    return pl.pallas_call(
        kern,
        grid=(1, T),
        in_specs=[pl.BlockSpec((1, F, L), lambda i, t: (t, 0, i))],
        out_specs=pl.BlockSpec((1, F, L), lambda i, t: (t, 0, i)),
        out_shape=jax.ShapeDtypeStruct((T, F, L), x.dtype),
        scratch_shapes=[pltpu.VMEM((F, L), jnp.float32)],
    )(x)


x = jnp.asarray(np.random.default_rng(0).standard_normal((15, 16, 128)),
                jnp.float32)
t0 = time.perf_counter()
y = run(x)
got = np.asarray(y)
print("compile+run:", time.perf_counter() - t0)

# reference: running scaled cumsum
ref = np.cumsum(np.asarray(x) * (1.0 + 0.01 * np.arange(15))[:, None, None],
                axis=0)
err = np.abs(got - ref).max()
print("max err:", err)
assert err < 1e-5, err

# cholqr kernel too
from matrixproductbp_tpu.ops.kernels import batched_cholqr, cholqr_reference
A = jnp.asarray(np.random.default_rng(1).standard_normal((4096, 24, 10)),
                jnp.float32)
t0 = time.perf_counter()
Q, R = batched_cholqr(A)
Qh = np.asarray(Q)
print("cholqr compile+run:", time.perf_counter() - t0)
Qr, Rr = cholqr_reference(A)
print("cholqr err:", np.abs(Qh - np.asarray(Qr)).max())
print("PALLAS OK")
