"""Probe TPU layouts for the scale-path buffers (no big allocations).

AOT-lowers the chunked-sweep executables at the BASELINE scale shapes with
ShapeDtypeStructs and prints compile-time memory analysis, so layout bugs
(e.g. a 49 GB relayout copy of the resident message array) are caught in
minutes without touching HBM.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import layout

# 1) at-rest layout of a message-array-shaped buffer
x = jnp.zeros((1000, 51, 10, 10, 4), jnp.float32)
print("at-rest format:", x.format)

# 2) default-jit gather at scale shapes: does it plan a relayout copy?
E, T1, D, P = 150_000, 51, 10, 4
CH = 2048 * 4
mc = jax.ShapeDtypeStruct((E, T1, D, D, P), jnp.float32)
ml = jax.ShapeDtypeStruct((E,), jnp.float32)
ps = jax.ShapeDtypeStruct((E, T1, 2, 2), jnp.float32)
ie = jax.ShapeDtypeStruct((CH // 4, 4), jnp.int32)


def gather(msg_cores, msg_logz, psi, in_e, out_idx):
    return (msg_cores[in_e], msg_logz[in_e], msg_cores[out_idx],
            msg_logz[out_idx], psi[out_idx])


def report(tag, jitted):
    try:
        c = jitted.lower(mc, ml, ps, ie, ie).compile()
        m = c.memory_analysis()
        print(tag, "temp_bytes=%.2fGB" % (m.temp_size_in_bytes / 2**30),
              "argument=%.2fGB" % (m.argument_size_in_bytes / 2**30),
              "output=%.2fGB" % (m.output_size_in_bytes / 2**30))
    except Exception as e:
        print(tag, "FAILED:", str(e))


report("default-jit gather:", jax.jit(gather))

dev = jax.devices()[0]
sh = jax.sharding.SingleDeviceSharding(dev)


def atrest(nd):
    """at-rest TPU layout observed above: leading axis minormost."""
    return layout.Format(
        layout.Layout(major_to_minor=tuple(range(1, nd)) + (0,)), sh)


report("pinned-atrest gather:",
       jax.jit(gather,
               in_shardings=(atrest(5), atrest(1), atrest(4), atrest(2),
                             atrest(2))))


def rowmajor(nd):
    return layout.Format(layout.Layout(major_to_minor=tuple(range(nd))), sh)


report("pinned-rowmajor gather:",
       jax.jit(gather,
               in_shardings=(rowmajor(5), rowmajor(1), rowmajor(4),
                             rowmajor(2), rowmajor(2))))


# 3) flat-2D gather: rows of [E, T1*D*D*P] — natural row gather
mc2 = jax.ShapeDtypeStruct((E, T1 * D * D * P), jnp.float32)
ps2 = jax.ShapeDtypeStruct((E, T1 * 4), jnp.float32)
iflat = jax.ShapeDtypeStruct((CH,), jnp.int32)


def gather2d(msg2, msg_logz, psi2, in_e, out_idx):
    return (msg2[in_e], msg_logz[in_e], msg2[out_idx], msg_logz[out_idx],
            psi2[out_idx])


def report2(tag, jitted):
    try:
        c = jitted.lower(mc2, ml, ps2, iflat, iflat).compile()
        m = c.memory_analysis()
        print(tag, "temp=%.2fGB" % (m.temp_size_in_bytes / 2**30),
              "arg=%.2fGB" % (m.argument_size_in_bytes / 2**30),
              "out=%.2fGB" % (m.output_size_in_bytes / 2**30))
    except Exception as e:
        print(tag, "FAILED:", str(e)[-1500:])


report2("flat2d gather:", jax.jit(gather2d))

# 4) is the 5D->2D reshape of the resident array a bitcast (no temp)?
def flatten5(m5):
    return m5.reshape(E, -1)

try:
    c = jax.jit(flatten5).lower(mc).compile()
    m = c.memory_analysis()
    print("flatten5 reshape:", "temp=%.2fGB" % (m.temp_size_in_bytes / 2**30),
          "out=%.2fGB" % (m.output_size_in_bytes / 2**30))
except Exception as e:
    print("flatten5 FAILED:", str(e)[-1500:])
