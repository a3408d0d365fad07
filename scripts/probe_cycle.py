"""Enumerate gather/scatter layout variants at the N=5e4 scale shape and
find a cycle-consistent combination: scatter exit layout == gather entry
layout, with no full-resident relayout temps in either executable."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from jax.experimental import layout

dev = jax.devices()[0]
sh = jax.sharding.SingleDeviceSharding(dev)
E, C, R = 150_000, 20400, 1024


def fmt(mm):
    return layout.Format(layout.Layout(major_to_minor=mm), sh)


def report(tag, jitted, *sds):
    try:
        c = jitted.lower(*sds).compile()
        m = c.memory_analysis()
        of = c.output_formats
        if isinstance(of, (list, tuple)):
            out_l = [str(f.layout.major_to_minor) for f in jax.tree.leaves(of)]
        else:
            out_l = str(of.layout.major_to_minor)
        print(f"{tag}: temp={m.temp_size_in_bytes/2**30:.2f}GiB "
              f"alias={m.alias_size_in_bytes/2**30:.2f} out={out_l}",
              flush=True)
    except Exception as e:
        s = str(e)
        i = max(s.find('Ran out'), s.find('would exceed'))
        print(f"{tag}: FAILED {s[i:i+90] if i>=0 else s[:90]}", flush=True)


rows = jax.ShapeDtypeStruct((R,), jnp.int32)

# ---- [E, C] orientation -----------------------------------------------------
buf = jax.ShapeDtypeStruct((E, C), jnp.float32)
valsT = jax.ShapeDtypeStruct((C, R), jnp.float32)
vals = jax.ShapeDtypeStruct((R, C), jnp.float32)

def g_row(m2, r):
    return m2[r]

def s_rowT(b, r, vT):
    return b.at[r].set(vT.T, mode="drop")

def s_row(b, r, v):
    return b.at[r].set(v, mode="drop")

for name, mm in [("rowmajor(0,1)", (0, 1)), ("colmajor(1,0)", (1, 0))]:
    report(f"[E,C] gather entry={name}",
           jax.jit(g_row, in_shardings=(fmt(mm), sh)), buf, rows)
    report(f"[E,C] scatter(valsT) entry={name}",
           jax.jit(s_rowT, donate_argnums=(0,),
                   in_shardings=(fmt(mm), sh, None)), buf, rows, valsT)
    report(f"[E,C] scatter(vals) entry={name}",
           jax.jit(s_row, donate_argnums=(0,),
                   in_shardings=(fmt(mm), sh, None)), buf, rows, vals)
report("[E,C] gather entry=unpinned", jax.jit(g_row), buf, rows)
report("[E,C] scatter(valsT) entry=unpinned",
       jax.jit(s_rowT, donate_argnums=(0,)), buf, rows, valsT)

# ---- [C, E] orientation -----------------------------------------------------
bufT = jax.ShapeDtypeStruct((C, E), jnp.float32)

def g_col(mT, r):
    return mT[:, r]

def s_col(bT, r, vT):
    return bT.at[:, r].set(vT, mode="drop")

for name, mm in [("rowmajor(0,1)", (0, 1)), ("colmajor(1,0)", (1, 0))]:
    report(f"[C,E] gather entry={name}",
           jax.jit(g_col, in_shardings=(fmt(mm), sh)), bufT, rows)
    report(f"[C,E] scatter entry={name}",
           jax.jit(s_col, donate_argnums=(0,),
                   in_shardings=(fmt(mm), sh, None)), bufT, rows, valsT)
report("[C,E] gather entry=unpinned", jax.jit(g_col), bufT, rows)
report("[C,E] scatter entry=unpinned",
       jax.jit(s_col, donate_argnums=(0,)), bufT, rows, valsT)
