"""Software-pipelined (staggered) time scans.

The STTA sweeps (``ops/stta.py``) are ``lax.scan``s over the time axis whose
per-step arithmetic is small-operand einsums.  Measured on TPU v5e (PERF.md):
one *dependent* step costs ~9.4 ms while the same arithmetic executed as an
independent batch costs ~2.4 ms — the chain is latency-bound, not
FLOP-bound, and the cost is nearly batch-size independent below ~1k
instances.

This module removes the dependency bottleneck in pure XLA: split the
instance batch into ``G`` groups and stagger them in time, so scan iteration
``s`` advances group ``g`` to time step ``s - g``.  Each iteration then
contains ``G`` *independent* step-works that XLA fuses into one wave of
larger einsums — per-step latency is amortized ``G``-fold at the cost of
``G - 1`` extra (masked) iterations.  Exactness: every group executes exactly
the original per-step arithmetic on its own instances; gathers/masks only
reroute data, so results equal the plain scan's bit-for-bit up to XLA
reassociation within an einsum.

No reference counterpart (the Julia reference is a sequential per-node loop,
``recursive_bp_factor.jl:146-165``); this is TPU-native scheduling.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["staggered_scan"]


def _index_time(a, t):
    """a: [S, ...] gathered at per-group times t: [G] -> [G, ...]."""
    return jax.vmap(
        lambda tg: jax.lax.dynamic_index_in_dim(a, tg, 0, keepdims=False))(t)


def staggered_scan(step, init, xs_batched, xs_shared, S: int, G: int,
                   reverse: bool = False):
    """Run ``step`` over ``S`` time steps with ``G``-way staggering.

    step(carry, xb, xsh) -> (carry, emit):
        carry / emit:  pytrees of arrays [G, Bg, ...]
        xb:            pytree of arrays [G, Bg, ...]  (batched inputs at the
                       per-group time step)
        xsh:           pytree of arrays [G, ...]      (shared inputs at the
                       per-group time step)
    init:        pytree of arrays [G, Bg, ...]
    xs_batched:  pytree of arrays [S, G, Bg, ...]
    xs_shared:   pytree of arrays [S, ...]
    reverse:     process time steps from S-1 down to 0 (each group still
                 lagged by its index).

    Returns (final_carry [G, Bg, ...], ys [S, G, Bg, ...]) with ``ys[t]`` the
    emission of time step ``t`` (time-aligned regardless of ``reverse``).

    ``G=1`` (or S<=1) falls back to a plain ``lax.scan``.
    """
    if G <= 1 or S <= 1:
        def body(c, xs):
            xb, xsh = xs
            # single group: strip/re-add nothing, shapes already [1, Bg, ...]
            return step(c, xb, xsh)
        xsh1 = jax.tree_util.tree_map(lambda a: a[:, None], xs_shared)
        carry, ys = jax.lax.scan(body, init, (xs_batched, xsh1),
                                 reverse=reverse)
        if reverse:
            pass  # lax.scan already emits time-aligned ys
        return carry, ys

    garange = jnp.arange(G)

    def body(carry, s):
        j = s - garange                           # per-group step counter
        active = (j >= 0) & (j < S)
        jc = jnp.clip(j, 0, S - 1)
        t = (S - 1) - jc if reverse else jc       # per-group time index
        xb = jax.tree_util.tree_map(
            lambda a: jax.vmap(
                lambda ag, tg: jax.lax.dynamic_index_in_dim(
                    ag, tg, 0, keepdims=False),
                in_axes=(1, 0))(a, t),
            xs_batched)                            # [G, Bg, ...]
        xsh = jax.tree_util.tree_map(lambda a: _index_time(a, t), xs_shared)
        new_c, emit = step(carry, xb, xsh)

        def mask(new, old):
            m = active.reshape((G,) + (1,) * (new.ndim - 1))
            return jnp.where(m, new, old)

        new_c = jax.tree_util.tree_map(mask, new_c, carry)
        return new_c, emit

    carry, ys_all = jax.lax.scan(body, init, jnp.arange(S + G - 1))
    # ys_all: [S+G-1, G, Bg, ...]; group g's S emissions sit at rows g..g+S-1
    # in processing order (forward: t = row - g; reverse: t = S-1-(row-g)).

    def recover(a):
        cols = []
        for g in range(G):
            c = a[g:g + S, g]                      # [S, Bg, ...]
            cols.append(c[::-1] if reverse else c)
        return jnp.stack(cols, axis=1)             # [S, G, Bg, ...]

    return carry, jax.tree_util.tree_map(recover, ys_all)
