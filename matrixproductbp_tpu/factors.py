"""Factors as dense probability tables — the TPU-native ``BPFactor`` layer.

The reference defines factors behaviourally: a ``RecursiveBPFactor`` implements
``nstates``, ``prob_y``, ``prob_xy``, ``prob_yy``, ``prob_y0``
(``/root/reference/src/recursive_bp_factor.jl:6-27``) and the BP update calls
them pointwise inside Tullio loops.  On TPU the same information is packed once
into dense tables so the entire update becomes batched einsums:

* ``Py  [N, q, q, Y]``      P(x_i^{t+1} | x_i^t, y, d_i)           (prob_y)
* ``Pyp [N, K, q, q, q, Y]`` P(x' | x, x_k, y_cav, d_i-1, k)       (prob_y_partial,
                              ``recursive_bp_factor.jl:49-54``, precomputed)
* ``Pxy [N, K, Y, q, q]``   P(y_k | x_k, x_i, k)                   (prob_xy)
* ``Pyy [K, Y, Y, Y, q]``   P(y | y_acc, y_new, x_i, d1)           (prob_yy),
                              indexed by d1 = #elements already accumulated
* ``Py0 [N, Y, q]``         init distribution of y                 (prob_y0)

States and y-values are 0-indexed (the reference is 1-based Julia).  All y-axes
are padded to a single global ``Y``; padded entries carry zero probability and
padded neighbor slots are merged with the identity element (``prob_y0``), which
is exact.

The exhaustive-trace "generic" path (reference ``f_bp``, ``bp_core.jl:15-93``)
is realised through the same machinery via ``TraceFactorSpec``: y is the tuple
of neighbor states in positional (mixed-radix) encoding — the table analogue of
``RecursiveTraceFactor`` (``src/test_factors.jl:1-20``), with slot-aware decode
so neighbor-asymmetric factors stay exact.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .graph import Graph

__all__ = [
    "RecursiveFactorTables",
    "FactorSpec",
    "TraceFactorSpec",
    "DampedFactorSpec",
    "RestrictedFactorSpec",
    "build_tables",
    "build_tables_t",
    "transition_probs",
]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RecursiveFactorTables:
    """Dense factor tables; two layouts share one class.

    Time-constant (reference models; the default):
      Py [N, q, q, Y] / Pyp [N, K, q, q, q, Y] / Pxy [N, K, Y, q, q] /
      Pyy [N, K, Y, Y, Y, q] / Py0 [N, Y, q]
    Time-varying (reference ``w[i][t]``, a different factor per time step —
    ``mpbp.jl:3,22``; built by :func:`build_tables_t`): a T1 axis is inserted
    after the slot axes:
      Py [N, T1, q, q, Y] / Pyp [N, K, T1, q, q, q, Y] /
      Pxy [N, K, T1, Y, q, q] / Pyy [N, K, T1, Y, Y, Y, q] / Py0 [N, T1, Y, q]
    Index t governs the transition x^t -> x^{t+1}; entry t = T is used only
    by the periodic wrap (``exact.jl:24-26``).
    """

    Py: jax.Array
    Pyp: jax.Array
    Pxy: jax.Array
    Pyy: jax.Array
    Py0: jax.Array
    # Any leading node axis may be 1 (broadcast) for homogeneous factors.

    #: sum-type y-merge: when not None, ``prob_yy(y, y1, y2) = (y == y1+y2-off)``
    #: (all reference Glauber variants, 0-indexed: ``glauber_bp.jl:44,80,170``)
    #: and the merge runs as a banded Toeplitz contraction — ``Pyy`` is then a
    #: dummy placeholder and is never read by the sweep.
    yy_off: int | None = dataclasses.field(default=None,
                                           metadata=dict(static=True))
    #: ``ydims[d]`` = max nstates over nodes at degree d (reference
    #: ``nstates(w, l)``, ``recursive_bp_factor.jl:6-27``); lets the bucketed
    #: sweep crop the padded y-axis per degree bucket.  None = no cropping.
    ydims: tuple | None = dataclasses.field(default=None,
                                            metadata=dict(static=True))

    def tree_flatten(self):
        return ((self.Py, self.Pyp, self.Pxy, self.Pyy, self.Py0),
                (self.yy_off, self.ydims))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0], aux[1])

    @property
    def time_varying(self) -> bool:
        return self.Py.ndim == 5

    @property
    def q(self) -> int:
        return self.Py.shape[-3]

    @property
    def Y(self) -> int:
        return self.Py.shape[-1]

    @property
    def N(self) -> int:
        return self.Py.shape[0]

    @property
    def K(self) -> int:
        return self.Pxy.shape[1]

    def at_time(self, t: int) -> "RecursiveFactorTables":
        """Time-constant view at step ``t`` (identity for constant tables)."""
        if not self.time_varying:
            return self
        return RecursiveFactorTables(self.Py[:, t], self.Pyp[:, :, t],
                                     self.Pxy[:, :, t], self.Pyy[:, :, t],
                                     self.Py0[:, t], self.yy_off, self.ydims)

    def astype(self, dtype):
        return RecursiveFactorTables(
            *(x.astype(dtype) for x in self.tree_flatten()[0]),
            self.yy_off, self.ydims)


class FactorSpec:
    """Behavioural factor description (host side, 0-indexed states).

    Subclasses implement the reference's five-method interface
    (``recursive_bp_factor.jl:6-27``); ``build_tables`` turns a per-node list
    of specs into dense ``RecursiveFactorTables``.
    """

    q: int
    #: when not None, the factor declares ``prob_yy(y, y1, y2) ==
    #: (y == y1 + y2 - sum_y_offset)`` (0-indexed) — the sum-type structure of
    #: every reference Glauber variant (``glauber_bp.jl:44,80,170``).
    #: ``build_tables`` then skips the dense Pyy and tags the tables so the
    #: sweep merges by banded (Toeplitz) convolution, which is what keeps
    #: high-degree hubs polynomial (BASELINE.md row 4, star-graph anchor).
    sum_y_offset: int | None = None

    def nstates(self, l: int) -> int:
        raise NotImplementedError

    def prob_y(self, xp: int, x: int, y: int, d: int) -> float:
        raise NotImplementedError

    def prob_xy(self, y: int, xk: int, xi: int, k: int) -> float:
        raise NotImplementedError

    def prob_yy(self, y: int, y1: int, y2: int, xi: int, d1: int, d2: int) -> float:
        raise NotImplementedError

    def prob_y0(self, y: int, xi: int) -> float:
        return 1.0 if y == 0 else 0.0

    # optional override: P(x' | x, x_nbrs) used by exact/sampling oracles.
    def w(self, xp: int, x_nbrs: Sequence[int], x: int) -> float:
        d = len(x_nbrs)
        v = np.array([self.prob_y0(y, 0) for y in range(self.nstates(0))])
        for k, xk in enumerate(x_nbrs):
            Y2 = self.nstates(1)
            vn = np.zeros(self.nstates(k + 1))
            for y in range(len(vn)):
                for y2 in range(Y2):
                    pxy = self.prob_xy(y2, xk, x, k)
                    if pxy == 0.0:
                        continue
                    for y1 in range(len(v)):
                        vn[y] += self.prob_yy(y, y1, y2, x, k, 1) * pxy * v[y1]
            v = vn
        return float(sum(self.prob_y(xp, x, y, d) * v[y] for y in range(len(v))))


class TraceFactorSpec(FactorSpec):
    """Exhaustive-trace adapter: y = positional tuple of neighbor states.

    Covers both reference adapters: ``RecursiveTraceFactor`` (any factor into
    recursive form) and — because the decode in ``prob_y``/``prob_y_partial``
    is slot-aware — ``GenericFactor``'s exhaustive path for neighbor-asymmetric
    factors (``test_factors.jl``).  ``fn(xp, x_nbrs, x) -> prob``.
    """

    def __init__(self, fn: Callable, q: int, degree: int):
        self.fn = fn
        self.q = q
        self.degree = degree

    def nstates(self, l: int) -> int:
        return self.q ** l

    def _decode(self, y: int, l: int):
        out = []
        for _ in range(l):
            out.append(y % self.q)
            y //= self.q
        return out  # slot s at digit s (slot 0 least significant)

    def prob_y(self, xp, x, y, d):
        return float(self.fn(xp, self._decode(y, d), x))

    def prob_xy(self, y, xk, xi, k):
        return 1.0 if y == xk else 0.0

    def prob_yy(self, y, y1, y2, xi, d1, d2):
        return 1.0 if y == y1 + y2 * (self.q ** d1) else 0.0

    def prob_y0(self, y, xi):
        return 1.0 if y == 0 else 0.0

    def prob_y_partial(self, xp, x, xk, y1, d, k):
        """Cavity decode: y1 digits are neighbors (0..k-1, k+1..d); insert xk at k."""
        rest = self._decode(y1, d)
        cfg = rest[:k] + [xk] + rest[k:]
        return float(self.fn(xp, cfg, x))

    def w(self, xp, x_nbrs, x):
        return float(self.fn(xp, list(x_nbrs), x))


class RestrictedFactorSpec(FactorSpec):
    """Forces the generic trait fallbacks of an inner spec — the
    ``RestrictedRecursiveBPFactor`` analogue (``test_factors.jl:21-38``).

    Hides ``prob_y_partial`` (so :func:`build_tables` computes ``Pyp`` by the
    explicit sum over (y, y2), ``recursive_bp_factor.jl:49-54``) and the
    ``sum_y_offset`` sum-type tag (so the sweep takes the dense ``Pyy`` merge
    instead of the banded shortcut).  Results must be identical to the
    unwrapped spec — the cross-path gate in ``tests/test_factor_adapters.py``.
    """

    sum_y_offset = None

    def __init__(self, inner: FactorSpec):
        self.inner = inner
        self.q = inner.q

    def nstates(self, l):
        return self.inner.nstates(l)

    def prob_y(self, *a):
        return self.inner.prob_y(*a)

    def prob_xy(self, *a):
        return self.inner.prob_xy(*a)

    def prob_yy(self, *a):
        return self.inner.prob_yy(*a)

    def prob_y0(self, *a):
        return self.inner.prob_y0(*a)

    def w(self, *a):
        return self.inner.w(*a)


class DampedFactorSpec(FactorSpec):
    """Mixes any factor with a lazy self-transition (``DampedFactor``,
    ``recursive_bp_factor.jl:183-206``)."""

    def __init__(self, inner: FactorSpec, p: float):
        assert 0.0 <= p <= 1.0
        self.inner = inner
        self.p = p
        self.q = inner.q

    def nstates(self, l):
        return self.inner.nstates(l)

    def prob_y(self, xp, x, y, d):
        return (1 - self.p) * self.inner.prob_y(xp, x, y, d) + self.p * (xp == x)

    def prob_xy(self, *a):
        return self.inner.prob_xy(*a)

    def prob_yy(self, *a):
        return self.inner.prob_yy(*a)

    def prob_y0(self, *a):
        return self.inner.prob_y0(*a)

    def w(self, xp, x_nbrs, x):
        return (1 - self.p) * self.inner.w(xp, x_nbrs, x) + self.p * (xp == x)


def build_tables(graph: Graph, specs: Sequence[FactorSpec],
                 dtype=np.float64, Y_pad: int | None = None) -> RecursiveFactorTables:
    """Generic (host-side, loop-based) table builder from per-node specs.

    Hot models (SIS/SIRS/Glauber) ship vectorized builders in ``models/``; this
    generic path is the table analogue of the reference's default method
    fallbacks and supports arbitrary factors.  ``Y_pad`` forces a larger y-axis
    (used by :func:`build_tables_t` to keep all time slices stackable).
    """
    N, K = graph.N, graph.dmax
    q = specs[0].q
    deg = graph.degree
    Y = max(
        max((specs[i].nstates(l) for l in range(int(deg[i]) + 1)), default=1)
        for i in range(N)
    )
    Y = max(Y, 1)
    if Y_pad is not None:
        assert Y_pad >= Y, f"Y_pad={Y_pad} < required Y={Y}"
        Y = Y_pad

    # per-degree y-cardinality (for the bucketed sweep's exact Y-cropping)
    ydims = tuple(
        min(Y, max((specs[i].nstates(l) for i in range(N)), default=1))
        for l in range(K + 1))

    # sum-type structure shared by all nodes -> skip the dense Pyy entirely
    # (the sweep merges by banded convolution; a degree-d hub would otherwise
    # need a [d, Y, Y, Y, q] table with Y = nstates(d))
    offs = {s.sum_y_offset for s in specs}
    yy_off = offs.pop() if (len(offs) == 1 and None not in offs) else None

    Py = np.zeros((N, q, q, Y), dtype)
    Pyp = np.zeros((N, K, q, q, q, Y), dtype)
    Pxy = np.zeros((N, K, Y, q, q), dtype)
    Pyy = (np.zeros((1, 1, 1, 1, 1, q), dtype) if yy_off is not None
           else np.zeros((N, max(K, 1), Y, Y, Y, q), dtype))
    Py0 = np.zeros((N, Y, q), dtype)

    for i in range(N):
        s = specs[i]
        # Merge tensor, indexed by d1 = #elements in the *first* argument
        # (so Pyy[i, d1][y, y_first, y_second, xi]); d2 is never used by any
        # reference implementation.
        if yy_off is None:
            for d1 in range(max(K, 1)):
                for y in range(Y):
                    for y1 in range(Y):
                        for y2 in range(Y):
                            for xi in range(q):
                                Pyy[i, d1, y, y1, y2, xi] = \
                                    s.prob_yy(y, y1, y2, xi, d1, 1)
        d = int(deg[i])
        for xi in range(q):
            for y in range(s.nstates(0)):
                Py0[i, y, xi] = s.prob_y0(y, xi)
            for xp in range(q):
                for y in range(s.nstates(d)):
                    Py[i, xp, xi, y] = s.prob_y(xp, xi, y, d)
        for k in range(d):
            for y in range(s.nstates(1)):
                for xk in range(q):
                    for xi in range(q):
                        Pxy[i, k, y, xk, xi] = s.prob_xy(y, xk, xi, k)
        # prob_y_partial: explicit sum (recursive_bp_factor.jl:49-54), or the
        # spec's own slot-aware decode when provided (TraceFactorSpec).
        for k in range(d):
            for xp in range(q):
                for xi in range(q):
                    for xk in range(q):
                        for y1 in range(s.nstates(max(d - 1, 0))):
                            if hasattr(s, "prob_y_partial"):
                                v = s.prob_y_partial(xp, xi, xk, y1, d - 1, k)
                            else:
                                v = sum(
                                    s.prob_y(xp, xi, y, d)
                                    * s.prob_xy(y2, xk, xi, k)
                                    * s.prob_yy(y, y1, y2, xi, d - 1, 1)
                                    for y in range(s.nstates(d))
                                    for y2 in range(s.nstates(1))
                                )
                            Pyp[i, k, xp, xi, xk, y1] = v
    return RecursiveFactorTables(
        jnp.asarray(Py), jnp.asarray(Pyp), jnp.asarray(Pxy),
        jnp.asarray(Pyy), jnp.asarray(Py0), yy_off, ydims,
    )


def build_tables_t(graph: Graph, specs_t: Sequence[Sequence[FactorSpec]],
                   dtype=np.float64) -> RecursiveFactorTables:
    """Time-varying table builder: ``specs_t[i][t]`` is node i's factor for
    the transition x^t -> x^{t+1} (reference ``w[i][t]``, length T+1 per node,
    ``mpbp.jl:22``; the t = T entry only matters in periodic mode).

    Returns tables with the T1 axis layout documented on
    :class:`RecursiveFactorTables`.  If every node's factors are identical
    across time, prefer :func:`build_tables` (cheaper sweep path).
    """
    N = graph.N
    T1 = len(specs_t[0])
    assert all(len(s) == T1 for s in specs_t), "every node needs T+1 factors"
    deg = graph.degree
    Y = max(
        max((specs_t[i][t].nstates(l) for l in range(int(deg[i]) + 1)),
            default=1)
        for i in range(N) for t in range(T1)
    )
    Y = max(Y, 1)
    slices = [build_tables(graph, [specs_t[i][t] for i in range(N)], dtype,
                           Y_pad=Y) for t in range(T1)]
    assert all(s.yy_off == slices[0].yy_off for s in slices), \
        "time-varying factors must share the y-merge structure"
    ydims = tuple(max(s.ydims[d] for s in slices)
                  for d in range(len(slices[0].ydims)))
    return RecursiveFactorTables(
        jnp.stack([s.Py for s in slices], axis=1),
        jnp.stack([s.Pyp for s in slices], axis=2),
        jnp.stack([s.Pxy for s in slices], axis=2),
        jnp.stack([s.Pyy for s in slices], axis=2),
        jnp.stack([s.Py0 for s in slices], axis=1),
        slices[0].yy_off, ydims,
    )


def transition_probs(tables: RecursiveFactorTables, in_mask: jax.Array,
                     x_nbr: jax.Array, x: jax.Array) -> jax.Array:
    """P(x_i^{t+1} | x_nbrs, x_i) for every node — the table analogue of the
    reference's default functor (``recursive_bp_factor.jl:33-46``).

    Used by the exact-enumeration oracle, trajectory log-prob and the sampler.
    x_nbr: i[N, K] padded neighbor states; x: i[N]; returns f[N, q].
    Tables with a broadcast node axis (size 1) are supported.  Time-varying
    tables must be sliced with ``tables.at_time(t)`` by the caller.
    """
    assert not tables.time_varying, "slice time-varying tables with at_time(t)"
    N, K = x_nbr.shape
    q, Y = tables.q, tables.Y
    i_py0 = jnp.arange(N) % tables.Py0.shape[0]
    i_pxy = jnp.arange(N) % tables.Pxy.shape[0]
    i_pyy = jnp.arange(N) % tables.Pyy.shape[0]
    i_py = jnp.arange(N) % tables.Py.shape[0]
    v = jnp.take_along_axis(tables.Py0[i_py0], x[:, None, None],
                            axis=2)[..., 0]                      # [N, Y]
    for k in range(K):
        pxy = tables.Pxy[i_pxy, k]                               # [N, Y, q, q]
        pxy = pxy[jnp.arange(N), :, x_nbr[:, k], x]              # [N, Y]
        if tables.yy_off is not None:
            # sum-type: v2[y] = sum_b v[y + off - b] pxy[b]
            off = tables.yy_off
            iy = jnp.arange(Y)[:, None]
            ib = jnp.arange(Y)[None, :]
            idx = iy + off - ib
            ok = (idx >= 0) & (idx < Y)
            vt = v[:, jnp.clip(idx, 0, Y - 1)] * ok[None]        # [N, Y, Y]
            v2 = jnp.einsum("nyb,nb->ny", vt, pxy)
        else:
            pyy = tables.Pyy[i_pyy,
                             min(k, tables.Pyy.shape[1] - 1)]    # [N,Y,Y,Y,q]
            pyy = pyy[jnp.arange(N), :, :, :, x]                 # [N, Y, Y, Y]
            v2 = jnp.einsum("nyab,na,nb->ny", pyy, v, pxy)
        v = jnp.where(in_mask[:, k][:, None], v2, v)
    Py = tables.Py[i_py, :, x]                                   # [N, q, Y]
    return jnp.einsum("npy,ny->np", Py, v)
