"""Single-chip large-graph sweep on flat 2-D resident state.

Why this module exists (all measured at the BASELINE scale target, SIS ER
N=1e5/T=50/D=10, on a 16 GB v5e chip):

1. The resident per-edge message array at rest is ``[E, T1, D, D, q*q]``;
   XLA's default TPU layout for it is fine (edges on lanes, ~1.0x pad), but
   the per-chunk *gather* executable insists on a T1-minor operand and plans
   a relayout copy of the WHOLE array padded 51->128 x 10->16 — 49 GB at
   N=5e4 — aborting compilation.  Keeping the residents as flat 2-D
   ``[E, cols]`` rows makes every layout XLA can pick pad ~1.0x, so a row
   gather/scatter never plans a catastrophic relayout
   (scripts/probe_layout.py documents the measurements; see
   :func:`_flat_gather_jit` for why the jits carry no layout pins).
2. ``bp_sweep_chunked`` is Jacobi: it double-buffers messages (old + new),
   so its resident set is 2x the message bytes — N=5e4 needs 24.5 GB.  This
   module sweeps *in place* (Gauss–Seidel: chunks read messages already
   updated by earlier chunks this sweep), which matches the reference's
   asynchronous ``iterate!`` semantics (``mpbp.jl:185-198``: threads
   read/write the shared message vector live) and halves residency.
3. Belief TT cores are reduced to their time marginals before storage
   (:class:`FlatState`), dropping another O(N*T1*D^2) resident.

State lives ONLY as flat 2-D rows here; the logical 5-D/6-D views exist
inside the chunk jits.  No reference counterpart: the Julia package's
largest exercised instance is N=5e3/T=15 (``notebooks/glauber_erdos_renyi
.ipynb``); this path exists to reach the 1e5-node scale target on TPU.
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .bp import (_BATCH_MIN_NODES, _chunk_update, _degree_buckets)
from .factors import RecursiveFactorTables
from .graph import Graph
from .ops.tensortrain import TensorTrain, flat_tt, marginals, normalize
from .ops.truncation import SVDTrunc

__all__ = ["FlatState", "flat_init", "bp_sweep_flat", "flat_beliefs",
           "flat_free_energy", "iterate_flat",
           "SegPlan", "SegState", "seg_init", "bp_sweep_seg",
           "seg_beliefs", "seg_free_energy", "iterate_seg"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FlatState:
    """Big-graph sweep state: every O(E)/O(N) array is a flat 2-D (rows x
    cols) or 1-D device buffer, row-major pinned on TPU.

    Belief *marginals* [N, T1*q] are stored instead of belief TT cores —
    they are what the scale workload consumes, and the cores resident
    (N*T1*D^2*q floats, 1.9 GiB at the N=5e4/T=50/D=10 target) is exactly
    the margin by which that instance overflows a 16 GB chip.  Pass
    ``belief_cores=True`` to :func:`flat_init` to also keep the cores
    (moderate N; enables the bit-equality gates vs ``bp_sweep_chunked``).
    """
    msg2: jax.Array       # [E, T1*D*D*q*q]
    msg_logz: jax.Array   # [E]
    marg: jax.Array       # [N, T1*q]  single-site time marginals
    bel_logz: jax.Array   # [N]
    f: jax.Array          # [N]
    bel2: jax.Array | None = None   # [N, T1*D*D*q] (belief_cores=True)


def _fmt(dev, nd):
    """Row-major pinned Format on TPU; None (default layouts) elsewhere —
    CPU/interpret paths don't have the relayout problem and may not accept
    custom layouts."""
    if dev.platform != "tpu":
        return None
    from jax.experimental import layout
    return layout.Format(
        layout.Layout(major_to_minor=tuple(range(nd))),
        jax.sharding.SingleDeviceSharding(dev))


def _put(host_arr, dev):
    f = _fmt(dev, host_arr.ndim)
    return jax.device_put(jnp.asarray(host_arr), f if f is not None else dev)


def flat_init(graph: Graph, tables: RecursiveFactorTables, T: int, D: int,
              dtype=jnp.float32, device=None,
              belief_cores: bool = False) -> FlatState:
    """Flat-initialised state (same init as :func:`bp.mpbp`) built directly
    in the pinned flat layout — the 5-D arrays never exist on device."""
    dev = device if device is not None else jax.devices()[0]
    N, E, q = graph.N, graph.E, tables.q
    T1 = T + 1
    msg = flat_tt(T1, D, (q, q), dtype)
    m, _ = normalize(msg)
    row_m = np.asarray(m.cores, dtype=dtype).reshape(-1)
    bel2 = None
    if belief_cores:
        bel = flat_tt(T1, D, (q,), dtype)
        row_b = np.asarray(bel.cores, dtype=dtype).reshape(-1)
        bel2 = _put(np.broadcast_to(row_b, (N, row_b.size)).copy(), dev)
    return FlatState(
        msg2=_put(np.broadcast_to(row_m, (E, row_m.size)).copy(), dev),
        msg_logz=_put(np.zeros(E, dtype), dev),
        marg=_put(np.full((N, T1 * q), 1.0 / q, dtype), dev),
        bel_logz=_put(np.zeros(N, dtype), dev),
        f=_put(np.zeros(N, dtype), dev),
        bel2=bel2,
    )


# ---------------------------------------------------------------------------
# pinned-layout gather / scatter executables (cached per device)
# ---------------------------------------------------------------------------

_JIT_CACHE: dict = {}


def _dbg_mem(tag, jitted, *args, **kw):
    """MPBP_DEBUG_MEM=1: print the executable's compile-time memory plan."""
    try:
        m = jitted.lower(*args, **kw).compile().memory_analysis()
        print(f"[bigsweep:{tag}] temp={m.temp_size_in_bytes/2**30:.2f}GiB "
              f"arg={m.argument_size_in_bytes/2**30:.2f} "
              f"out={m.output_size_in_bytes/2**30:.2f} "
              f"alias={m.alias_size_in_bytes/2**30:.2f}", flush=True)
    except Exception as e:
        print(f"[bigsweep:{tag}] memory_analysis failed: "
              f"{' '.join(str(e).split())[:200]}", flush=True)


def _flat_gather_jit(dev):
    """Row gather of the resident 2-D arrays.

    Layout note (measured through the axon relay): the executables' OUTPUT
    layout constraints (``out_shardings``, ``with_layout_constraint``) are
    silently dropped — after the first scatter the resident array's
    reported layout flips to XLA's preference — so the jits here carry NO
    layout pins and simply recompile for whatever layout the arrays carry
    (the cache stabilizes after the first chunk).  What makes this safe is
    the 2-D FLAT shape itself: for ``[E, T1*D*D*P]`` a row gather/scatter
    pads ~1.0x in every layout XLA picks, whereas the 5-D logical shape
    admitted a (8,128)-tiled T1-minor relayout of the WHOLE resident array
    padded 4x — 49 GB at the N=5e4 scale shape (scripts/probe_layout.py).
    """
    key = ("gather", dev)
    if key not in _JIT_CACHE:
        def g(m2, lz, rows_in, rows_out):
            return m2[rows_in], lz[rows_in], m2[rows_out], lz[rows_out]
        f2 = _fmt(dev, 2)
        kw = {}
        if f2 is not None:
            # pin the RESIDENT operand's entry layout to the gather
            # emitter's internal want (row-major): the unpinned entry
            # default is col-major and XLA then plans a full-resident
            # relayout copy (11.4 GB at N=5e4) inside the executable.
            sh = jax.sharding.SingleDeviceSharding(dev)
            kw["in_shardings"] = (f2, sh, sh, sh)
        _JIT_CACHE[key] = jax.jit(g, **kw)
    return _JIT_CACHE[key]


def _flat_scatter_jit(dev, nd):
    """Scatter rows into the donated resident buffer.

    2-D values arrive TRANSPOSED ([cols, rows]): XLA's layout preference
    puts dim0 minormost, so a [cols, rows] producer output is byte-identical
    to row-major [rows, cols] — the in-jit ``.T`` is a bitcast, the update
    operand is genuinely row-contiguous, and the scatter aliases the donated
    buffer without flipping its layout.  (With [rows, cols] values the
    producer emits rows-minor bytes and XLA relayouts the WHOLE donated
    buffer to match — measured: every subsequent gather then plans a
    full-resident relayout copy, 2.3 GiB/chunk at N=1e4.)
    """
    key = ("scatter", dev, nd)
    if key not in _JIT_CACHE:
        if nd == 2:
            def s(buf, rows, valsT):
                return buf.at[rows].set(valsT.T, mode="drop")
        else:
            def s(buf, rows, vals):
                return buf.at[rows].set(vals, mode="drop")
        f = _fmt(dev, nd)
        kw = {"donate_argnums": (0,)}
        if f is not None:
            # entry pin == the scatter emitter's internal want (row-major):
            # without it the entry defaults to col-major and the executable
            # contains a full-size relayout copy of the donated buffer
            # (measured: 11.44 GB HLO temp at N=5e4 -> compile OOM).  With
            # matching entry layout the output aliases the donated buffer.
            sh = jax.sharding.SingleDeviceSharding(dev)
            kw["in_shardings"] = (f, sh, sh)
        _JIT_CACHE[key] = jax.jit(s, **kw)
    return _JIT_CACHE[key]


@partial(jax.jit, static_argnames=("trunc", "trunc_cav", "Dm", "Dcav",
                                  "damp", "method", "yy_off", "use_batched",
                                  "K", "T1", "q", "platform", "keep_cores"))
def _chunk_update_flat(g_in2, g_in_lz, g_out2, g_out_lz, in_m, deg, phi_b,
                       Py_b, Pyp_b, Pxy_b, Py0_b, Pyy_b, key, *, trunc,
                       trunc_cav, Dm, Dcav, damp, method, yy_off,
                       use_batched, K, T1, q, platform=None,
                       keep_cores=False):
    """Flat-rows wrapper around :func:`bp._chunk_update`: reshapes the
    gathered 2-D rows to the logical 6-D chunk tensors (chunk-local, cheap),
    runs the shared update body, reduces beliefs to marginals, and flattens
    everything for scatter.  Free dynamics only (psi == all-ones), which is
    the scale workload."""
    nbK = g_in2.shape[0]
    nb = nbK // K
    dtype = g_in2.dtype
    mi = g_in2.reshape(nb, K, T1, Dm, Dm, q * q)
    mo = g_out2.reshape(nb, K, T1, Dm, Dm, q * q)
    psi_out = jnp.ones((nb, K, T1, q, q), dtype)
    out_c, out_lz, bel_c, bel_lz, f = _chunk_update.__wrapped__(
        mi, g_in_lz.reshape(nb, K), mo, g_out_lz.reshape(nb, K), psi_out,
        in_m, deg, phi_b, Py_b, Pyp_b, Pxy_b, Py0_b, Pyy_b, key,
        trunc=trunc, trunc_cav=trunc_cav, Dm=Dm, Dcav=Dcav, damp=damp,
        method=method, yy_off=yy_off, use_batched=use_batched,
        periodic=False, platform=platform)
    marg = jax.vmap(lambda c, z: marginals(TensorTrain(c, z, (q,))))(
        bel_c, bel_lz)
    # 2-D outputs transposed ([cols, rows]) — see _flat_scatter_jit
    bel_rows = bel_c.reshape(nb, -1).T if keep_cores else None
    return (out_c.reshape(nbK, -1).T, out_lz.reshape(-1),
            marg.reshape(nb, -1).T, bel_rows, bel_lz, f)


def bp_sweep_flat(graph: Graph, tables: RecursiveFactorTables,
                  fs: FlatState, trunc: SVDTrunc, T: int, D: int,
                  phi=None, trunc_cav: SVDTrunc | None = None,
                  Dcav: int | None = None, damp: float = 0.0,
                  method: str = "sketch", chunk: int = 1024,
                  jacobi: bool = False) -> FlatState:
    """One in-place (Gauss–Seidel) sweep over all nodes on flat state.

    ``fs``'s buffers are DONATED — the caller must use the returned state.
    ``jacobi=True`` restores :func:`bp.bp_sweep_chunked` semantics (reads
    pre-sweep messages; costs an extra message-array copy) for equivalence
    tests and reproducibility studies; the default matches the reference's
    asynchronous schedule (``mpbp.jl:185-198``).

    ``phi``: host array [N, T1, q] of node reweights (observations), or
    None for free dynamics.
    """
    from .ops import fused_stta
    fused_stta.set_active_platform(fs.msg2)
    platform = fused_stta._active_platform()
    dev = next(iter(fs.msg2.devices()))

    trunc_cav = trunc if trunc_cav is None else trunc_cav
    Dm = D
    Dcav = Dm if Dcav is None else Dcav
    N, E, q = graph.N, graph.E, tables.q
    T1 = T + 1
    tb = tables
    yy_off = tb.yy_off
    Yg = tb.Y
    dtype = fs.msg2.dtype
    key = jax.random.PRNGKey(17)
    if tb.time_varying:
        raise NotImplementedError("bp_sweep_flat: time-varying tables")
    phi_h = (np.ones((1, T1, q), dtype) if phi is None
             else np.asarray(phi, dtype))

    gather = _flat_gather_jit(dev)
    sc2 = _flat_scatter_jit(dev, 2)
    sc1 = _flat_scatter_jit(dev, 1)

    msg2, msg_lz = fs.msg2, fs.msg_logz
    marg_all, bel2, bel_lz, f_all = fs.marg, fs.bel2, fs.bel_logz, fs.f
    if jacobi:
        src2, src_lz = jnp.copy(msg2), jnp.copy(msg_lz)
    else:
        src2, src_lz = msg2, msg_lz

    out_edges_h = graph.out_edges

    def nsel(t, nb):
        return t if t.shape[0] == 1 else t[nb]

    for idx, Kb in _degree_buckets(graph):
        if tb.ydims is not None:
            Yb = max(1, min(Yg, tb.ydims[min(Kb, len(tb.ydims) - 1)]))
            if yy_off is not None:
                Yb = max(Yb, yy_off + 1)
        else:
            Yb = Yg
        # ``chunk`` is a NODE-SLOT budget: the update's temp footprint is
        # ~5 MB per (node, in-edge) slot at T=50/D=10 (measured via
        # MPBP_DEBUG_MEM), so high-degree buckets take proportionally fewer
        # nodes per jit to keep peak HBM flat across buckets.
        nodes_chunk = max(16, chunk // max(1, Kb))
        fused_ok = fused_stta.fused_supported(
            max(Dm, Dcav), max(Dm, Dcav), Yb, q, Dcav, dtype)
        use_batched = bool(
            method == "sketch"
            and (yy_off is not None or tb.Pyy.shape[0] == 1)
            and min(len(idx), nodes_chunk) >= _BATCH_MIN_NODES
            and (fused_ok or _BATCH_MIN_NODES <= 1))

        for lo in range(0, len(idx), nodes_chunk):
            ids = idx[lo:lo + nodes_chunk]
            nb_real = len(ids)
            pad = nodes_chunk - nb_real if len(idx) > nodes_chunk else 0
            ids_g = np.concatenate([ids, np.zeros(pad, ids.dtype)])
            in_e = g_ie = graph.in_edges[ids_g][:, :Kb]
            # the bucket bound Kb may exceed the in_edges width (buckets
            # group degree RANGES); the slice caps at the actual width
            Ke = in_e.shape[1]
            in_m = jnp.asarray(graph.in_mask[ids_g][:, :Kb])
            out_e = out_edges_h[ids_g][:, :Kb].copy()
            if pad:
                out_e[nb_real:] = E
            rows_in = jnp.asarray(g_ie.reshape(-1))
            rows_out = jnp.asarray(np.minimum(out_e, E - 1).reshape(-1))
            nb_j = jnp.asarray(ids_g)
            deg = jnp.asarray(graph.degree[ids_g])

            Py_b = nsel(tb.Py, nb_j)[..., :Yb]
            Pyp_b = nsel(tb.Pyp, nb_j)[:, :Kb][..., :Yb]
            Pxy_b = nsel(tb.Pxy, nb_j)[:, :Kb][..., :Yb, :, :]
            Py0_b = nsel(tb.Py0, nb_j)[..., :Yb, :]
            if yy_off is None:
                Pyy_b = nsel(tb.Pyy, nb_j)[:, :min(Kb, tb.Pyy.shape[1])]
                Pyy_b = Pyy_b[..., :Yb, :Yb, :Yb, :]
            else:
                Pyy_b = nsel(tb.Pyy, nb_j)
            phi_b = jnp.asarray(
                phi_h[ids_g] if phi_h.shape[0] != 1
                else np.broadcast_to(phi_h, (len(ids_g), T1, q)))

            if os.environ.get("MPBP_DEBUG_MEM"):
                _dbg_mem("gather", gather, src2, src_lz, rows_in, rows_out)
                _g2 = jax.ShapeDtypeStruct(
                    (rows_in.size, src2.shape[1]), src2.dtype)
                _g1 = jax.ShapeDtypeStruct((rows_in.size,), src_lz.dtype)
                _dbg_mem("update", _chunk_update_flat, _g2, _g1, _g2, _g1,
                         in_m, deg, phi_b, Py_b, Pyp_b, Pxy_b, Py0_b, Pyy_b,
                         key, trunc=trunc, trunc_cav=trunc_cav, Dm=Dm,
                         Dcav=Dcav, damp=damp, method=method, yy_off=yy_off,
                         use_batched=use_batched, K=Ke, T1=T1, q=q,
                         platform=platform, keep_cores=bel2 is not None)
            gi2, gi_lz, go2, go_lz = gather(src2, src_lz, rows_in, rows_out)
            out2, out_lz, marg_c, bel_c, bel_lz_c, f_c = _chunk_update_flat(
                gi2, gi_lz, go2, go_lz, in_m, deg, phi_b,
                Py_b, Pyp_b, Pxy_b, Py0_b, Pyy_b, key,
                trunc=trunc, trunc_cav=trunc_cav, Dm=Dm, Dcav=Dcav,
                damp=damp, method=method, yy_off=yy_off,
                use_batched=use_batched, K=Ke, T1=T1, q=q,
                platform=platform, keep_cores=bel2 is not None)

            srows = jnp.asarray(out_e.reshape(-1))
            msg2 = sc2(msg2, srows, out2)
            msg_lz = sc1(msg_lz, srows, out_lz)
            if not jacobi:
                src2, src_lz = msg2, msg_lz
            brows = jnp.asarray(
                np.concatenate([ids, np.full(pad, N, ids.dtype)]))
            marg_all = sc2(marg_all, brows, marg_c)
            if bel2 is not None:
                bel2 = sc2(bel2, brows, bel_c)
            bel_lz = sc1(bel_lz, brows, bel_lz_c)
            f_all = sc1(f_all, brows, f_c)
            # drain the dispatch queue: async run-ahead keeps every
            # not-yet-executed chunk's gather outputs AND superseded donated
            # message generations live at once — at 2.3 GiB per generation
            # that ResourceExhausts the chip even though the steady-state
            # fits easily.  A tiny device->host fetch (data-dependent; see
            # CLAUDE.md on the tunnel) bounds run-ahead to one chunk.
            np.asarray(msg_lz[:1]), np.asarray(f_all[:1])

    return FlatState(msg2, msg_lz, marg_all, bel_lz, f_all, bel2)


def flat_beliefs(fs: FlatState, T: int, D: int, q: int) -> np.ndarray:
    """Single-site time marginals [N, T1, q] (stored resident, 40 MB at
    N=1e5 — the belief TT cores are optional, see :class:`FlatState`)."""
    return np.asarray(fs.marg).reshape(fs.marg.shape[0], T + 1, q)


def flat_free_energy(fs: FlatState) -> float:
    """Bethe free energy: sum of per-node contributions (``mpbp.jl:298``)."""
    return float(jnp.sum(fs.f))


def iterate_flat(graph, tables, fs, trunc, T, D, maxiter: int = 50,
                 tol: float = 1e-6, probe: int = 2048, **kw):
    """Sweep until the max-abs belief-marginal change on a fixed probe
    subset of nodes drops below ``tol``.  Returns (fs, n_iters, delta)."""
    nprobe = min(probe, graph.N)
    m_old = None
    for it in range(maxiter):
        fs = bp_sweep_flat(graph, tables, fs, trunc, T, D, **kw)
        m_new = np.asarray(fs.marg[:nprobe])
        if m_old is not None:
            delta = float(np.max(np.abs(m_new - m_old)))
            if delta < tol:
                return fs, it + 1, delta
        m_old = m_new
    return fs, maxiter, float("inf")


# ---------------------------------------------------------------------------
# segment-replacement sweep: the N >= ~3e4 single-chip mode
# ---------------------------------------------------------------------------
#
# Through the axon relay, XLA executables ALWAYS emit big-buffer outputs in
# the layout XLA prefers (edge axis on lanes), output layout constraints are
# silently dropped, and `.at[rows].set` on a resident of this size plans a
# full-buffer copy in every orientation/pin combination we measured
# (scripts/probe_cycle.py).  So at N=5e4 (11.4 GiB messages) the resident
# can neither be scattered into nor round-trip an executable boundary.  The
# segment-replacement design never writes into the resident at all:
#
#   * nodes are ordered by EXACT degree; chunks are fixed node counts of one
#     degree, so every chunk's out-edges are a contiguous, statically-sized
#     row range of a new edge numbering;
#   * messages live as a list of fixed-size SEGMENTS [cols, SEG_ROWS]
#     (per-edge contiguous, layout-pinned at creation via device_put, which
#     the relay honors);
#   * a completed run of chunks REPLACES its segment wholesale (a Python
#     rebind of the concatenated chunk outputs + one bounded device_put
#     relayout) — zero full-resident copies, zero scatters;
#   * reads are a single multi-segment gather executable whose pinned
#     per-edge-contiguous operands gather copy-free (measured temp ~= out).
#
# Schedule: Gauss-Seidel across segments (later chunks read already-replaced
# segments), Jacobi within a segment — on a single-degree-class graph one
# sweep is bit-identical to the synchronous `bp_sweep` (gated in tests).


class SegPlan:
    """Host-side plan: node order, chunking, edge renumbering, per-chunk
    in-edge addressing (segment, local row), segment boundaries."""

    def __init__(self, graph: Graph, slots: int = 1024,
                 seg_rows: int | None = None):
        self.graph = graph
        N, E = graph.N, graph.E
        deg = np.asarray(graph.degree)
        order = np.argsort(deg, kind="stable")
        order = order[deg[order] > 0]          # isolated nodes have no msgs
        self.isolated = np.asarray(deg == 0).nonzero()[0]

        # chunks: fixed node count per exact degree class
        chunks = []                            # (node_ids, d)
        for d in np.unique(deg[order]):
            ids = order[deg[order] == d]
            nc = max(1, slots // int(d))
            for lo in range(0, len(ids), nc):
                chunks.append((ids[lo:lo + nc], int(d)))
        self.chunks = chunks

        # new edge numbering: chunk-major, slot order
        out_edges = np.asarray(graph.out_edges)
        in_edges = np.asarray(graph.in_edges)
        new_of_old = np.full(E, -1, np.int64)
        self.chunk_rows = []                   # rows_c per chunk
        pos = 0
        for ids, d in chunks:
            olds = out_edges[ids][:, :d].reshape(-1)
            new_of_old[olds] = pos + np.arange(olds.size)
            self.chunk_rows.append(olds.size)
            pos += olds.size
        assert pos == E and (new_of_old >= 0).all()

        # segments = consecutive chunks, padded to a fixed row capacity
        target = seg_rows if seg_rows is not None else 8 * slots
        seg_of_chunk, seg_start_chunk = [], [0]
        rows_acc = 0
        for c, r in enumerate(self.chunk_rows):
            if rows_acc + r > target and rows_acc > 0:
                seg_start_chunk.append(c)
                rows_acc = 0
            seg_of_chunk.append(len(seg_start_chunk) - 1)
            rows_acc += r
        self.seg_of_chunk = np.asarray(seg_of_chunk)
        self.S = len(seg_start_chunk)
        self.SEG_ROWS = target

        # global row -> (segment, local row)
        seg_id = np.empty(E, np.int32)
        seg_local = np.empty(E, np.int32)
        local = 0
        cur = 0
        pos = 0
        for c, r in enumerate(self.chunk_rows):
            if self.seg_of_chunk[c] != cur:
                cur = int(self.seg_of_chunk[c])
                local = 0
            seg_id[pos:pos + r] = cur
            seg_local[pos:pos + r] = local + np.arange(r)
            self.chunk_rows[c] = (cur, local, r)   # (seg, local_lo, rows)
            local += r
            pos += r
        assert (seg_local < target).all(), "segment overflow"

        # per-chunk in-edge addressing: idx table [S, L] + slot positions
        self.reads = []
        L = 1
        raw = []
        for ids, d in chunks:
            ine = in_edges[ids][:, :d].reshape(-1)
            nr = new_of_old[ine]
            s, l = seg_id[nr], seg_local[nr]
            per_seg = [l[s == si] for si in range(self.S)]
            L = max(L, max((len(p) for p in per_seg), default=1))
            raw.append((s, l, per_seg))
        self.L = int(L)
        for (s, l, per_seg) in raw:
            idxs = np.zeros((self.S, self.L), np.int32)
            counters = np.zeros(self.S, np.int64)
            slotpos = np.empty(s.size, np.int32)
            for j in range(s.size):
                si = s[j]
                slotpos[j] = si * self.L + counters[si]
                idxs[si, counters[si]] = l[j]
                counters[si] += 1
            self.reads.append((idxs, slotpos))


def _seg_fmt(dev):
    if dev.platform != "tpu":
        return None
    from jax.experimental import layout
    return layout.Format(
        layout.Layout(major_to_minor=(1, 0)),
        jax.sharding.SingleDeviceSharding(dev))


def _seg_repair(arr2, dev):
    """Pin a freshly-produced [cols, SEG_ROWS] segment per-edge-contiguous
    (device_put honors layouts through the relay; executables do not)."""
    f = _seg_fmt(dev)
    return jax.device_put(arr2, f) if f is not None else arr2


class SegState:
    """Mutable big-graph state: message segments + per-chunk node outputs."""

    def __init__(self, plan: SegPlan, segs, seg_lz, marg, bel_lz, f):
        self.plan = plan
        self.segs = segs          # list[S] of [cols, SEG_ROWS]
        self.seg_lz = seg_lz      # list[S] of [SEG_ROWS]
        self.marg = marg          # list[#chunks] of [T1*q, nodes_c] or None
        self.bel_lz = bel_lz      # list[#chunks] of [nodes_c]
        self.f = f                # list[#chunks] of [nodes_c]


def seg_init(plan: SegPlan, tables: RecursiveFactorTables, T: int, D: int,
             dtype=jnp.float32, device=None) -> SegState:
    dev = device if device is not None else jax.devices()[0]
    q = tables.q
    T1 = T + 1
    msg = flat_tt(T1, D, (q, q), dtype)
    m, _ = normalize(msg)
    row = np.asarray(m.cores, dtype=dtype).reshape(-1)
    col = np.broadcast_to(row[:, None], (row.size, plan.SEG_ROWS)).copy()
    segs = [_seg_repair(jnp.asarray(col), dev) for _ in range(plan.S)]
    seg_lz = [jnp.zeros(plan.SEG_ROWS, dtype) for _ in range(plan.S)]
    nch = len(plan.chunks)
    return SegState(plan, segs, seg_lz, [None] * nch, [None] * nch,
                    [None] * nch)


def _mg_jit(dev, S):
    key = ("mg", dev, S)
    if key not in _JIT_CACHE:
        def mg(idxs, pos, *args):
            segs, lzs = args[:S], args[S:]
            parts = [seg[:, idxs[s]] for s, seg in enumerate(segs)]
            allc = jnp.concatenate(parts, axis=1)          # [C, S*L]
            lz = jnp.concatenate([z[idxs[s]] for s, z in enumerate(lzs)])
            return allc[:, pos], lz[pos]
        f = _seg_fmt(dev)
        kw = {}
        if f is not None:
            sh = jax.sharding.SingleDeviceSharding(dev)
            kw["in_shardings"] = (sh, sh) + (f,) * S + (sh,) * S
        _JIT_CACHE[key] = jax.jit(mg, **kw)
    return _JIT_CACHE[key]


def _assemble_jit(dev, n):
    key = ("asm", dev, n)
    if key not in _JIT_CACHE:
        def asm(pad_to, *parts):
            cols = jnp.concatenate(parts, axis=1)
            pad = pad_to - cols.shape[1]
            return jnp.pad(cols, ((0, 0), (0, pad)))
        _JIT_CACHE[key] = jax.jit(asm, static_argnums=(0,))
    return _JIT_CACHE[key]


def bp_sweep_seg(tables: RecursiveFactorTables, st: SegState, trunc,
                 T: int, D: int, phi=None,
                 trunc_cav=None, Dcav: int | None = None,
                 method: str = "sketch") -> SegState:
    """One segment-replacement sweep (Seidel across segments, Jacobi within).
    Replaces ``st``'s contents in place and returns it.  damp/psi/periodic
    are not supported on this path (free-dynamics scale workload)."""
    from .ops import fused_stta
    plan = st.plan
    graph = plan.graph
    dev = next(iter(st.segs[0].devices()))
    fused_stta.set_active_platform(st.segs[0])
    platform = fused_stta._active_platform()
    trunc_cav = trunc if trunc_cav is None else trunc_cav
    Dm = D
    Dcav = Dm if Dcav is None else Dcav
    q = tables.q
    T1 = T + 1
    tb = tables
    yy_off = tb.yy_off
    Yg = tb.Y
    dtype = st.segs[0].dtype
    key = jax.random.PRNGKey(17)
    if tb.time_varying:
        raise NotImplementedError("bp_sweep_seg: time-varying tables")
    phi_h = (np.ones((1, T1, q), dtype) if phi is None
             else np.asarray(phi, dtype))
    mg = _mg_jit(dev, plan.S)

    def nsel(t, nb):
        return t if t.shape[0] == 1 else t[nb]

    pending = []           # (seg, local_lo, rows, out2T, out_lz)
    cur_seg = 0

    def flush(seg_idx):
        nonlocal pending
        if not pending:
            return
        parts = [p[3] for p in pending]
        lzs = [p[4] for p in pending]
        asm = _assemble_jit(dev, len(parts))
        new = asm(plan.SEG_ROWS, *parts)
        newlz = jnp.pad(jnp.concatenate(lzs),
                        (0, plan.SEG_ROWS - sum(p[2] for p in pending)))
        st.segs[seg_idx] = _seg_repair(new, dev)
        st.seg_lz[seg_idx] = newlz
        pending = []
        # drain the dispatch queue (bounded run-ahead; see bp_sweep_flat)
        np.asarray(st.seg_lz[seg_idx][:1])

    for c, (ids, d) in enumerate(plan.chunks):
        seg_idx = int(plan.seg_of_chunk[c])
        if seg_idx != cur_seg:
            flush(cur_seg)
            cur_seg = seg_idx
        idxs, slotpos = plan.reads[c]
        gT, glz = mg(jnp.asarray(idxs), jnp.asarray(slotpos),
                     *st.segs, *st.seg_lz)

        nb = len(ids)
        if tb.ydims is not None:
            Yb = max(1, min(Yg, tb.ydims[min(d, len(tb.ydims) - 1)]))
            if yy_off is not None:
                Yb = max(Yb, yy_off + 1)
        else:
            Yb = Yg
        fused_ok = fused_stta.fused_supported(
            max(Dm, Dcav), max(Dm, Dcav), Yb, q, Dcav, dtype)
        use_batched = bool(
            method == "sketch"
            and (yy_off is not None or tb.Pyy.shape[0] == 1)
            and nb >= _BATCH_MIN_NODES
            and (fused_ok or _BATCH_MIN_NODES <= 1))
        nb_j = jnp.asarray(ids)
        Py_b = nsel(tb.Py, nb_j)[..., :Yb]
        Pyp_b = nsel(tb.Pyp, nb_j)[:, :d][..., :Yb]
        Pxy_b = nsel(tb.Pxy, nb_j)[:, :d][..., :Yb, :, :]
        Py0_b = nsel(tb.Py0, nb_j)[..., :Yb, :]
        if yy_off is None:
            Pyy_b = nsel(tb.Pyy, nb_j)[:, :min(d, tb.Pyy.shape[1])]
            Pyy_b = Pyy_b[..., :Yb, :Yb, :Yb, :]
        else:
            Pyy_b = nsel(tb.Pyy, nb_j)
        phi_b = jnp.asarray(
            phi_h[ids] if phi_h.shape[0] != 1
            else np.broadcast_to(phi_h, (nb, T1, q)))
        in_m = jnp.ones((nb, d), bool)
        degv = jnp.full((nb,), d, jnp.int32)

        out2T, out_lz, marg_c, _, bel_lz_c, f_c = _chunk_update_seg(
            gT, glz, in_m, degv, phi_b, Py_b, Pyp_b, Pxy_b, Py0_b, Pyy_b,
            key, trunc=trunc, trunc_cav=trunc_cav, Dm=Dm, Dcav=Dcav,
            method=method, yy_off=yy_off, use_batched=use_batched, K=d,
            T1=T1, q=q, platform=platform)
        seg, lo, rows = plan.chunk_rows[c]
        pending.append((seg, lo, rows, out2T, out_lz))
        st.marg[c] = marg_c
        st.bel_lz[c] = bel_lz_c
        st.f[c] = f_c
    flush(cur_seg)
    return st


@partial(jax.jit, static_argnames=("trunc", "trunc_cav", "Dm", "Dcav",
                                  "method", "yy_off", "use_batched",
                                  "K", "T1", "q", "platform"))
def _chunk_update_seg(gT, glz, in_m, deg, phi_b, Py_b, Pyp_b, Pxy_b, Py0_b,
                      Pyy_b, key, *, trunc, trunc_cav, Dm, Dcav, method,
                      yy_off, use_batched, K, T1, q, platform=None):
    """Segment-mode chunk update: input arrives column-major ([cols, nbK]);
    no out-old gather (damping unsupported here)."""
    g2 = gT.T
    nbK = g2.shape[0]
    nb = nbK // K
    dtype = g2.dtype
    mi = g2.reshape(nb, K, T1, Dm, Dm, q * q)
    psi_out = jnp.ones((nb, K, T1, q, q), dtype)
    out_c, out_lz, bel_c, bel_lz, f = _chunk_update.__wrapped__(
        mi, glz.reshape(nb, K), mi, glz.reshape(nb, K), psi_out,
        in_m, deg, phi_b, Py_b, Pyp_b, Pxy_b, Py0_b, Pyy_b, key,
        trunc=trunc, trunc_cav=trunc_cav, Dm=Dm, Dcav=Dcav, damp=0.0,
        method=method, yy_off=yy_off, use_batched=use_batched,
        periodic=False, platform=platform)
    marg = jax.vmap(lambda c, z: marginals(TensorTrain(c, z, (q,))))(
        bel_c, bel_lz)
    return (out_c.reshape(nbK, -1).T, out_lz.reshape(-1),
            marg.reshape(nb, -1).T, None, bel_lz, f)


def seg_beliefs(st: SegState, T: int, q: int) -> np.ndarray:
    """[N, T1, q] marginals assembled from the per-chunk outputs (isolated
    nodes keep the uniform prior)."""
    plan = st.plan
    N = plan.graph.N
    T1 = T + 1
    dtype = np.dtype(st.segs[0].dtype) if st.segs else np.float32
    out = np.full((N, T1, q), 1.0 / q, dtype)
    for (ids, d), m in zip(plan.chunks, st.marg):
        if m is not None:
            out[ids] = np.asarray(m).T.reshape(len(ids), T1, q)
    return out


def seg_free_energy(st: SegState) -> float:
    return float(sum(float(jnp.sum(f)) for f in st.f if f is not None))


def iterate_seg(tables, st: SegState, trunc, T, D, maxiter: int = 50,
                tol: float = 1e-6, probe_chunks: int = 8, **kw):
    """Sweep to convergence on the belief marginals of a probe subset of
    chunks (evenly spread across the chunk list)."""
    nch = len(st.plan.chunks)
    sel = list(range(0, nch, max(1, nch // max(1, probe_chunks))))
    m_old = None
    for it in range(maxiter):
        st = bp_sweep_seg(tables, st, trunc, T, D, **kw)
        m_new = np.concatenate(
            [np.asarray(st.marg[c]).reshape(-1) for c in sel])
        if m_old is not None:
            delta = float(np.max(np.abs(m_new - m_old)))
            if delta < tol:
                return st, it + 1, delta
        m_old = m_new
    return st, maxiter, float("inf")
