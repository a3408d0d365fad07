"""Explicit halo-exchange BP sweep over a device mesh (``shard_map``).

The GSPMD path (``shard.py``) leaves the cross-shard message routing to XLA's
SPMD partitioner, which cannot prove locality of the ``msg_cores[in_edges]``
gather and falls back to all-gathering the message tensor — fine on one host,
fatal for multi-host scaling.  This module is the real distributed backend
(SURVEY.md §2 #28 / §5 "distributed communication backend"; the reference has
nothing — a spinlock vector, ``atomic_vector.jl``):

* **Partition-aligned layout**: nodes are renumbered so each device owns a
  contiguous, equal-size block (BFS partition → low cut); every directed edge
  message μ_{i→j} lives on the device that owns its *destination* j.  All
  messages a node consumes are therefore device-local by construction.
* **Static halo plan**: the only cross-device traffic is delivering each
  freshly produced boundary message μ_{i→j} (computed at owner(i)) to
  owner(j) — and, when damping, fetching the old value back the same route.
  Send/receive index maps are precomputed on the host, padded to the max
  pairwise halo width H, and baked into the jitted sweep.
* **One ``all_to_all`` per sweep** (two with damping) rides ICI/DCN; the
  convergence Δ and Bethe free energy are ``psum``-style reductions on the
  sharded outputs.  Intra-device messages bypass the collective entirely via
  a local scatter.

Exactness: the halo sweep is the same Jacobi update as ``bp.bp_sweep`` —
results match the single-device sweep to machine precision
(``tests/test_halo.py``).
"""
from __future__ import annotations

import dataclasses
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph import Graph
from ..bp import MPBP, _chunk_update_body, _BATCH_MIN_NODES
from ..factors import RecursiveFactorTables
from ..ops import fused_stta
from ..ops.truncation import SVDTrunc
from .partition import partition_nodes

__all__ = ["HaloPlan", "HaloState", "halo_plan", "halo_mpbp", "halo_sweep",
           "halo_beliefs", "halo_bethe_free_energy", "halo_to_mpbp"]


@dataclasses.dataclass(frozen=True, eq=False)  # identity hash: jit-static aux
class HaloPlan:
    """Static (host numpy) partition + routing plan."""
    ndev: int
    Nloc: int            # nodes per device (padded)
    Eloc: int            # edges per device (padded)
    K: int
    part: np.ndarray     # [N] part of each original node
    node_new: np.ndarray  # [N] original -> new (block) node id
    edge_new: np.ndarray  # [E] original edge id -> new global edge id
    node_mask: np.ndarray  # [ndev, Nloc] real-node mask
    in_edges_loc: np.ndarray  # [ndev, Nloc, K] local in-edge ids (pad Eloc)
    in_mask: np.ndarray       # [ndev, Nloc, K]
    degree: np.ndarray        # [ndev, Nloc]
    # halo routing (produce-buffer position = n*K + k on the producing device)
    local_src: np.ndarray     # [ndev, Lh] produce positions staying local
    local_dst: np.ndarray     # [ndev, Lh] local edge ids (pad Eloc)
    send_idx: np.ndarray      # [ndev, ndev, H] produce positions for dev r
    recv_dst: np.ndarray      # [ndev, ndev, H] local edge ids (pad Eloc)
    out_owner_valid: np.ndarray  # [ndev, Nloc, K] slot produces a real edge


def halo_plan(graph: Graph, ndev: int,
              part: np.ndarray | None = None,
              rng: np.random.Generator | None = None) -> HaloPlan:
    """Build the partition-aligned layout + static routing maps."""
    N, E, K = graph.N, graph.E, graph.dmax
    if part is None:
        part = partition_nodes(graph, ndev, rng)
    part = np.asarray(part, dtype=np.int32)
    assert part.shape == (N,) and part.max() < ndev

    # ---- node renumbering: per-part contiguous blocks, padded to Nloc -----
    counts = np.bincount(part, minlength=ndev)
    Nloc = int(counts.max()) if N else 1
    node_new = np.zeros(N, dtype=np.int64)
    rank = np.zeros(ndev, dtype=np.int64)
    for i in range(N):
        p = part[i]
        node_new[i] = p * Nloc + rank[p]
        rank[p] += 1
    node_mask = np.zeros((ndev, Nloc), dtype=bool)
    for p in range(ndev):
        node_mask[p, :counts[p]] = True

    # ---- edge renumbering: owner = part(dst); per-part blocks of Eloc -----
    e_owner = part[graph.edge_dst]
    ecounts = np.bincount(e_owner, minlength=ndev)
    Eloc = int(ecounts.max()) if E else 1
    edge_new = np.zeros(E, dtype=np.int64)
    erank = np.zeros(ndev, dtype=np.int64)
    for e in range(E):  # edge ids are (dst, src)-sorted; order within a part
        p = e_owner[e]  # is inherited, which keeps slot lookups trivial
        edge_new[e] = p * Eloc + erank[p]
        erank[p] += 1

    # ---- per-device in-edge tables (slot order preserved from the graph) --
    in_edges_loc = np.full((ndev, Nloc, K), Eloc, dtype=np.int32)
    in_mask = np.zeros((ndev, Nloc, K), dtype=bool)
    degree = np.zeros((ndev, Nloc), dtype=np.int32)
    for i in range(N):
        p, loc = part[i], node_new[i] % Nloc
        degree[p, loc] = graph.degree[i]
        for s in range(K):
            if graph.in_mask[i, s]:
                e = graph.in_edges[i, s]
                assert e_owner[e] == p
                in_edges_loc[p, loc, s] = edge_new[e] % Eloc
                in_mask[p, loc, s] = True

    # ---- routing of produced out-messages ---------------------------------
    # producer p computes μ_{i→k} at produce position (node_loc * K + slot);
    # the message lives at owner(k).
    out_edges = graph.out_edges  # [N, K] original out-edge ids (pad E)
    out_owner_valid = np.zeros((ndev, Nloc, K), dtype=bool)
    loc_pairs: list[list[tuple[int, int]]] = [[] for _ in range(ndev)]
    halo: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for i in range(N):
        p, loc = part[i], node_new[i] % Nloc
        for s in range(K):
            if not graph.in_mask[i, s]:
                continue
            e_out = out_edges[i, s]
            r = e_owner[e_out]
            pos = loc * K + s
            dst_loc = int(edge_new[e_out] % Eloc)
            out_owner_valid[p, loc, s] = True
            if r == p:
                loc_pairs[p].append((pos, dst_loc))
            else:
                halo.setdefault((p, r), []).append((pos, dst_loc))

    # pad values are one-past-the-end sentinels, always scattered mode="drop"
    Lh = max((len(v) for v in loc_pairs), default=1) or 1
    H = max((len(v) for v in halo.values()), default=1) or 1
    pos_pad = Nloc * K
    local_src = np.full((ndev, Lh), pos_pad, dtype=np.int32)
    local_dst = np.full((ndev, Lh), Eloc, dtype=np.int32)
    for p in range(ndev):
        for j, (pos, dst) in enumerate(loc_pairs[p]):
            local_src[p, j] = pos
            local_dst[p, j] = dst
    send_idx = np.full((ndev, ndev, H), pos_pad, dtype=np.int32)
    recv_dst = np.full((ndev, ndev, H), Eloc, dtype=np.int32)
    for (p, r), pairs in halo.items():
        for j, (pos, dst) in enumerate(pairs):
            send_idx[p, r, j] = pos
            recv_dst[r, p, j] = dst  # aligned: slot j of p's send row r

    return HaloPlan(ndev, Nloc, Eloc, K, part, node_new, edge_new, node_mask,
                    in_edges_loc, in_mask, degree, local_src, local_dst,
                    send_idx, recv_dst, out_owner_valid)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class HaloState:
    """Device-stacked BP state: leading axis = device, sharded over the mesh.

    ``plan``/``mesh``/``periodic`` ride as static aux data."""
    tables: RecursiveFactorTables      # replicated (node axis reordered)
    phi: jax.Array       # [ndev, Nloc, T1, q]
    psi_out: jax.Array   # [ndev, Nloc, K, T1, q, q] (out-edge psi, legs xi,xk)
    msg_cores: jax.Array  # [ndev, Eloc, T1, D, D, q*q]
    msg_logz: jax.Array   # [ndev, Eloc]
    bel_cores: jax.Array  # [ndev, Nloc, T1, D, D, q]
    bel_logz: jax.Array   # [ndev, Nloc]
    f: jax.Array          # [ndev, Nloc]
    idx: tuple            # device-stacked int arrays from the plan
    plan: HaloPlan = dataclasses.field(metadata=dict(static=True))
    mesh: Mesh = dataclasses.field(metadata=dict(static=True))
    periodic: bool = dataclasses.field(default=False,
                                       metadata=dict(static=True))

    def tree_flatten(self):
        return ((self.tables, self.phi, self.psi_out, self.msg_cores,
                 self.msg_logz, self.bel_cores, self.bel_logz, self.f,
                 self.idx),
                (self.plan, self.mesh, self.periodic))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def D(self) -> int:
        return self.msg_cores.shape[3]

    @property
    def q(self) -> int:
        return self.tables.q


def halo_mpbp(bp: MPBP, mesh: Mesh,
              part: np.ndarray | None = None,
              rng: np.random.Generator | None = None) -> HaloState:
    """Partition an (unsharded) :class:`MPBP` onto ``mesh`` (1-D)."""
    assert len(mesh.axis_names) == 1, "halo sweep uses a 1-D mesh"
    ndev = mesh.devices.size
    g = bp.graph
    plan = halo_plan(g, ndev, part, rng)
    N, E, K = g.N, g.E, plan.K
    Nloc, Eloc = plan.Nloc, plan.Eloc
    T1, q, D = bp.T + 1, bp.q, bp.D
    dtype = bp.phi.dtype

    phi_h = np.ones((ndev, Nloc, T1, q), dtype)
    psi = np.asarray(bp.psi)
    psi_out = np.ones((ndev, Nloc, K, T1, q, q), dtype)
    out_edges = g.out_edges
    phi_src = np.asarray(bp.phi)
    for i in range(N):
        p, loc = plan.part[i], plan.node_new[i] % Nloc
        phi_h[p, loc] = phi_src[i]
        for s in range(K):
            if g.in_mask[i, s]:
                psi_out[p, loc, s] = psi[out_edges[i, s]]

    msg_c = np.zeros((ndev, Eloc) + bp.msg_cores.shape[1:], dtype)
    msg_z = np.zeros((ndev, Eloc), dtype)
    src_c = np.asarray(bp.msg_cores)
    src_z = np.asarray(bp.msg_logz)
    for e in range(E):
        ne = plan.edge_new[e]
        msg_c[ne // Eloc, ne % Eloc] = src_c[e]
        msg_z[ne // Eloc, ne % Eloc] = src_z[e]

    # tables: reorder a per-node axis into the new numbering (broadcast stays)
    tb = bp.tables
    if tb.N == 1:
        tb_h = tb
    else:
        perm = np.zeros(ndev * Nloc, dtype=np.int64)  # new -> old (pad: 0)
        perm[plan.node_new] = np.arange(N)
        tb_h = RecursiveFactorTables(
            *(jnp.asarray(np.asarray(x)[perm] if x.shape[0] == N else
              np.asarray(x)) for x in tb.tree_flatten()[0]),
            tb.yy_off, tb.ydims)

    bel_c = np.zeros((ndev, Nloc) + bp.bel_cores.shape[1:], dtype)
    bel_c[:, :, :, 0, 0, :] = 1.0

    idx = (jnp.asarray(plan.in_edges_loc), jnp.asarray(plan.in_mask),
           jnp.asarray(plan.degree), jnp.asarray(plan.local_src),
           jnp.asarray(plan.local_dst), jnp.asarray(plan.send_idx),
           jnp.asarray(plan.recv_dst), jnp.asarray(plan.node_mask))

    state = HaloState(
        tb_h.astype(dtype), jnp.asarray(phi_h), jnp.asarray(psi_out),
        jnp.asarray(msg_c), jnp.asarray(msg_z), jnp.asarray(bel_c),
        jnp.zeros((ndev, Nloc), dtype), jnp.zeros((ndev, Nloc), dtype),
        idx, plan, mesh, bp.periodic)
    return _shard_state(state, mesh)


def _shard_state(state: HaloState, mesh: Mesh) -> HaloState:
    ax = mesh.axis_names[0]
    dev_s = NamedSharding(mesh, P(ax))
    repl = NamedSharding(mesh, P())
    put = lambda x: jax.device_put(x, dev_s)
    return dataclasses.replace(
        state,
        tables=jax.device_put(state.tables, repl),
        phi=put(state.phi), psi_out=put(state.psi_out),
        msg_cores=put(state.msg_cores), msg_logz=put(state.msg_logz),
        bel_cores=put(state.bel_cores), bel_logz=put(state.bel_logz),
        f=put(state.f), idx=jax.tree_util.tree_map(put, state.idx))


def _halo_buckets(plan: HaloPlan, chunk: int | None):
    """Static per-device degree buckets, padded to a common per-device width
    and chunked to ``chunk`` nodes.

    Returns ``[(loc_idx [ndev, Cb], Kb, chunkC)]`` where ``loc_idx`` holds
    local node ids (sentinel ``Nloc`` for padding — gathers are clamped and
    scatters dropped) and ``Cb`` is a multiple of ``chunkC``.  Mirrors
    ``bp._degree_buckets`` (per-node cost tracks d_i, y-axis cropped per
    bucket) with the extra constraint that the SPMD program is identical on
    every device: all devices run the same bucket/chunk sequence.
    """
    ndev, Nloc = plan.ndev, plan.Nloc
    degs = np.where(plan.node_mask, np.maximum(plan.degree, 1), 0)
    distinct = np.unique(degs[degs > 0])
    if len(distinct) == 0:
        return []
    if len(distinct) <= 4:
        bounds = [int(b) for b in distinct]
    else:
        # clamp to the slot width (see bp._degree_buckets)
        bounds = sorted({min(1 << int(np.ceil(np.log2(b))), plan.K)
                         for b in distinct})
    out = []
    lo = 0
    for b in bounds:
        per_dev = [np.nonzero((degs[p] > lo) & (degs[p] <= b))[0]
                   for p in range(ndev)]
        lo = b
        width = max(len(ix) for ix in per_dev)
        if width == 0:
            continue
        chunkC = width if chunk is None else min(chunk, width)
        padded = -(-width // chunkC) * chunkC
        idx = np.full((ndev, padded), Nloc, dtype=np.int32)
        for p, ix in enumerate(per_dev):
            idx[p, :len(ix)] = ix
        out.append((idx, int(b), chunkC))
    return out


@partial(jax.jit, static_argnames=("trunc", "trunc_cav", "Dcav", "damp",
                                   "method", "chunk", "platform"))
def _halo_sweep_jit(state: HaloState, trunc: SVDTrunc,
                    trunc_cav: SVDTrunc | None = None,
                    Dcav: int | None = None, damp: float = 0.0,
                    method: str = "qr", chunk: int | None = None,
                    platform: str | None = None) -> HaloState:
    """One synchronous BP sweep with explicit halo exchange.

    Each device runs the SAME degree-bucketed, chunked node update as the
    single-chip sweep (``bp._chunk_update_body``: batched/fused STTA kernels
    when admitted, vmapped ``_node_update`` otherwise), so per-device peak
    temp is O(chunk · K_b · T1 · D²) — the memory-bounded path the
    N=1e5/D=20 scale target needs — and y-axes are cropped per bucket.  The
    collective structure is unchanged: one ``all_to_all`` delivering exactly
    the cut (two with damping).  ``platform`` must be in the static cache key
    for the same reason as ``bp.bp_sweep``.
    """
    from jax import shard_map

    trunc_cav = trunc if trunc_cav is None else trunc_cav
    plan = state.plan
    mesh, ax = state.mesh, state.mesh.axis_names[0]
    ndev, Nloc, Eloc, K = plan.ndev, plan.Nloc, plan.Eloc, plan.K
    Dm = state.D
    Dcav = Dm if Dcav is None else Dcav
    q = state.q
    tb = state.tables
    tv = tb.time_varying
    yy_off = tb.yy_off
    Yg = tb.Y
    periodic = state.periodic

    key = jax.random.PRNGKey(17)

    # static bucket plan (host): [(loc_idx [ndev, Cb], Kb, chunkC)]
    buckets = _halo_buckets(plan, chunk)
    boffs = np.cumsum([0] + [b[0].shape[1] for b in buckets])
    bidx_all = (np.concatenate([b[0] for b in buckets], axis=1)
                if buckets else np.zeros((ndev, 1), np.int32))

    # per-node vs broadcast decided here (static), not from block shapes
    pernode = tuple(t.shape[0] == ndev * Nloc
                    for t in (tb.Py, tb.Pyp, tb.Pxy, tb.Py0, tb.Pyy))

    def device_fn(msg_c, msg_z, phi, psi_out, py, pyp, pxy,
                  py0, pyy, in_edges, in_mask, deg, local_src, local_dst,
                  send_idx, recv_dst, node_mask, bidx):
        # block shapes: leading device axis of size 1 -> squeeze (broadcast
        # tables keep their size-1 node axis: _chunk_update_body expects it)
        msg_c, msg_z = msg_c[0], msg_z[0]
        phi, psi_out = phi[0], psi_out[0]
        in_edges, in_mask, deg = in_edges[0], in_mask[0], deg[0]
        local_src, local_dst = local_src[0], local_dst[0]
        send_idx, recv_dst = send_idx[0], recv_dst[0]
        node_mask = node_mask[0]
        bidx = bidx[0]
        tbls = [t[0] if pn else t
                for t, pn in zip((py, pyp, pxy, py0, pyy), pernode)]

        if damp > 0.0:
            # fetch current out-edge messages back along the reversed route
            send_back = msg_c[jnp.minimum(recv_dst, Eloc - 1)]
            send_back_z = msg_z[jnp.minimum(recv_dst, Eloc - 1)]
            got = jax.lax.all_to_all(send_back, ax, 0, 0, tiled=True)
            got_z = jax.lax.all_to_all(send_back_z, ax, 0, 0, tiled=True)
            old_flat = jnp.zeros((Nloc * K,) + msg_c.shape[1:], msg_c.dtype)
            old_flat_z = jnp.zeros((Nloc * K,), msg_z.dtype)
            # local part (pad positions are Nloc*K sentinels -> dropped)
            old_flat = old_flat.at[local_src].set(
                msg_c[jnp.minimum(local_dst, Eloc - 1)], mode="drop")
            old_flat_z = old_flat_z.at[local_src].set(
                msg_z[jnp.minimum(local_dst, Eloc - 1)], mode="drop")
            # halo part: got[r, h] corresponds to send_idx[r, h] positions
            old_flat = old_flat.at[send_idx.reshape(-1)].set(
                got.reshape((-1,) + got.shape[2:]), mode="drop")
            old_flat_z = old_flat_z.at[send_idx.reshape(-1)].set(
                got_z.reshape(-1), mode="drop")
            old_c = old_flat.reshape((Nloc, K) + msg_c.shape[1:])
            old_z = old_flat_z.reshape(Nloc, K)
        else:
            old_c = jnp.zeros((Nloc, K) + msg_c.shape[1:], msg_c.dtype)
            old_z = jnp.zeros((Nloc, K), msg_z.dtype)

        # ---- bucketed, chunked per-device node update ---------------------
        prod_c = jnp.zeros((Nloc * K,) + msg_c.shape[1:], msg_c.dtype)
        prod_z = jnp.zeros((Nloc * K,), msg_z.dtype)
        bel_c = jnp.zeros((Nloc,) + state.bel_cores.shape[2:], msg_c.dtype)
        bel_z = jnp.zeros((Nloc,), msg_z.dtype)
        f = jnp.zeros((Nloc,), msg_z.dtype)
        for bi, (idx_h, Kb, chunkC) in enumerate(buckets):
            if tb.ydims is not None:
                Yb = max(1, min(Yg, tb.ydims[min(Kb, len(tb.ydims) - 1)]))
                if yy_off is not None:
                    Yb = max(Yb, yy_off + 1)
            else:
                Yb = Yg
            fused_ok = fused_stta.fused_supported(
                max(Dm, Dcav), max(Dm, Dcav), Yb, q, Dcav, msg_c.dtype)
            use_batched = bool(
                method == "sketch" and not periodic and not tv
                and (yy_off is not None or tb.Pyy.shape[0] == 1)
                and chunkC >= _BATCH_MIN_NODES
                and (fused_ok or _BATCH_MIN_NODES <= 1))
            ids_all = bidx[int(boffs[bi]):int(boffs[bi + 1])]
            for lo in range(0, idx_h.shape[1], chunkC):
                ids = ids_all[lo:lo + chunkC]
                ids_g = jnp.minimum(ids, Nloc - 1)
                valid = ids < Nloc
                in_e = in_edges[ids_g][:, :Kb]
                in_m = in_mask[ids_g][:, :Kb] & valid[:, None]
                gather_e = jnp.minimum(in_e, Eloc - 1)
                mi_c, mi_z = msg_c[gather_e], msg_z[gather_e]
                mo_c, mo_z = old_c[ids_g][:, :Kb], old_z[ids_g][:, :Kb]
                ps, ph, dg = psi_out[ids_g][:, :Kb], phi[ids_g], deg[ids_g]

                def tsel(t, pn):
                    return t[ids_g] if pn else t

                Py_b = tsel(tbls[0], pernode[0])[..., :Yb]
                Pyp_b = tsel(tbls[1], pernode[1])[:, :Kb][..., :Yb]
                Pxy_b = tsel(tbls[2], pernode[2])[:, :Kb][..., :Yb, :, :]
                Py0_b = tsel(tbls[3], pernode[3])[..., :Yb, :]
                Pyy_b = tsel(tbls[4], pernode[4])
                if yy_off is None:
                    Pyy_b = Pyy_b[:, :min(Kb, Pyy_b.shape[1])]
                    Pyy_b = Pyy_b[..., :Yb, :Yb, :Yb, :]
                out_c, out_z, bc, bz, fc = _chunk_update_body(
                    mi_c, mi_z, mo_c, mo_z, ps, in_m, dg, ph,
                    Py_b, Pyp_b, Pxy_b, Py0_b, Pyy_b, key, trunc=trunc,
                    trunc_cav=trunc_cav, Dm=Dm, Dcav=Dcav, damp=damp,
                    method=method, yy_off=yy_off, use_batched=use_batched,
                    periodic=periodic)
                # scatter: produce position = loc*K + slot; pads -> dropped
                pos = jnp.where(
                    in_m, ids[:, None] * K + jnp.arange(Kb)[None, :],
                    Nloc * K)
                nb2, Kb2 = out_c.shape[0], out_c.shape[1]
                prod_c = prod_c.at[pos.reshape(-1)].set(
                    out_c.reshape((nb2 * Kb2,) + out_c.shape[2:]),
                    mode="drop")
                prod_z = prod_z.at[pos.reshape(-1)].set(out_z.reshape(-1),
                                                        mode="drop")
                bel_c = bel_c.at[ids].set(bc, mode="drop")
                bel_z = bel_z.at[ids].set(bz, mode="drop")
                f = f.at[ids].set(fc, mode="drop")

        # ---- deliver: local scatter + one all_to_all for the halo ---------
        new_c = jnp.zeros_like(msg_c).at[local_dst].set(
            prod_c[local_src], mode="drop")
        new_z = jnp.zeros_like(msg_z).at[local_dst].set(
            prod_z[local_src], mode="drop")
        send_c = prod_c[send_idx]             # [ndev, H, ...]
        send_z = prod_z[send_idx]
        recv_c = jax.lax.all_to_all(send_c, ax, 0, 0, tiled=True)
        recv_z = jax.lax.all_to_all(send_z, ax, 0, 0, tiled=True)
        new_c = new_c.at[recv_dst.reshape(-1)].set(
            recv_c.reshape((-1,) + recv_c.shape[2:]), mode="drop")
        new_z = new_z.at[recv_dst.reshape(-1)].set(
            recv_z.reshape(-1), mode="drop")

        f = jnp.where(node_mask, f, 0.0)
        return (new_c[None], new_z[None], bel_c[None], bel_z[None], f[None])

    specs_in = (P(ax), P(ax), P(ax), P(ax),
                *(P(ax) if pn else P() for pn in pernode),
                P(ax), P(ax), P(ax), P(ax), P(ax), P(ax), P(ax), P(ax),
                P(ax))
    specs_out = (P(ax), P(ax), P(ax), P(ax), P(ax))

    # per-node tables: reshape the node axis into (ndev, Nloc) for sharding
    def tbl_arg(t, pn):
        return t.reshape((ndev, Nloc) + t.shape[1:]) if pn else t

    fn = shard_map(device_fn, mesh=mesh, in_specs=specs_in,
                   out_specs=specs_out, check_vma=False)
    (ie, im, dg, ls, ld, si, rd, nm) = state.idx
    new_c, new_z, bel_c, bel_z, f = fn(
        state.msg_cores, state.msg_logz, state.phi, state.psi_out,
        tbl_arg(tb.Py, pernode[0]), tbl_arg(tb.Pyp, pernode[1]),
        tbl_arg(tb.Pxy, pernode[2]), tbl_arg(tb.Py0, pernode[3]),
        tbl_arg(tb.Pyy, pernode[4]), ie, im, dg, ls, ld, si, rd, nm,
        jnp.asarray(bidx_all))
    return dataclasses.replace(state, msg_cores=new_c, msg_logz=new_z,
                               bel_cores=bel_c, bel_logz=bel_z, f=f)


def halo_sweep(state: HaloState, trunc: SVDTrunc,
               trunc_cav: SVDTrunc | None = None, Dcav: int | None = None,
               damp: float = 0.0, method: str = "qr",
               chunk: int | None = None) -> HaloState:
    """One halo-exchange BP sweep — see :func:`_halo_sweep_jit`.

    Un-jitted shim recording the platform the data lives on before tracing,
    so the fused-Pallas admission gates (``ops/fused_stta``) key correctly
    (same contract as ``bp.bp_sweep``)."""
    fused_stta.set_active_platform(state.msg_cores)
    return _halo_sweep_jit(state, trunc, trunc_cav=trunc_cav, Dcav=Dcav,
                           damp=damp, method=method, chunk=chunk,
                           platform=fused_stta._active_platform())


def halo_beliefs(state: HaloState, graph: Graph) -> jax.Array:
    """Single-site marginals in the ORIGINAL node order [N, T1, q]."""
    from ..ops.tensortrain import TensorTrain, marginals
    plan = state.plan
    Nloc = plan.Nloc
    bc = state.bel_cores.reshape((plan.ndev * Nloc,) + state.bel_cores.shape[2:])
    bz = state.bel_logz.reshape(-1)
    m = jax.vmap(lambda c, z: marginals(
        TensorTrain(c, z, (state.q,), state.periodic)))(bc, bz)
    return m[jnp.asarray(plan.node_new)]


def halo_bethe_free_energy(state: HaloState) -> jax.Array:
    return jnp.sum(state.f)


def halo_to_mpbp(state: HaloState, bp_template: MPBP) -> MPBP:
    """Un-permute a halo state back into an ordinary :class:`MPBP` (host
    round-trip) so every observable in ``bp.py`` applies unchanged."""
    plan = state.plan
    g = bp_template.graph
    Eloc, Nloc = plan.Eloc, plan.Nloc
    msg_c = np.asarray(state.msg_cores).reshape(
        (plan.ndev * Eloc,) + state.msg_cores.shape[2:])
    msg_z = np.asarray(state.msg_logz).reshape(-1)
    bel_c = np.asarray(state.bel_cores).reshape(
        (plan.ndev * Nloc,) + state.bel_cores.shape[2:])
    bel_z = np.asarray(state.bel_logz).reshape(-1)
    f = np.asarray(state.f).reshape(-1)
    return dataclasses.replace(
        bp_template,
        msg_cores=jnp.asarray(msg_c[plan.edge_new]),
        msg_logz=jnp.asarray(msg_z[plan.edge_new]),
        bel_cores=jnp.asarray(bel_c[plan.node_new]),
        bel_logz=jnp.asarray(bel_z[plan.node_new]),
        f=jnp.asarray(f[plan.node_new]))
