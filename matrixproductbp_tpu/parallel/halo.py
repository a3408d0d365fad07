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
from ..bp import MPBP, _node_update
from ..factors import RecursiveFactorTables
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


@partial(jax.jit, static_argnames=("trunc", "trunc_cav", "Dcav", "damp",
                                   "method"))
def halo_sweep(state: HaloState, trunc: SVDTrunc,
               trunc_cav: SVDTrunc | None = None, Dcav: int | None = None,
               damp: float = 0.0, method: str = "qr") -> HaloState:
    """One synchronous BP sweep with explicit halo exchange."""
    from jax import shard_map

    trunc_cav = trunc if trunc_cav is None else trunc_cav
    plan = state.plan
    mesh, ax = state.mesh, state.mesh.axis_names[0]
    ndev, Nloc, Eloc, K = plan.ndev, plan.Nloc, plan.Eloc, plan.K
    Dm = state.D
    Dcav = Dm if Dcav is None else Dcav
    q = state.q
    tb = state.tables
    periodic = state.periodic

    key = jax.random.PRNGKey(17)

    # per-node vs broadcast decided here (static), not from block shapes
    pernode = tuple(t.shape[0] == ndev * Nloc
                    for t in (tb.Py, tb.Pyp, tb.Pxy, tb.Py0, tb.Pyy))

    def device_fn(msg_c, msg_z, phi, psi_out, py, pyp, pxy,
                  py0, pyy, in_edges, in_mask, deg, local_src, local_dst,
                  send_idx, recv_dst, node_mask):
        # block shapes: leading device axis of size 1 -> squeeze
        msg_c, msg_z = msg_c[0], msg_z[0]
        phi, psi_out = phi[0], psi_out[0]
        in_edges, in_mask, deg = in_edges[0], in_mask[0], deg[0]
        local_src, local_dst = local_src[0], local_dst[0]
        send_idx, recv_dst = send_idx[0], recv_dst[0]
        node_mask = node_mask[0]

        gather_e = jnp.minimum(in_edges, Eloc - 1)
        msgs_in_c = msg_c[gather_e]           # [Nloc, K, T1, D, D, qq]
        msgs_in_z = msg_z[gather_e]

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

        def node_fn(mi_c, mi_z, mo_c, mo_z, ps, mk, py_, pyp_, pxy_, py0_,
                    ph, dg, pyy_):
            return _node_update(mi_c, mi_z, mo_c, mo_z, ps, mk, py_, pyp_,
                                pxy_, py0_, ph, dg, pyy_, trunc, trunc_cav,
                                Dm, Dcav, damp, periodic, method, key,
                                tb.yy_off, direct_k3=Nloc <= 4096)

        def prep(tbl, pn):
            # per-node block [1, Nloc, ...] -> [Nloc, ...] mapped;
            # broadcast (replicated) [1, ...] -> [...] unmapped
            return (tbl[0], 0) if pn else (tbl[0], None)

        (py_, ax_py) = prep(py, pernode[0])
        (pyp_, ax_pyp) = prep(pyp, pernode[1])
        (pxy_, ax_pxy) = prep(pxy, pernode[2])
        (py0_, ax_py0) = prep(py0, pernode[3])
        (pyy_, ax_pyy) = prep(pyy, pernode[4])
        out_c, out_z, bel_c, bel_z, f = jax.vmap(
            node_fn,
            in_axes=(0, 0, 0, 0, 0, 0, ax_py, ax_pyp, ax_pxy, ax_py0, 0, 0,
                     ax_pyy),
        )(msgs_in_c, msgs_in_z, old_c, old_z, psi_out, in_mask,
          py_, pyp_, pxy_, py0_, phi, deg, pyy_)

        prod_c = out_c.reshape((Nloc * K,) + out_c.shape[2:])
        prod_z = out_z.reshape(Nloc * K)

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
                P(ax), P(ax), P(ax), P(ax), P(ax), P(ax), P(ax), P(ax))
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
        tbl_arg(tb.Pyy, pernode[4]), ie, im, dg, ls, ld, si, rd, nm)
    return dataclasses.replace(state, msg_cores=new_c, msg_logz=new_z,
                               bel_cores=bel_c, bel_logz=bel_z, f=f)


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
