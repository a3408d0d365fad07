"""Explicit halo-exchange sweep (shard_map + all_to_all): must reproduce the
single-device sweep exactly on the 8-virtual-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import matrixproductbp_tpu as mp
from matrixproductbp_tpu.models import SIS, mpbp_sis
from matrixproductbp_tpu.models.sis_heterogeneous import (
    SISHeterogeneous, mpbp_sis_heterogeneous)
from matrixproductbp_tpu.parallel import (halo_mpbp, halo_sweep, halo_beliefs,
                                          halo_bethe_free_energy, halo_to_mpbp)


def _mesh(ndev):
    return Mesh(np.array(jax.devices()[:ndev]), ("p",))


def test_halo_matches_single_device():
    rng = np.random.default_rng(2)
    g = mp.random_regular_graph(24, 3, rng)
    sis = SIS(g, lam=0.3, rho=0.2, T=4, gamma=0.3)

    bp0 = mpbp_sis(sis, D=8)
    ref = bp0
    for _ in range(5):
        ref = mp.bp_sweep(ref, mp.TruncBond(8))
    b_ref = np.asarray(mp.beliefs(ref))
    f_ref = float(mp.bethe_free_energy(ref))

    st = halo_mpbp(mpbp_sis(sis, D=8), _mesh(8))
    for _ in range(5):
        st = halo_sweep(st, mp.TruncBond(8))
    b = np.asarray(halo_beliefs(st, g))[:, :, :]
    assert np.allclose(b_ref, b, atol=1e-9), np.abs(b_ref - b).max()
    assert np.isclose(f_ref, float(halo_bethe_free_energy(st)), atol=1e-8)

    # full observable parity through the round-trip
    bp_rt = halo_to_mpbp(st, bp0)
    pb_ref, lz_ref = mp.pair_beliefs(ref)
    pb, lz = mp.pair_beliefs(bp_rt)
    assert np.allclose(np.asarray(pb_ref), np.asarray(pb), atol=1e-9)
    assert np.allclose(np.asarray(lz_ref), np.asarray(lz), atol=1e-8)


def test_halo_with_damping():
    rng = np.random.default_rng(4)
    g = mp.random_regular_graph(16, 3, rng)
    sis = SIS(g, lam=0.25, rho=0.15, T=3, gamma=0.2)

    ref = mpbp_sis(sis, D=6)
    for _ in range(4):
        ref = mp.bp_sweep(ref, mp.TruncBond(6), damp=0.3)
    b_ref = np.asarray(mp.beliefs(ref))

    st = halo_mpbp(mpbp_sis(sis, D=6), _mesh(4))
    for _ in range(4):
        st = halo_sweep(st, mp.TruncBond(6), damp=0.3)
    b = np.asarray(halo_beliefs(st, g))
    assert np.allclose(b_ref, b, atol=1e-9), np.abs(b_ref - b).max()


def test_halo_per_node_tables():
    """Heterogeneous SIS has genuinely per-node (and per-slot) tables — the
    node-table resharding path."""
    rng = np.random.default_rng(7)
    g = mp.random_tree(10, rng)
    lam_d = rng.uniform(0.1, 0.5, size=g.E)
    rho = rng.uniform(0.1, 0.4, size=g.N)
    het = SISHeterogeneous(g, lam_d, rho, T=3, gamma=0.3)

    ref = mpbp_sis_heterogeneous(het, D=8)
    for _ in range(4):
        ref = mp.bp_sweep(ref, mp.TruncBond(8))
    b_ref = np.asarray(mp.beliefs(ref))

    st = halo_mpbp(mpbp_sis_heterogeneous(het, D=8), _mesh(4))
    for _ in range(4):
        st = halo_sweep(st, mp.TruncBond(8))
    b = np.asarray(halo_beliefs(st, g))
    assert np.allclose(b_ref, b, atol=1e-9), np.abs(b_ref - b).max()


def test_halo_traffic_is_cut_only():
    """The all_to_all payload is the partition cut, not the edge count."""
    from matrixproductbp_tpu.parallel import partition_nodes, edge_cut
    from matrixproductbp_tpu.parallel.halo import halo_plan
    rng = np.random.default_rng(0)
    g = mp.random_regular_graph(64, 3, rng)
    part = partition_nodes(g, 4)
    plan = halo_plan(g, 4, part)
    cut = edge_cut(g, part)
    sent = int(np.sum(plan.send_idx < plan.Nloc * plan.K))
    assert sent == cut, (sent, cut)
    assert cut < g.E  # locality: the BFS partition keeps most edges internal


def test_halo_chunked_mixed_degree_matches_single_device():
    """The per-device bucketed, CHUNKED update (chunk < bucket width forces
    multiple chunks; mixed degrees force multiple buckets) must still match
    the single-device sweep bit-for-bit — the memory-bounded halo config the
    N=1e5/D=20 scale target runs."""
    rng = np.random.default_rng(9)
    n = 24
    edges = [(i, (i + 1) % n) for i in range(n)] + \
        [(i, (i + 2) % n) for i in range(0, n, 2)]      # degrees 2 and 4
    g = mp.graph_from_edges(n, edges)
    sis = SIS(g, lam=0.3, rho=0.2, T=3, gamma=0.25)

    ref = mpbp_sis(sis, D=6)
    for _ in range(4):
        ref = mp.bp_sweep(ref, mp.TruncBond(6))
    b_ref = np.asarray(mp.beliefs(ref))
    f_ref = float(mp.bethe_free_energy(ref))

    st = halo_mpbp(mpbp_sis(sis, D=6), _mesh(4))
    for _ in range(4):
        st = halo_sweep(st, mp.TruncBond(6), chunk=2)
    b = np.asarray(halo_beliefs(st, g))
    assert np.allclose(b_ref, b, atol=1e-9), np.abs(b_ref - b).max()
    assert np.isclose(f_ref, float(halo_bethe_free_energy(st)), atol=1e-8)
