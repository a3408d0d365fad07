"""Multi-device correctness: the sharded sweep must reproduce the
single-device sweep exactly (8 virtual CPU devices stand in for a TPU mesh,
SURVEY.md §4 note on simulated multi-node testing)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import matrixproductbp_tpu as mp
from matrixproductbp_tpu.models import SIS, mpbp_sis, sis_tables
from matrixproductbp_tpu.bp import mpbp as make_mpbp
from matrixproductbp_tpu.parallel import (partition_nodes, edge_cut,
                                          pad_graph, shard_mpbp,
                                          sharded_beliefs,
                                          sharded_bethe_free_energy)


def test_partitioner():
    rng = np.random.default_rng(0)
    g = mp.random_regular_graph(64, 3, rng)
    part = partition_nodes(g, 4)
    counts = np.bincount(part, minlength=4)
    assert counts.sum() == 64
    assert counts.max() <= 64 // 4 + 8
    assert edge_cut(g, part) < g.E  # some locality


def test_sharded_sweep_matches_single_device():
    rng = np.random.default_rng(1)
    g = mp.random_regular_graph(24, 3, rng)
    sis = SIS(g, lam=0.3, rho=0.2, T=4, gamma=0.3)

    # single device reference
    bp0 = mpbp_sis(sis, D=8)
    bp0, _, _ = mp.iterate(bp0, maxiter=6, trunc=mp.TruncBond(8), tol=0)
    b0 = np.asarray(mp.beliefs(bp0))
    f0 = float(mp.bethe_free_energy(bp0))

    # sharded over 8 virtual devices: pad graph, shard state, same sweeps
    ndev = 8
    gp = pad_graph(g, ndev)
    tables = sis_tables(gp, 0.3, 0.2)
    phi = np.ones((gp.N, 5, 2))
    phi[:g.N] = np.asarray(bp0.phi)
    bp1 = make_mpbp(gp, tables, T=4, D=8, phi=phi)
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("shard",))
    bp1 = shard_mpbp(bp1, mesh)
    for _ in range(6):
        bp1 = mp.bp_sweep(bp1, mp.TruncBond(8))
    b1 = np.asarray(sharded_beliefs(bp1, g.N))
    f1 = float(sharded_bethe_free_energy(bp1, g.N))

    assert np.allclose(b0, b1, atol=1e-9), np.abs(b0 - b1).max()
    assert np.isclose(f0, f1, atol=1e-8)
