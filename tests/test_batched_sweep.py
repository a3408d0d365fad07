"""Batched + software-pipelined sketch path vs the per-node vmap path.

``bp_sweep(method='sketch')`` routes large degree buckets through
``bp._bucket_update_batched`` (explicitly batched STTA scans with G-way time
staggering, ``ops/pipeline.py``); small buckets keep the vmapped
``_node_update``.  The two must agree to dtype precision on every degree
shape, damping, and the banded (sum-type y) merge — same sketches, same
contractions.  Cross-path strategy mirrors the reference's dual-path gates
(``test/sis_small_tree.jl:68-98``).
"""
import numpy as np
import pytest

import matrixproductbp_tpu as mp
from matrixproductbp_tpu import bp as bpmod
from matrixproductbp_tpu.graph import random_regular_graph, graph_from_edges
from matrixproductbp_tpu.models import SIS, mpbp_sis
from matrixproductbp_tpu.models.glauber import Ising, Glauber, mpbp_glauber
from matrixproductbp_tpu.ops.stta import (merge_stta, merge_stta_batched,
                                          mpem3_stta, mpem3_stta_batched)

import jax


@pytest.fixture
def force_batched(monkeypatch):
    monkeypatch.setattr(bpmod, "_BATCH_MIN_NODES", 1)


def _two_sweeps(bp0, damp=0.0):
    trunc = mp.TruncBond(bp0.D)
    out = bpmod.bp_sweep(bp0, trunc, damp=damp, method="sketch")
    return bpmod.bp_sweep(out, trunc, damp=damp, method="sketch")


def _assert_same(a, b):
    for name in ("msg_cores", "msg_logz", "bel_cores", "bel_logz", "f"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            rtol=1e-7, atol=1e-8, err_msg=name)


@pytest.mark.parametrize("damp", [0.0, 0.3])
def test_batched_equals_vmap_regular(monkeypatch, damp):
    rng = np.random.default_rng(0)
    g = random_regular_graph(16, 3, rng)
    bp0 = mpbp_sis(SIS(g, lam=0.2, rho=0.1, T=5, gamma=0.3), D=6)
    monkeypatch.setattr(bpmod, "_BATCH_MIN_NODES", 10 ** 9)
    ref = _two_sweeps(bp0, damp)
    monkeypatch.setattr(bpmod, "_BATCH_MIN_NODES", 1)
    out = _two_sweeps(bp0, damp)
    _assert_same(ref, out)


def test_batched_equals_vmap_mixed_degrees(monkeypatch):
    g = graph_from_edges(7, [(0, 1), (0, 2), (0, 3), (0, 4), (1, 5), (2, 6)])
    bp0 = mpbp_sis(SIS(g, lam=0.15, rho=0.2, T=4, gamma=0.25), D=5)
    monkeypatch.setattr(bpmod, "_BATCH_MIN_NODES", 10 ** 9)
    ref = _two_sweeps(bp0)
    monkeypatch.setattr(bpmod, "_BATCH_MIN_NODES", 1)
    out = _two_sweeps(bp0)
    _assert_same(ref, out)


def test_batched_equals_vmap_banded(monkeypatch):
    rng = np.random.default_rng(1)
    g = random_regular_graph(12, 3, rng)
    ising = Ising(g, J=np.full(g.E // 2, 0.4), h=np.full(12, 0.1), beta=0.7)
    bp0 = mpbp_glauber(Glauber(ising, T=4), D=6)
    assert bp0.tables.yy_off is not None
    monkeypatch.setattr(bpmod, "_BATCH_MIN_NODES", 10 ** 9)
    ref = _two_sweeps(bp0)
    monkeypatch.setattr(bpmod, "_BATCH_MIN_NODES", 1)
    out = _two_sweeps(bp0)
    _assert_same(ref, out)


def test_batched_stta_matches_vmapped_stta():
    """merge/mpem3 batched kernels vs vmapped per-instance originals, at
    several stagger widths (including the plain-scan G=1 fallback)."""
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(17)
    B, T1, DL, DB, Y, q, Dout = 6, 5, 4, 3, 3, 2, 5
    import jax.numpy as jnp
    Lc = jnp.asarray(rng.normal(size=(B, T1, DL, DL, Y * q)))
    Bc = jnp.asarray(rng.normal(size=(B, T1, DB, DB, Y * q)))
    Llz = jnp.asarray(rng.normal(size=(B,)))
    Blz = jnp.asarray(rng.normal(size=(B,)))
    pyy = jnp.asarray(rng.random(size=(Y, Y, Y, q)))
    ref_c, ref_z = jax.vmap(
        lambda lc, llz, bc, blz: merge_stta(lc, llz, bc, blz, pyy, Dout, Y,
                                            q, key))(Lc, Llz, Bc, Blz)
    for G in (1, 2, 3):
        out_c, out_z = merge_stta_batched(Lc, Llz, Bc, Blz, pyy, Dout, Y, q,
                                          key, stagger=G)
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref_c),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(out_z), np.asarray(ref_z),
                                   rtol=1e-9, atol=1e-9)

    Db, qi, qj = 4, 2, 3
    B3 = jnp.asarray(rng.normal(size=(B, T1, Db, Db, qi, qj, qi)))
    lz = jnp.asarray(rng.normal(size=(B,)))
    ref = jax.vmap(lambda b3, z: mpem3_stta(b3, z, Dout, key).cores)(B3, lz)
    for G in (1, 3):
        out_c, out_z = mpem3_stta_batched(B3, lz, Dout, key, stagger=G)
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref),
                                   rtol=1e-9, atol=1e-9)


def test_pow2_bucket_bound_clamped_to_dmax():
    """Graphs whose max degree is not a power of two (e.g. karate's dmax=17)
    used to get a bucket padded past the index arrays' K columns — the
    slicing silently cropped the slots and the K-sized reshapes crashed.
    Gate: bucketed sweep == single-full-bucket sweep on a >4-distinct-degree
    tree with non-pow2 dmax."""
    import numpy as np
    import jax
    import matrixproductbp_tpu as mp
    from matrixproductbp_tpu import bp as bpmod
    from matrixproductbp_tpu.bp import _degree_buckets
    from matrixproductbp_tpu.models import SIS, mpbp_sis

    edges = ([(0, i) for i in range(1, 6)] + [(1, i) for i in range(6, 9)]
             + [(2, 9), (2, 10), (3, 11)])
    g = mp.graph_from_edges(12, edges)          # degrees 1..5, dmax 5
    assert max(k for _, k in _degree_buckets(g)) <= g.dmax

    sis = SIS(g, lam=0.3, rho=0.2, T=3, gamma=0.3)
    bp1 = mpbp_sis(sis, D=8)
    for _ in range(4):
        bp1 = mp.bp_sweep(bp1, mp.TruncBond(8))
    b1 = np.asarray(mp.beliefs(bp1))

    orig = bpmod._degree_buckets
    try:
        bpmod._degree_buckets = lambda graph: [(np.arange(graph.N),
                                                graph.dmax)]
        jax.clear_caches()
        bp2 = mpbp_sis(sis, D=8)
        for _ in range(4):
            bp2 = mp.bp_sweep(bp2, mp.TruncBond(8))
        b2 = np.asarray(mp.beliefs(bp2))
    finally:
        bpmod._degree_buckets = orig
    assert np.allclose(b1, b2, atol=1e-12), np.abs(b1 - b2).max()
