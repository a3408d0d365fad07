"""Every compression-method knob gets a gate: qr (deterministic oracle path)
vs randomized (sketch-project rounding) vs sketch (STTA), at tree shapes and
at a bench-shaped horizon, in f64 and in the TPU bench dtype f32.

Mirrors the reference dual-path strategy (``test/sis_small_tree.jl:68-98``):
different code paths over the same model must agree.  With generous bond
capacity both randomized paths are exact almost surely (Gaussian sketches of
a subspace of rank <= sketch size capture it w.p. 1), so tolerances here are
tight, not statistical.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import matrixproductbp_tpu as mp
from matrixproductbp_tpu import exact
from matrixproductbp_tpu.models import SIS, mpbp_sis

METHODS = ["randomized", "sketch"]


def run(bp, method, D=None, maxiter=15, tol=1e-12):
    trunc = mp.TruncThresh(0.0) if D is None else mp.TruncBond(D)
    bp, _, _ = mp.iterate(bp, maxiter=maxiter, trunc=trunc, tol=tol,
                          method=method)
    return bp


@pytest.mark.parametrize("method", METHODS)
def test_method_matches_qr_on_tree(method):
    """Tree gate: each fast path == qr == enumeration at zero truncation."""
    g = mp.graph_from_edges(4, [(0, 1), (0, 2), (2, 3)])
    sis = SIS(g, 0.35, 0.25, T=2, gamma=0.4)
    bp_qr = run(mpbp_sis(sis, D=16), "qr")
    bp_m = run(mpbp_sis(sis, D=16), method)
    b_qr = np.asarray(mp.beliefs(bp_qr))
    b_m = np.asarray(mp.beliefs(bp_m))
    assert np.allclose(b_qr, b_m, atol=1e-8), np.abs(b_qr - b_m).max()
    p_ex, Z = exact.exact_prob(bp_m)
    assert np.allclose(b_m, exact.exact_marginals(bp_m, p_ex), atol=1e-8)
    # free energy through the fast path's ledger
    assert np.isclose(-float(mp.bethe_free_energy(bp_m)), np.log(Z),
                      atol=1e-7)


@pytest.mark.parametrize("method", METHODS)
def test_method_matches_qr_bench_shape(method):
    """Bench-shaped gate (3-regular, T=15, D=10 message bond — the BENCH
    configuration scaled down in N): fast paths agree with qr when the bond
    capacity is generous relative to the true rank."""
    rng = np.random.default_rng(3)
    g = mp.random_regular_graph(8, 3, rng)
    sis = SIS(g, 0.2, 0.1, T=15, gamma=0.3)
    bp_qr = run(mpbp_sis(sis, D=12), "qr", D=12, maxiter=8, tol=0.0)
    bp_m = run(mpbp_sis(sis, D=12), method, D=12, maxiter=8, tol=0.0)
    b_qr = np.asarray(mp.beliefs(bp_qr))
    b_m = np.asarray(mp.beliefs(bp_m))
    assert np.allclose(b_qr, b_m, atol=5e-5), np.abs(b_qr - b_m).max()


@pytest.mark.parametrize("method", ["qr", "sketch"])
def test_f32_tier_matches_f64(method):
    """f32 (the TPU bench dtype) against the f64 oracle: beliefs within
    single-precision accumulation error."""
    g = mp.graph_from_edges(4, [(0, 1), (0, 2), (2, 3)])
    sis = SIS(g, 0.35, 0.25, T=6, gamma=0.4)
    bp64 = run(mpbp_sis(sis, D=12), "qr", D=12, maxiter=8, tol=0.0)
    bp32 = run(mpbp_sis(sis, D=12, dtype=jnp.float32), method, D=12,
               maxiter=8, tol=0.0)
    b64 = np.asarray(mp.beliefs(bp64))
    b32 = np.asarray(mp.beliefs(bp32))
    assert b32.dtype == np.float32
    assert np.all(np.isfinite(b32))
    assert np.allclose(b64, b32, atol=2e-3), np.abs(b64 - b32).max()


def test_cholqr_kernel_against_reference():
    """The Pallas lane-batched CholQR (interpret mode on CPU) == the jnp
    reference == reconstructs A; this is the kernel the randomized path uses
    on TPU (``ops/randomized.py`` -> ``ops/kernels.py::cholqr``)."""
    from matrixproductbp_tpu.ops.kernels import (batched_cholqr,
                                                 cholqr_reference)
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((5, 24, 8)))
    Q, R = batched_cholqr(A, eps=1e-12)
    Qr, Rr = cholqr_reference(A, eps=1e-12)
    assert np.allclose(np.asarray(Q), np.asarray(Qr), atol=1e-8)
    # Q orthonormal + QR = A
    QtQ = np.einsum("bmi,bmj->bij", np.asarray(Q), np.asarray(Q))
    assert np.allclose(QtQ, np.eye(8)[None], atol=1e-8)
    assert np.allclose(np.einsum("bmi,bij->bmj", np.asarray(Q),
                                 np.asarray(R)), np.asarray(A), atol=1e-8)


def test_cholqr_unrolled_matches_reference():
    from matrixproductbp_tpu.ops.smallalg import cholqr_unrolled
    from matrixproductbp_tpu.ops.kernels import cholqr_reference
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((7, 20, 6)))
    Q, R = jax.jit(cholqr_unrolled)(A)
    Qr, _ = cholqr_reference(A, eps=1e-12)
    assert np.allclose(np.asarray(Q), np.asarray(Qr), atol=1e-8)
    assert np.allclose(np.einsum("bmi,bij->bmj", np.asarray(Q),
                                 np.asarray(R)), np.asarray(A), atol=1e-8)
