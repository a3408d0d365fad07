"""L0 gauge/consistency tests, mirroring the reference ``test/mpems.jl``
strategy: evaluate is invariant under orthogonalization, compression at zero
threshold, and conversions; marginals match brute-force enumeration."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matrixproductbp_tpu.ops import (
    TensorTrain, rand_tt, flat_tt, evaluate, marginals, twovar_marginals,
    normalize, normalization, normalize_eachmatrix, orthogonalize_left,
    orthogonalize_right, compress, tt_sum, tt_dot, TruncThresh, TruncBond,
    mpem3_to_mpem2, evaluate_mpem3,
)


def brute_values(tt):
    T1, P = tt.T1, tt.P
    configs = np.array(list(itertools.product(range(P), repeat=T1)))
    vals_arr = np.asarray(
        jax.jit(jax.vmap(lambda x: evaluate(tt, x)))(jnp.asarray(configs)))
    return {tuple(c): float(v) for c, v in zip(configs, vals_arr)}


@pytest.fixture
def tt():
    key = jax.random.PRNGKey(0)
    return rand_tt(key, T1=4, D=5, phys=(2, 3), bond=3)


def test_evaluate_matches_manual(tt):
    x = jnp.array([1, 4, 0, 5])
    v = evaluate(tt, x)
    M = np.eye(tt.D)
    for t in range(4):
        M = M @ np.asarray(tt.cores[t, :, :, int(x[t])])
    assert np.isclose(float(v), M[0, 0] * np.exp(-float(tt.logz)))


def test_normalization_brute_force(tt):
    vals = brute_values(tt)
    Z = sum(vals.values())
    assert np.isclose(float(normalization(tt)), Z, rtol=1e-10)


def test_normalize(tt):
    tt2, lg = normalize(tt)
    assert np.isclose(float(normalization(tt2)), 1.0, rtol=1e-10)
    assert np.isclose(float(lg), np.log(float(normalization(tt))), rtol=1e-10)


def test_normalize_eachmatrix_preserves_value(tt):
    tt2 = normalize_eachmatrix(tt)
    x = jnp.array([0, 1, 2, 3])
    assert np.isclose(float(evaluate(tt, x)), float(evaluate(tt2, x)),
                      rtol=1e-10)
    assert np.max(np.abs(np.asarray(tt2.cores))) <= 1.0 + 1e-12


def test_marginals_brute_force(tt):
    vals = brute_values(tt)
    Z = sum(vals.values())
    m = np.asarray(marginals(tt))
    for t in range(tt.T1):
        for p in range(tt.P):
            ref = sum(v for x, v in vals.items() if x[t] == p) / Z
            assert np.isclose(m[t, p], ref, rtol=1e-8), (t, p)


def test_twovar_marginals_brute_force(tt):
    vals = brute_values(tt)
    Z = sum(vals.values())
    tv = np.asarray(twovar_marginals(tt))
    for t in range(tt.T1):
        for u in range(t + 1, tt.T1):
            for a in range(tt.P):
                for b in range(tt.P):
                    ref = sum(v for x, v in vals.items()
                              if x[t] == a and x[u] == b) / Z
                    assert np.isclose(tv[t, u, a, b], ref, rtol=1e-8)


def test_orthogonalize_preserves_evaluate(tt):
    x = jnp.array([2, 3, 1, 0])
    v0 = float(evaluate(tt, x))
    assert np.isclose(float(evaluate(orthogonalize_left(tt), x)), v0, rtol=1e-9)
    assert np.isclose(float(evaluate(orthogonalize_right(tt), x)), v0, rtol=1e-9)


def test_compress_lossless(tt):
    x = jnp.array([5, 0, 3, 2])
    v0 = float(evaluate(tt, x))
    c = compress(tt, TruncThresh(0.0))
    assert np.isclose(float(evaluate(c, x)), v0, rtol=1e-9)
    cl = compress(orthogonalize_left(tt), TruncThresh(0.0), assume="left")
    assert np.isclose(float(evaluate(cl, x)), v0, rtol=1e-9)
    cr = compress(orthogonalize_right(tt), TruncThresh(0.0), assume="right")
    assert np.isclose(float(evaluate(cr, x)), v0, rtol=1e-9)


def test_compress_truncation_error_small():
    key = jax.random.PRNGKey(1)
    tt = rand_tt(key, T1=5, D=8, phys=(2,), bond=8)
    tt, _ = normalize(tt)
    c = compress(tt, TruncBond(6))
    # rank-6 approx of a rank-8 random positive train: small but nonzero error
    x = jnp.array([0, 1, 0, 1, 0])
    assert np.isfinite(float(evaluate(c, x)))


def test_tt_sum(tt):
    key = jax.random.PRNGKey(2)
    other = rand_tt(key, T1=4, D=5, phys=(2, 3), bond=3)
    w = 0.7
    s = tt_sum(tt, other, w)
    x = jnp.array([1, 2, 3, 4])
    assert np.isclose(float(evaluate(s, x)),
                      float(evaluate(tt, x)) + w * float(evaluate(other, x)),
                      rtol=1e-9)


def test_tt_dot(tt):
    key = jax.random.PRNGKey(3)
    other = rand_tt(key, T1=4, D=5, phys=(2, 3), bond=3)
    va, vb = brute_values(tt), brute_values(other)
    ref = sum(va[x] * vb[x] for x in va)
    assert np.isclose(float(tt_dot(tt, other)), ref, rtol=1e-9)


def test_mpem3_to_mpem2_roundtrip():
    key = jax.random.PRNGKey(4)
    T1, Db, qi, qj = 4, 3, 2, 3
    B = jax.random.uniform(key, (T1, Db, Db, qi, qj, qi))
    # boundary convention + uniform last xi' leg
    B = B.at[0, 1:].set(0.0)
    B = B.at[-1, :, 1:].set(0.0)
    B = B.at[-1].set(jnp.broadcast_to(B[-1][..., :1], B[-1].shape))
    logz = jnp.array(0.3)
    tt = mpem3_to_mpem2(B, logz)
    xis = np.array(list(itertools.product(range(qi), repeat=T1)))
    xjs = np.array(list(itertools.product(range(qj), repeat=T1)))
    pairs = np.array([(a, b) for a in range(len(xis)) for b in range(len(xjs))])
    ref = np.asarray(jax.jit(jax.vmap(
        lambda p: evaluate_mpem3(B, logz, jnp.asarray(xis)[p[0]],
                                 jnp.asarray(xjs)[p[1]])))(jnp.asarray(pairs)))
    flat = xis[pairs[:, 0]] * qj + xjs[pairs[:, 1]]
    got = np.asarray(jax.jit(jax.vmap(
        lambda x: evaluate(tt, x)))(jnp.asarray(flat)))
    assert np.allclose(got, ref, rtol=1e-8, atol=1e-12)


def test_flat_tt_value():
    tt = flat_tt(3, 4, (2,))
    assert np.isclose(float(evaluate(tt, jnp.array([0, 1, 0]))), 1.0)
