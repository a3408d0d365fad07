"""Unrolled small-matrix algebra (ops/smallalg.py) vs jnp.linalg oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matrixproductbp_tpu.ops.smallalg import (
    chol_unrolled, solve_lower_unrolled, solve_lower_t_unrolled,
    spd_solve_unrolled)


def _rand_spd(rng, batch, n):
    A = rng.standard_normal(batch + (n, n))
    return A @ np.swapaxes(A, -1, -2) + n * np.eye(n)


@pytest.mark.parametrize("n", [1, 2, 5, 14, 18])
def test_chol_matches_lapack(n):
    rng = np.random.default_rng(0)
    G = jnp.asarray(_rand_spd(rng, (7, 3), n))
    L = chol_unrolled(G)
    L_ref = jnp.linalg.cholesky(G)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref),
                               rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("n,k", [(1, 1), (5, 3), (14, 56)])
def test_spd_solve_matches_solve(n, k):
    rng = np.random.default_rng(1)
    G = jnp.asarray(_rand_spd(rng, (4,), n))
    B = jnp.asarray(rng.standard_normal((4, n, k)))
    X = spd_solve_unrolled(G, B)
    X_ref = jnp.linalg.solve(G, B)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X_ref),
                               rtol=1e-8, atol=1e-10)


def test_triangular_solves_match():
    rng = np.random.default_rng(2)
    n, k = 9, 4
    L = jnp.asarray(np.tril(rng.standard_normal((5, n, n))) +
                    n * np.eye(n))
    B = jnp.asarray(rng.standard_normal((5, n, k)))
    Y = solve_lower_unrolled(L, B)
    np.testing.assert_allclose(np.asarray(L @ Y), np.asarray(B), atol=1e-10)
    X = solve_lower_t_unrolled(L, B)
    np.testing.assert_allclose(np.asarray(np.swapaxes(L, -1, -2) @ X),
                               np.asarray(B), atol=1e-10)


def test_jit_and_vmap_compose():
    rng = np.random.default_rng(3)
    G = jnp.asarray(_rand_spd(rng, (6,), 8))
    B = jnp.asarray(rng.standard_normal((6, 8, 2)))
    X = jax.jit(jax.vmap(spd_solve_unrolled))(G, B)
    np.testing.assert_allclose(np.asarray(X), np.asarray(jnp.linalg.solve(G, B)),
                               rtol=1e-8, atol=1e-10)
