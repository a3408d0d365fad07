"""Soft-margin importance sampler + observation generator + Gillespie SIS.

TPU-native counterpart of ``/root/reference/src/sampling.jl``:

* ``sample``: ancestral sampling of the *unreweighted* dynamics, fully
  vectorized — ``vmap`` over particles, ``lax.scan`` over time; the per-step
  transition law is the same table fold the BP sweep is built from
  (``factors.transition_probs``), so there is no separate factor code path.
  Weights are carried in log-domain (replacing ULogarithmic,
  ``sampling.jl:26``).
* Estimators return (mean, stderr) pairs — the reference's ``Measurement``
  binomial error bars (``sampling.jl:91-113``).
* ``draw_node_observations``: soft clamping of randomly chosen (site, time)
  cells (``sampling.jl:191-210``).
* The event-driven Gillespie SIS simulator stays on the host (it is an
  irregular discrete-event oracle, not a TPU workload — SURVEY.md §7 step 5).
"""
from __future__ import annotations

import dataclasses
import heapq

import jax
import jax.numpy as jnp
import numpy as np

from .bp import MPBP
from .factors import transition_probs

__all__ = ["SoftMarginSampler", "sample", "sample_one", "marginals_mc",
           "pair_marginals_mc", "autocorrelations_mc", "autocovariances_mc",
           "means_mc", "draw_node_observations", "simulate_queue_sis",
           "continuous_sis_sampler"]


# ---------------------------------------------------------------------------
# core sampling
# ---------------------------------------------------------------------------

def _sample_trajectories(bp: MPBP, key, nsamples: int):
    """X[nsamples, N, T1] int trajectories + logw[nsamples] importance weights.

    Mirrors ``onesample!`` (``sampling.jl:30-59``): draw from the prior
    dynamics, weight by the observation likelihood
    exp(sum log phi + 1/2 sum log psi)."""
    g = bp.graph
    N, T1, q = bp.N, bp.T + 1, bp.q
    phi = bp.phi
    psi = bp.psi
    nbr = jnp.asarray(np.minimum(g.nbr, g.N - 1))
    mask = jnp.asarray(g.in_mask)
    src = jnp.asarray(g.edge_src)
    dst = jnp.asarray(g.edge_dst)
    p0 = phi[:, 0, :] / jnp.sum(phi[:, 0, :], axis=1, keepdims=True)

    tb = bp.tables
    if tb.time_varying:
        # per-transition tables as scan inputs (constant layout per slice)
        from .factors import RecursiveFactorTables
        tb_seq = RecursiveFactorTables(
            jnp.moveaxis(tb.Py, 1, 0)[:-1], jnp.moveaxis(tb.Pyp, 2, 0)[:-1],
            jnp.moveaxis(tb.Pxy, 2, 0)[:-1], jnp.moveaxis(tb.Pyy, 2, 0)[:-1],
            jnp.moveaxis(tb.Py0, 1, 0)[:-1])
    else:
        tb_seq = None

    def one(key):
        k0, key = jax.random.split(key)
        x0 = jax.random.categorical(k0, jnp.log(p0), axis=1)       # [N]

        def step(carry, xs_t):
            x = carry
            key_t, tb_t = xs_t
            xn = x[nbr]                                            # [N, K]
            p = transition_probs(tb if tb_t is None else tb_t,
                                 mask, xn, x)                      # [N, q]
            xnew = jax.random.categorical(key_t, jnp.log(p), axis=1)
            return xnew, xnew

        keys = jax.random.split(key, T1 - 1)
        _, xs = jax.lax.scan(step, x0, (keys, tb_seq))
        X = jnp.concatenate([x0[None], xs], axis=0).T              # [N, T1]

        # log-weight: observations only (the prior transition probs cancel)
        t_idx = jnp.arange(T1)
        logw = jnp.sum(jnp.log(
            phi[jnp.arange(N)[:, None], t_idx[None, :], X]))
        logw -= jnp.sum(jnp.log(p0[jnp.arange(N), X[:, 0]]))  # phi[0] is the prior
        logw += 0.5 * jnp.sum(jnp.log(
            psi[jnp.arange(g.E)[:, None], t_idx[None, :],
                X[src][:, :], X[dst][:, :]]))
        return X, logw

    keys = jax.random.split(key, nsamples)
    return jax.vmap(one)(keys)


@dataclasses.dataclass
class SoftMarginSampler:
    """Sample store (reference ``SoftMarginSampler``, ``sampling.jl:6-27``)."""
    bp: MPBP
    X: np.ndarray       # [S, N, T1]
    logw: np.ndarray    # [S]

    @property
    def weights(self) -> np.ndarray:
        lw = self.logw - self.logw.max()
        w = np.exp(lw)
        return w / w.sum()


def sample(bp: MPBP, nsamples: int, key=None) -> SoftMarginSampler:
    """Draw ``nsamples`` weighted trajectories (reference ``sample``)."""
    key = jax.random.PRNGKey(0) if key is None else key
    X, logw = _sample_trajectories(bp, key, nsamples)
    return SoftMarginSampler(bp, np.asarray(X), np.asarray(logw))


def sample_one(bp: MPBP, key=None):
    sms = sample(bp, 1, key)
    return sms.X[0], sms.logw[0]


# ---------------------------------------------------------------------------
# estimators (value ± binomial stderr)
# ---------------------------------------------------------------------------

def marginals_mc(sms: SoftMarginSampler):
    """([N, T1, q] mean, [N, T1, q] stderr) (``sampling.jl:91-113``)."""
    q = sms.bp.q
    S, N, T1 = sms.X.shape
    w = sms.weights
    m = np.zeros((N, T1, q))
    for a in range(q):
        m[:, :, a] = np.einsum("s,snt->nt", w, (sms.X == a).astype(float))
    err = np.sqrt(np.clip(m * (1 - m), 0.0, None) / S)
    return m, err


def pair_marginals_mc(sms: SoftMarginSampler):
    """([E, T1, q, q], err) per directed edge (``sampling.jl:123-147``)."""
    g = sms.bp.graph
    q = sms.bp.q
    S, N, T1 = sms.X.shape
    w = sms.weights
    m = np.zeros((g.E, T1, q, q))
    Xi = sms.X[:, g.edge_src, :]   # [S, E, T1]
    Xj = sms.X[:, g.edge_dst, :]
    for a in range(q):
        for b in range(q):
            m[:, :, a, b] = np.einsum(
                "s,set->et", w, ((Xi == a) & (Xj == b)).astype(float))
    err = np.sqrt(np.clip(m * (1 - m), 0.0, None) / S)
    return m, err


def means_mc(sms: SoftMarginSampler, values=None):
    q = sms.bp.q
    v = np.arange(q, dtype=float) if values is None else np.asarray(values)
    m, err = marginals_mc(sms)
    return m @ v, np.sqrt((err ** 2) @ (v ** 2))


def autocorrelations_mc(sms: SoftMarginSampler, values=None, maxdist=None):
    """[N, T1, T1] <f f> for t < u with stderr (``sampling.jl:149-177``)."""
    q = sms.bp.q
    S, N, T1 = sms.X.shape
    maxdist = T1 if maxdist is None else maxdist
    v = np.arange(q, dtype=float) if values is None else np.asarray(values)
    w = sms.weights
    fv = v[sms.X]                   # [S, N, T1]
    r = np.zeros((N, T1, T1))
    e = np.zeros((N, T1, T1))
    for t in range(T1):
        for u in range(t + 1, min(t + maxdist, T1 - 1) + 1):
            prod = fv[:, :, t] * fv[:, :, u]
            mean = np.einsum("s,sn->n", w, prod)
            var = np.einsum("s,sn->n", w, prod ** 2) - mean ** 2
            r[:, t, u] = mean
            e[:, t, u] = np.sqrt(np.maximum(var, 0.0) / S)
    return r, e


def autocovariances_mc(sms: SoftMarginSampler, values=None, maxdist=None):
    r, e = autocorrelations_mc(sms, values, maxdist)
    m, _ = means_mc(sms, values)
    c = r - m[:, :, None] * m[:, None, :]
    T1 = m.shape[1]
    mask = np.triu(np.ones((T1, T1), bool), k=1)
    return c * mask[None], e


# ---------------------------------------------------------------------------
# observation generator
# ---------------------------------------------------------------------------

def draw_node_observations(bp: MPBP, nobs: int, rng: np.random.Generator,
                           softinf: float = np.inf, last_time: bool = False,
                           key=None):
    """Sample one trajectory from the prior, observe ``nobs`` random (site,
    time) cells via soft indicators, return (new bp, X, observed list).

    Mirrors ``draw_node_observations!`` (``sampling.jl:191-210``)."""
    X, _ = sample_one(bp, key)
    N, T1 = X.shape
    times = range(T1 - 1, T1) if last_time else range(T1)
    cells = [(i, t) for i in range(N) for t in times]
    idx = rng.choice(len(cells), size=nobs, replace=False)
    observed = sorted(cells[i] for i in idx)
    if np.isinf(softinf):
        softone, softzero = 1.0, 0.0
    else:
        lw = np.log(softinf)
        softone = 1.0 / (1.0 + np.exp(-lw))
        softzero = 1.0 / (1.0 + np.exp(lw))
    phi = np.asarray(bp.phi).copy()
    for (i, t) in observed:
        ind = np.where(np.arange(bp.q) == X[i, t], softone, softzero)
        phi[i, t] *= ind
        if np.all(phi[i, t] == 0):
            raise ValueError(f"observation zeroes out node {i} at time {t}")
    bp2 = dataclasses.replace(bp, phi=jnp.asarray(phi, bp.phi.dtype))
    return bp2, X, observed


# ---------------------------------------------------------------------------
# continuous-time Gillespie SIS (host-side oracle)
# ---------------------------------------------------------------------------

def simulate_queue_sis(graph, P0, lam, mu, alpha, T, rng: np.random.Generator,
                       stats=None):
    """Event-driven SIS simulation (reference ``simulate_queue_sis!``,
    ``sampling.jl:218-257``), using a lazy-deletion exponential clock queue in
    place of CavityTools.ExponentialQueue."""
    N = graph.N
    x = np.zeros(N, dtype=bool)
    rate = np.zeros(N)
    heap: list = []
    stamp = np.zeros(N, dtype=np.int64)
    t = 0.0

    def set_rate(i, r):
        rate[i] = r
        stamp[i] += 1
        if r > 0:
            if np.isinf(r):
                heapq.heappush(heap, (t, int(i), int(stamp[i])))
            else:
                dt = rng.exponential(1.0 / r)
                heapq.heappush(heap, (t + dt, int(i), int(stamp[i])))

    for i in range(N):
        if rng.random() < P0[i]:
            set_rate(i, np.inf)

    nbrs = [graph.nbr[i][graph.in_mask[i]] for i in range(N)]
    while heap:
        tev, i, s = heapq.heappop(heap)
        if s != stamp[i] or rate[i] == 0:
            continue
        t = tev
        if t > T:
            break
        x[i] = ~x[i]
        if stats is not None:
            stats(t, i, x)
        if x[i]:
            for j in nbrs[i]:
                if not x[j]:
                    set_rate(j, rate[j] + lam)
            set_rate(i, mu)
        else:
            s_i = alpha
            for j in nbrs[i]:
                if not x[j]:
                    set_rate(j, max(rate[j] - lam, 0.0))
                else:
                    s_i += lam
            set_rate(i, s_i)
    return x


def continuous_sis_sampler(sis, T, lam, rho, alpha=0.0, nsamples=10**4,
                           nbins=200, rng=None, discard_dead=False):
    """Time-binned magnetization statistics from Gillespie runs
    (reference ``continuous_sis_sampler``, ``sampling.jl:260-301``)."""
    rng = np.random.default_rng(0) if rng is None else rng
    g = sis.graph
    N = g.N
    dt = T / nbins
    K = nbins + 1
    av = np.zeros((N, K))
    va = np.zeros((N, K))
    P0 = np.broadcast_to(np.asarray(sis.gamma), (N,))
    ndisc = 0
    for _ in range(nsamples):
        ni = np.zeros((N, K), dtype=np.int64)

        def stats(t, i, x):
            k = min(int(np.ceil(t / dt)), K - 1)
            ni[i, k] += 2 * int(x[i]) - 1

        x = simulate_queue_sis(g, P0, lam, rho, alpha, T, rng, stats)
        if discard_dead and not x.any():
            ndisc += 1
            continue
        s = np.cumsum(ni, axis=1)
        av += s
        va += s.astype(float) ** 2
    n = max(nsamples - ndisc, 1)
    av /= n
    va = np.sqrt(np.maximum(va / n - av ** 2, 0.0))
    return av, va
