"""Fused Pallas TPU kernels for the STTA sketch scans — the hot path.

Why (measured, PERF.md): the ``method='sketch'`` sweep is a chain of
``lax.scan``s whose per-step arithmetic is 4-6 small dependent einsums.  Each
XLA einsum at these operand sizes carries a fixed ~1-2 ms cost (HBM
round-trips of padded small-trailing-dim layouts + serial dependence), so one
scan step costs ~9 ms while its arithmetic, run as an independent batch, costs
~2.4 ms — the sweep is op-latency-bound, ~0.04% of f32 peak.  Batching and
software-pipelining at the XLA level do not help (same per-wave op sizes;
measured regressions, see ``vmaptest.py`` / ``stagger_ablate``).

The fix is to run the *entire time scan inside one Pallas kernel*: the node
batch rides the 128-wide lane dimension, the sketch carries (``W``/``S``) live
in VMEM scratch across grid steps, per-step inputs stream HBM->VMEM through
the automatic block pipeline, and every contraction over the small per-node
axes (bond <= ~12, y/q <= ~4, sketch <= ~16) unrolls into vectorized VPU
multiply-accumulates over the lanes; contractions against *shared* operands
(the random sketches, ``prob_yy``) use the MXU.  Intermediates never touch
HBM, and per-step op dispatch disappears entirely.

Kernels mirror ``ops/stta.merge_stta_batched`` / ``mpem3_stta_batched``
exactly (same sketches, same contraction algebra, same per-instance
rescaling), so the consistency gates compare the two paths directly.  The
XLA paths remain for CPU, f64 (accuracy gates), periodic trains, and shapes
outside the VMEM budget.

No reference counterpart: the Julia reference compresses with per-step LAPACK
SVDs inside a sequential node loop (``recursive_bp_factor.jl:146-165``,
``mpems.jl:67-94``); both the streaming-sketch algorithm and its fusion are
TPU-native design.
"""
from __future__ import annotations

import os
import threading
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .sumy import y_expand
from .tensortrain import TensorTrain, _safe_scale, _fit_axis, \
    normalize_eachmatrix

__all__ = ["merge_stta_fused", "mpem3_stta_fused", "mpem3_stta_fused_tm",
           "fused_supported",
           "mpem3_fused_supported"]

try:  # Pallas imports fail gracefully on builds without TPU support
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

_LANES = 128

#: Platform the *data* actually lives on.  Exactly two entry points set it:
#: the un-jitted ``bp.bp_sweep`` shim and ``bp.bp_sweep_chunked`` — any new
#: consumer of the ``*_supported`` gates must BOTH call
#: :func:`set_active_platform` with a concrete array AND carry a ``platform``
#: static argument in its jit cache key (jit does not key on device
#: placement; the gate decision is baked into the jaxpr at trace time).
#: ``jax.default_backend()`` is wrong for this purpose: with a TPU attached
#: it says "tpu" even while a sweep is being traced for CPU-committed inputs
#: (e.g. the bench's host-CPU baseline phase), which would admit Pallas TPU
#: kernels into a CPU lowering.  Thread-local so concurrent sweeps over CPU-
#: and TPU-resident models cannot race each other's gate reads.
_tls = threading.local()


def set_active_platform(x) -> None:
    """Record the device platform of concrete array ``x``, consulted by the
    ``*_supported`` admission gates.

    Limitation (documented at the entry points): if ``x`` is a tracer —
    i.e. ``bp_sweep`` is itself called under a user's outer ``jit``/``scan``
    — the platform cannot be read and the gates fall back to
    ``jax.default_backend()``, which may readmit kernels for the wrong
    platform when the outer trace targets a non-default device.
    """
    try:
        _tls.platform = next(iter(x.devices())).platform
    except Exception:
        _tls.platform = None


def _active_platform():
    return getattr(_tls, "platform", None)


def _platform() -> str:
    return _active_platform() or jax.default_backend()
#: VMEM budget (bytes) for one F-step block's live set.  v5e has 128 MiB of
#: physical VMEM; we raise Mosaic's default scoped limit (16 MiB) via
#: ``vmem_limit_bytes`` below and gate admission on a per-array PADDED-bytes
#: model (f32 tiles are (8, 128): the second-minor dim of every lane-blocked
#: array rounds up to a multiple of 8) staying under a budget that leaves
#: headroom for Mosaic's own temporaries.
_VMEM_LIMIT = 110 * 1024 * 1024
_VMEM_BUDGET = 88 * 1024 * 1024

#: test hook: force the fused path in interpreter mode on CPU (monkeypatched
#: by tests/test_fused_stta.py so the sweep wiring is exercised off-TPU).
_FORCE_INTERPRET = False

#: test hook: force the lean F-step kernel even when the original admits.
_FORCE_LEAN = False


def _pb(*dims):
    """Padded bytes of a lane-blocked f32 VMEM array [*dims, _LANES]:
    the last entry of ``dims`` is the second-minor (sublane) axis."""
    lead = 1
    for d in dims[:-1]:
        lead *= d
    sm = -(-dims[-1] // 8) * 8
    return 4 * lead * sm * _LANES


def _f_live_bytes(DL, DB, Y, q, sr, sl, lean: bool):
    """Live-set estimate for one forward-step block (streams double-buffered
    + scratch + unrolled intermediates), per kernel variant."""
    streams = (2 * 2 * _pb(DL, DL, Y, q)          # lt/bt blocks
               + 2 * 2 * _pb(DL, DB, sr)          # wt/wt1 blocks
               + 2 * (_pb(sl, Y, q, sr) + _pb(sl, sr)))   # nt/mt out
    carry = 2 * _pb(sl, DL, DB)                   # s_scr + s2 build
    small = 2 * _pb(sl, DL, Y, q) + _pb(sl, Y, q, sr)     # t1m, zt, Nt
    if lean:
        t2 = Y * q * _pb(sl, DL, DB)              # per-(y,x) [e, n, j, L]
    else:
        t2 = _pb(sl, DL, DB, Y, q)                # [e, n, j, y, x, L]
    return streams + carry + small + t2


def _w_live_bytes(DL, DB, Y, q, sr):
    return (2 * 2 * _pb(DL, DL, Y, q)             # lt/bt blocks
            + 2 * _pb(DL, DB, sr)                 # ws out blocks
            + 2 * _pb(DL, DB, sr)                 # carry + w2
            + 2 * _pb(DL, DL, Y, q, sr))          # t1, u


def _f_variant(DL, DB, Y, q, sr, sl):
    """Which F-step kernel body to run: 'orig' (fewer unrolled ops, more
    padding), 'lean' (per-(y,x) t2, ~Y*q/8-of-the-padding), or None."""
    if _FORCE_LEAN and _f_live_bytes(DL, DB, Y, q, sr, sl, True) <= _VMEM_BUDGET:
        return "lean"
    if _f_live_bytes(DL, DB, Y, q, sr, sl, False) <= _VMEM_BUDGET:
        return "orig"
    if _f_live_bytes(DL, DB, Y, q, sr, sl, True) <= _VMEM_BUDGET:
        return "lean"
    return None


def fused_supported(DL: int, DB: int, Y: int, q: int, Dout: int, dtype,
                    oversample: int = 4) -> bool:
    """Can the fused kernels run this merge? (TPU, f32, VMEM budget, env)."""
    if not _HAVE_PALLAS or os.environ.get("MPBP_FUSED", "1") == "0":
        return False
    sr = min(Dout, DL * DB)
    sl = min(sr + oversample, DL * DB)
    fits = (_f_variant(DL, DB, Y, q, sr, sl) is not None
            and _w_live_bytes(DL, DB, Y, q, sr) <= _VMEM_BUDGET)
    if _FORCE_INTERPRET:
        return fits
    if _platform() != "tpu":
        return False
    if dtype != jnp.float32:
        return False
    return fits


def _pad_lanes(x, axis):
    n = x.shape[axis]
    npad = max(_LANES, ((n + _LANES - 1) // _LANES) * _LANES)
    if npad == n:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, npad - n)
    return jnp.pad(x, pad)


def _onehot000(DL, DB, sr, dtype):
    """e0 boundary sketch: 1.0 at (0, 0, 0), lanes-broadcast."""
    k = jax.lax.broadcasted_iota(jnp.int32, (DL, DB, sr, _LANES), 0)
    m = jax.lax.broadcasted_iota(jnp.int32, (DL, DB, sr, _LANES), 1)
    a = jax.lax.broadcasted_iota(jnp.int32, (DL, DB, sr, _LANES), 2)
    return ((k == 0) & (m == 0) & (a == 0)).astype(dtype)


def _lane_scale(x, axes):
    """per-lane max-abs rescale (batched ``_safe_scale`` semantics)."""
    m = jnp.max(jnp.abs(x), axis=axes, keepdims=True)
    ok = jnp.isfinite(m) & (m > 0)
    return jnp.where(ok, m, jnp.ones_like(m))


#: instances per fused-scan chunk.  The kernels read node-last (lanes)
#: copies of their inputs whose tiled layouts pad up to 4x (tiny
#: second-minor dims); at bench scale the whole-batch copies overflowed the
#: 16 GB HBM.  ``lax.map`` over fixed-size chunks compiles ONE chunk body
#: and runs chunks strictly sequentially, so only one chunk's transposed
#: buffers are ever live (a plain Python loop does NOT bound the peak —
#: measured: XLA keeps all chunks' buffers simultaneously live).
_MPEM3_CHUNK = 2048


def _chunked(fn, xs, Bn):
    """Apply ``fn`` (chunk pytree -> tuple of [nb, ...] arrays) over
    ``_MPEM3_CHUNK``-sized chunks of the leading axis via ``lax.map``;
    single-chunk inputs call ``fn`` directly."""
    if Bn <= _MPEM3_CHUNK:
        return fn(xs)
    C = -(-Bn // _MPEM3_CHUNK)
    Bp = C * _MPEM3_CHUNK

    def pad0(a):
        return jnp.pad(a, [(0, Bp - Bn)] + [(0, 0)] * (a.ndim - 1))

    xs_p = jax.tree.map(
        lambda a: pad0(a).reshape((C, _MPEM3_CHUNK) + a.shape[1:]), xs)
    outs = jax.lax.map(fn, xs_p)
    return tuple(o.reshape((Bp,) + o.shape[2:])[:Bn] for o in outs)


# ---------------------------------------------------------------------------
# cavity-merge kernels
# ---------------------------------------------------------------------------

def _merge_wstep_kernel(lt, bt, th, ws_out, w_scr, *, DL, DB, Y, q, sr):
    """One reverse-sketch step for a 128-node lane block.

    lt: [1, DL, DL, Y, q, L]  (time row t+1 of the L train)
    bt: [1, DB, DB, Y, q, L]
    th: [1, sr(b), Y(v), Y(u), q(x), sr(a)]  psi (.) pyy premix, shared
    ws_out: [1, DL, DB, sr, L]     emitted W_{t+1}
    w_scr:  [DL, DB, sr, L]        carry (W of sites t+2..)
    """
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        w_scr[:] = _onehot000(DL, DB, sr, w_scr.dtype)

    Lt = lt[0]
    Bt = bt[0]
    Th = th[0]
    W = w_scr[:]                                    # [l, n, b, L]

    # t1[m,l,v,x,b] = sum_n Bt[m,n,v,x] W[l,n,b]
    t1 = None
    for n in range(DB):
        c = (Bt[:, n, :, :, :][:, None, :, :, None, :]
             * W[:, n, :, :][None, :, None, None, :, :])
        t1 = c if t1 is None else t1 + c

    # u[m,l,u,x,a] = sum_{v,b} Th[a,b,u,v,x] t1[m,l,v,x,b]
    u = None
    for v in range(Y):
        for b in range(sr):
            ths = Th[b, v]                          # [u, x, a]
            c = (ths[None, None, :, :, :, None]
                 * t1[:, :, v, :, b, :][:, :, None, :, None, :])
            u = c if u is None else u + c

    # W2[k,m,a] = sum_{n,u,x} Lt[k,n,u,x] u[m,n,u,x,a]
    w2 = None
    for n in range(DL):
        for uu in range(Y):
            for x in range(q):
                c = (Lt[:, n, uu, x, :][:, None, None, :]
                     * u[:, n, uu, x, :, :][None, :, :, :])
                w2 = c if w2 is None else w2 + c

    w2 = w2 / _lane_scale(w2, (0, 1, 2))
    w_scr[:] = w2
    ws_out[0] = w2


def _merge_fstep_kernel(lt, bt, pyy, ft, wt, wt1, sinit, nt_out, mt_out,
                        s_scr, *, DL, DB, Y, q, sr, sl, S):
    """One forward step: carry S_{t-1}, emit (N_t, M_{t-1}).

    lt/bt as in the W kernel (time row t); pyy: [Y, Y, Y, q] shared;
    ft: [1, Y, q, sl(f), sl(e)] phi premix; wt/wt1: [1, DL, DB, sr, L]
    (W_t and W_{t+1}); sinit: [sl, DL, DB, L]; outputs nt [1, sl, Y, q, sr, L]
    and mt [1, sl, sr, L]; s_scr carry [sl, DL, DB, L].
    """
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        s_scr[:] = sinit[:]

    S_ = s_scr[:]                                   # [e, k, m, L]
    Lt = lt[0]
    Bt = bt[0]
    Pyy = pyy[:]
    Ft = ft[0]                                      # [y, x, f, e]
    Wt = wt[0]
    Wt1 = jnp.where(s == S - 1, _onehot000(DL, DB, sr, wt1.dtype), wt1[0])

    # Mt[e,a] = sum_{k,m} S_[e,k,m] Wt[k,m,a]
    mtmp = None
    for k in range(DL):
        c = S_[:, k, :, :][:, :, None, :] * Wt[k][None, :, :, :]
        mtmp = c if mtmp is None else mtmp + c      # [e, m, a, L]
    Mt = jnp.sum(mtmp, axis=1)                      # [e, a, L]

    # t2[e,n,j,y,x] = sum_{m,v,u} Pyy[y,u,v,x] t1[e,n,m,u,x] Bt[m,j,v,x]
    # with t1[e,n,m,u,x] = sum_k S_[e,k,m] Lt[k,n,u,x].  t1 is formed one m
    # at a time so the live VMEM set stays ~[e,n,u,x] sized (the full 6D t1
    # plus its broadcast temporaries blow the 16 MB scoped-vmem budget).
    t2 = None
    for m in range(DB):
        t1m = None                                  # [e, n, u, x, L]
        for k in range(DL):
            c = (S_[:, k, m, :][:, None, None, None, :]
                 * Lt[k][None, :, :, :, :])
            t1m = c if t1m is None else t1m + c
        for v in range(Y):
            zt = None
            for uu in range(Y):
                c = (Pyy[:, uu, v, :][None, None, :, :, None]
                     * t1m[:, :, uu, :, :][:, :, None, :, :])
                zt = c if zt is None else zt + c    # [e, n, y, x, L]
            c2 = (zt[:, :, None, :, :, :]
                  * Bt[m, :, v, :, :][None, None, :, None, :, :])
            t2 = c2 if t2 is None else t2 + c2      # [e, n, j, y, x, L]

    # Nt[e,y,x,b] = sum_{n,j} t2[e,n,j,y,x] Wt1[n,j,b]   (VMEM-lean order)
    Nt = None
    for n in range(DL):
        tn = None
        for j in range(DB):
            c = (t2[:, n, j, :, :, :][:, :, :, None, :]
                 * Wt1[n, j, :, :][None, None, None, :, :])
            tn = c if tn is None else tn + c        # [e, y, x, b, L]
        Nt = tn if Nt is None else Nt + tn

    # S2[f,n,j] = sum_{e,y,x} Ft[y,x,f,e] t2[e,n,j,y,x]  — MXU per (y, x)
    s2 = None
    for y in range(Y):
        for x in range(q):
            lhs = Ft[y, x]                          # [f, e]
            rhs = t2[:, :, :, y, x, :].reshape(sl, DL * DB * _LANES)
            c = jax.lax.dot_general(
                lhs, rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=lhs.dtype)
            s2 = c if s2 is None else s2 + c        # [f, DL*DB*L]
    s2 = s2.reshape(sl, DL, DB, _LANES)
    s_scr[:] = s2 / _lane_scale(s2, (0, 1, 2))

    nt_out[0] = Nt
    mt_out[0] = Mt


def _merge_wscan(L1, B1, Thk, *, DL, DB, Y, q, sr, interpret=False):
    """L1/B1: [S, D, D, Y, q, Np]; Thk: [S, sr, Y, Y, q, sr] -> Ws
    [S, DL, DB, sr, Np] with Ws[t] = W_{t+1} (reverse-scan emissions)."""
    S, Np = L1.shape[0], L1.shape[-1]
    grid = (Np // _LANES, S)
    rev = lambda i, s: (S - 1 - s, 0, 0, 0, 0, i)
    return pl.pallas_call(
        partial(_merge_wstep_kernel, DL=DL, DB=DB, Y=Y, q=q, sr=sr),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, DL, DL, Y, q, _LANES), rev),
            pl.BlockSpec((1, DB, DB, Y, q, _LANES), rev),
            pl.BlockSpec((1, sr, Y, Y, q, sr), lambda i, s: (S - 1 - s,) + (0,) * 5),
        ],
        out_specs=pl.BlockSpec((1, DL, DB, sr, _LANES),
                               lambda i, s: (S - 1 - s, 0, 0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((S, DL, DB, sr, Np), L1.dtype),
        scratch_shapes=[pltpu.VMEM((DL, DB, sr, _LANES), L1.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(L1, B1, Thk)


def _merge_fstep_kernel_lean(lt, bt, pyy, ft, wt, wt1, sinit, nt_out, mt_out,
                             s_scr, *, DL, DB, Y, q, sr, sl, S):
    """Lean variant of :func:`_merge_fstep_kernel` for large bond dims.

    Same algebra, but ``t2`` is held as per-(y, x) accumulators
    ``[e, n, j, L]`` instead of one ``[e, n, j, y, x, L]`` tensor: with
    q=2 on the sublane axis the single-tensor layout pads (2,128)->(8,128)
    (x4) — 78 MB at D=20 — while the per-(y, x) arrays keep the bond dim
    second-minor (pad ~1.2x), which is what admits D=20 merges into VMEM.
    Costs ~Y*q more (smaller) unrolled ops in the production loop, so the
    original body stays preferred where it fits (D<=~14).
    """
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        s_scr[:] = sinit[:]

    S_ = s_scr[:]                                   # [e, k, m, L]
    Lt = lt[0]
    Bt = bt[0]
    Pyy = pyy[:]
    Ft = ft[0]                                      # [y, x, f, e]
    Wt = wt[0]
    Wt1 = jnp.where(s == S - 1, _onehot000(DL, DB, sr, wt1.dtype), wt1[0])

    # Mt[e,a] = sum_{k,m} S_[e,k,m] Wt[k,m,a]
    mtmp = None
    for k in range(DL):
        c = S_[:, k, :, :][:, :, None, :] * Wt[k][None, :, :, :]
        mtmp = c if mtmp is None else mtmp + c      # [e, m, a, L]
    Mt = jnp.sum(mtmp, axis=1)                      # [e, a, L]

    # t2[y][x][e,n,j] = sum_{m,v,u} Pyy[y,u,v,x] S_[e,k,m] Lt[k,n,u,x]
    #                   Bt[m,j,v,x]
    t2 = [[None for _ in range(q)] for _ in range(Y)]
    for m in range(DB):
        t1m = None                                  # [e, n, u, x, L]
        for k in range(DL):
            c = (S_[:, k, m, :][:, None, None, None, :]
                 * Lt[k][None, :, :, :, :])
            t1m = c if t1m is None else t1m + c
        for v in range(Y):
            for x in range(q):
                Btj = Bt[m, :, v, x, :]             # [j, L]
                for y in range(Y):
                    zt = None                       # [e, n, L]
                    for uu in range(Y):
                        c = Pyy[y, uu, v, x] * t1m[:, :, uu, x, :]
                        zt = c if zt is None else zt + c
                    c2 = zt[:, :, None, :] * Btj[None, None, :, :]
                    if t2[y][x] is None:
                        t2[y][x] = c2
                    else:
                        t2[y][x] = t2[y][x] + c2    # [e, n, j, L]

    # Nt[e,y,x,b] = sum_{n,j} t2[y][x][e,n,j] Wt1[n,j,b]
    # S2[f,n,j] = sum_{e,y,x} Ft[y,x,f,e] t2[y][x][e,n,j]  — MXU per (y, x)
    s2 = None
    for y in range(Y):
        for x in range(q):
            tyx = t2[y][x]
            acc = None                              # [e, b, L]
            for n in range(DL):
                # NB: keep the static-int index and the newaxis insert as
                # SEPARATE getitems — a mixed `[:, n, :, None, :]` is
                # rewritten by jnp into a lax.gather, and Mosaic only
                # lowers 2-D gathers (fails at D=20 on real TPU).
                c = jnp.sum(tyx[:, n][:, :, None, :] * Wt1[n][None, :, :, :],
                            axis=1)
                acc = c if acc is None else acc + c
            nt_out[0, :, y, x, :, :] = acc
            lhs = Ft[y, x]                          # [f, e]
            rhs = tyx.reshape(sl, DL * DB * _LANES)
            c = jax.lax.dot_general(
                lhs, rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=lhs.dtype)
            s2 = c if s2 is None else s2 + c        # [f, DL*DB*L]
    s2 = s2.reshape(sl, DL, DB, _LANES)
    s_scr[:] = s2 / _lane_scale(s2, (0, 1, 2))

    mt_out[0] = Mt


def _merge_fscan(L1, B1, Pyy, Phik, Ws, S_init, *, DL, DB, Y, q, sr, sl,
                 interpret=False):
    """Forward scan -> (Ns [S, sl, Y, q, sr, Np], Ms [S, sl, sr, Np])."""
    S, Np = L1.shape[0], L1.shape[-1]
    grid = (Np // _LANES, S)
    fwd = lambda i, s: (s, 0, 0, 0, 0, i)
    w_at = lambda i, s: (s, 0, 0, 0, i)
    w_next = lambda i, s: (jnp.minimum(s + 1, S - 1), 0, 0, 0, i)
    variant = _f_variant(DL, DB, Y, q, sr, sl)
    body = (_merge_fstep_kernel_lean if variant == "lean"
            else _merge_fstep_kernel)
    return pl.pallas_call(
        partial(body, DL=DL, DB=DB, Y=Y, q=q, sr=sr, sl=sl,
                S=S),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, DL, DL, Y, q, _LANES), fwd),
            pl.BlockSpec((1, DB, DB, Y, q, _LANES), fwd),
            pl.BlockSpec((Y, Y, Y, q), lambda i, s: (0, 0, 0, 0)),
            pl.BlockSpec((1, Y, q, sl, sl), lambda i, s: (s, 0, 0, 0, 0)),
            pl.BlockSpec((1, DL, DB, sr, _LANES), w_at),
            pl.BlockSpec((1, DL, DB, sr, _LANES), w_next),
            pl.BlockSpec((sl, DL, DB, _LANES), lambda i, s: (0, 0, 0, i)),
        ],
        out_specs=(
            pl.BlockSpec((1, sl, Y, q, sr, _LANES), fwd),
            pl.BlockSpec((1, sl, sr, _LANES), lambda i, s: (s, 0, 0, i)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, sl, Y, q, sr, Np), L1.dtype),
            jax.ShapeDtypeStruct((S, sl, sr, Np), L1.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((sl, DL, DB, _LANES), L1.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(L1, B1, Pyy, Phik, Ws, Ws, S_init)


# ---------------------------------------------------------------------------
# MPEM3 -> MPEM2 kernels (same two-scan STTA as ops/stta.mpem3_stta_batched)
# ---------------------------------------------------------------------------

def _mpem3_wstep_kernel(bt, pt, ws_out, w_scr, *, Db, qi, qj, sr):
    """One reverse-sketch step of the MPEM3 conversion, 128-instance block.

    bt: [1, Db, Db, qi, qj, qi', L]; pt: [1, sr, sr, qi, qj] (shared psi_t);
    ws_out: [1, Db, qi, sr, L]; w_scr carry [Db, qi, sr, L].
    """
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        w_scr[:] = _onehot000(Db, qi, sr, w_scr.dtype)

    Bt = bt[0]                                     # [m, n, i, j, r, L]
    Pt = pt[0]                                     # [b, c, i, j]
    W = w_scr[:]                                   # [n, r, c, L]

    # t1[m,i,j,c] = sum_{n,r} Bt[m,n,i,j,r] W[n,r,c]
    t1 = None
    for n in range(Db):
        for r in range(qi):
            c = (Bt[:, n, :, :, r, :][:, :, :, None, :]
                 * W[n, r, :, :][None, None, None, :, :])
            t1 = c if t1 is None else t1 + c       # [m, i, j, c, L]

    # W2[m,i,b] = sum_{j,c} t1[m,i,j,c] Pt[b,c,i,j]
    w2 = None
    for j in range(qj):
        for cc in range(sr):
            c = (t1[:, :, j, cc, :][:, :, None, :]
                 * Pt[:, cc, :, j].T[None, :, :, None])
            w2 = c if w2 is None else w2 + c       # [m, i, b, L]

    w2 = w2 / _lane_scale(w2, (0, 1, 2))
    w_scr[:] = w2
    ws_out[0] = w2


def _mpem3_fstep_kernel(bt, ft, wt, wt1, sinit, nt_out, mt_out, s_scr, *,
                        Db, qi, qj, sr, sl, S):
    """One forward step: carry S_{t-1}, emit (N_t, M_{t-1}).

    bt as in the W kernel; ft: [1, sl, sl, qi, qj] (shared phi_t, indexed
    Ft[e, f, i, j] as in the ``enijr,efij->fnr`` reference einsum);
    wt/wt1: [1, Db, qi, sr, L]; sinit: [sl, Db, qi, L];
    nt: [1, sl, qi, qj, sr, L]; mt: [1, sl, sr, L].
    """
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        s_scr[:] = sinit[:]

    S_ = s_scr[:]                                  # [e, m, i, L]
    Bt = bt[0]
    Ft = ft[0]                                     # [e, f, i, j]
    Wt = wt[0]
    Wt1 = jnp.where(s == S - 1, _onehot000(Db, qi, sr, wt1.dtype), wt1[0])

    # Mt[e,b] = sum_{m,i} S_[e,m,i] Wt[m,i,b]
    mt = None
    for m in range(Db):
        for i in range(qi):
            c = S_[:, m, i, :][:, None, :] * Wt[m, i][None, :, :]
            mt = c if mt is None else mt + c       # [e, b, L]

    # t1[e,n,i,j,r] = sum_m S_[e,m,i] Bt[m,n,i,j,r]
    t1 = None
    for m in range(Db):
        c = (S_[:, m, :, :][:, None, :, None, None, :]
             * Bt[m][None, :, :, :, :, :])
        t1 = c if t1 is None else t1 + c           # [e, n, i, j, r, L]

    # Nt[e,i,j,b] = sum_{n,r} t1[e,n,i,j,r] Wt1[n,r,b]
    nt = None
    for n in range(Db):
        for r in range(qi):
            c = (t1[:, n, :, :, r, :][:, :, :, None, :]
                 * Wt1[n, r][None, None, None, :, :])
            nt = c if nt is None else nt + c       # [e, i, j, b, L]

    # S2[f,n,r] = sum_{e,i,j} Ft[e,f,i,j] t1[e,n,i,j,r]  — MXU per (i, j)
    s2 = None
    for i in range(qi):
        for j in range(qj):
            lhs = Ft[:, :, i, j]                   # [e, f]
            rhs = t1[:, :, i, j, :, :].reshape(sl, Db * qi * _LANES)
            c = jax.lax.dot_general(
                lhs, rhs, (((0,), (0,)), ((), ())),
                preferred_element_type=lhs.dtype)
            s2 = c if s2 is None else s2 + c
    s2 = s2.reshape(sl, Db, qi, _LANES)
    s_scr[:] = s2 / _lane_scale(s2, (0, 1, 2))

    nt_out[0] = nt
    mt_out[0] = mt


def _mpem3_wscan(B1, Psi, *, Db, qi, qj, sr, interpret=False):
    """B1: [S, Db, Db, qi, qj, qi', Np]; Psi: [S, sr, sr, qi, qj] ->
    Ws [S, Db, qi, sr, Np] (reverse-scan emissions, Ws[t] = W_{t+1})."""
    S, Np = B1.shape[0], B1.shape[-1]
    grid = (Np // _LANES, S)
    rev = lambda i, s: (S - 1 - s, 0, 0, 0, 0, 0, i)
    return pl.pallas_call(
        partial(_mpem3_wstep_kernel, Db=Db, qi=qi, qj=qj, sr=sr),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Db, Db, qi, qj, qi, _LANES), rev),
            pl.BlockSpec((1, sr, sr, qi, qj),
                         lambda i, s: (S - 1 - s,) + (0,) * 4),
        ],
        out_specs=pl.BlockSpec((1, Db, qi, sr, _LANES),
                               lambda i, s: (S - 1 - s, 0, 0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((S, Db, qi, sr, Np), B1.dtype),
        scratch_shapes=[pltpu.VMEM((Db, qi, sr, _LANES), B1.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(B1, Psi)


def _mpem3_fscan(B1, Phi, Ws, S_init, *, Db, qi, qj, sr, sl,
                 interpret=False):
    """Forward scan -> (Ns [S, sl, qi, qj, sr, Np], Ms [S, sl, sr, Np])."""
    S, Np = B1.shape[0], B1.shape[-1]
    grid = (Np // _LANES, S)
    fwd = lambda i, s: (s, 0, 0, 0, 0, 0, i)
    w_at = lambda i, s: (s, 0, 0, 0, i)
    w_next = lambda i, s: (jnp.minimum(s + 1, S - 1), 0, 0, 0, i)
    return pl.pallas_call(
        partial(_mpem3_fstep_kernel, Db=Db, qi=qi, qj=qj, sr=sr, sl=sl, S=S),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Db, Db, qi, qj, qi, _LANES), fwd),
            pl.BlockSpec((1, sl, sl, qi, qj), lambda i, s: (s, 0, 0, 0, 0)),
            pl.BlockSpec((1, Db, qi, sr, _LANES), w_at),
            pl.BlockSpec((1, Db, qi, sr, _LANES), w_next),
            pl.BlockSpec((sl, Db, qi, _LANES), lambda i, s: (0, 0, 0, i)),
        ],
        out_specs=(
            pl.BlockSpec((1, sl, qi, qj, sr, _LANES),
                         lambda i, s: (s, 0, 0, 0, 0, i)),
            pl.BlockSpec((1, sl, sr, _LANES), lambda i, s: (s, 0, 0, i)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, sl, qi, qj, sr, Np), B1.dtype),
            jax.ShapeDtypeStruct((S, sl, sr, Np), B1.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((sl, Db, qi, _LANES), B1.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(B1, Phi, Ws, Ws, S_init)


def _mpem3_live_bytes(Db, qi, qj, sr, sl):
    """Padded live-set estimate for the mpem3 forward step (the larger of
    the two): B3 stream dominates."""
    return (2 * _pb(Db, Db, qi, qj, qi)           # b3 blocks (double-buf)
            + 2 * 2 * _pb(Db, qi, sr)             # wt/wt1 blocks
            + _pb(sl, Db, qi, qj, qi)             # t1
            + 2 * _pb(sl, Db, qi)                 # carry + s2
            + _pb(sl, qi, qj, sr)                 # nt
            + 2 * (_pb(sl, qi, qj, sr) + _pb(sl, sr)))    # out blocks


def mpem3_fused_supported(Db: int, qi: int, qj: int, Dout: int, dtype,
                          oversample: int = 4) -> bool:
    """Can the fused MPEM3 kernels run this conversion?"""
    if not _HAVE_PALLAS or os.environ.get("MPBP_FUSED", "1") == "0":
        return False
    sr = min(Dout, Db * qi)
    sl = min(sr + oversample, max(Db * qi, 1))
    fits = _mpem3_live_bytes(Db, qi, qj, sr, sl) <= _VMEM_BUDGET
    if _FORCE_INTERPRET:
        return fits
    if _platform() != "tpu":
        return False
    if dtype != jnp.float32:
        return False
    return fits


#: max instances per fused-scan pallas_call: bounds the live lanes-last
#: stream copies (the kernels read a transposed copy of their input whose
#: tiled layout pads ~4x — the whole-batch copy overflowed HBM at bench
#: scale).  Chunks run sequentially; 2048 instances = 16 lane blocks, still
#: far above the per-step latency floor.
_MPEM3_CHUNK = 2048


def mpem3_stta_fused(B3, logz, Dout: int, key, oversample: int = 4,
                     interpret: bool = False):
    """Fused-kernel MPEM3 -> MPEM2; drop-in for ``mpem3_stta_batched``.

    B3: [B, T1, Db, Db, qi, qj, qi'] -> (cores [B, T1, Dout, Dout, qi*qj],
    logz [B]).  Same sketches and algebra as the XLA path.
    """
    from .stta import _solve_batched, _eps_for

    Bn, T1, Db, _, qi, qj, _ = B3.shape
    P = qi * qj
    dtype = B3.dtype
    eps = _eps_for(dtype)
    sr = min(Dout, Db * qi)
    sl = min(sr + oversample, max(Db * qi, 1))
    S = T1 - 1

    kphi, kpsi = jax.random.split(key)
    phi = jax.random.normal(kphi, (T1, sl, sl, qi, qj), dtype)
    psi = jax.random.normal(kpsi, (T1, sr, sr, qi, qj), dtype)

    # ---- site-0 boundary (XLA; one time row) -------------------------------
    S_init = jnp.einsum("fij,znijr->zfnr", phi[0, 0], B3[:, 0, 0])
    S_init = S_init / _safe_scale(
        jnp.max(jnp.abs(S_init), axis=(1, 2, 3), keepdims=True))

    # ---- the two fused scans, chunked over instances (see _chunked) --------
    def scans_chunk(xs):
        B3_c, S_init_c = xs
        nb = B3_c.shape[0]
        B1 = _pad_lanes(jnp.moveaxis(B3_c[:, 1:], 0, -1), -1)
        S_init_k = _pad_lanes(jnp.moveaxis(S_init_c, 0, -1), -1)
        Ws = _mpem3_wscan(B1, psi[1:], Db=Db, qi=qi, qj=qj, sr=sr,
                          interpret=interpret)
        Ns_k, Ms_k = _mpem3_fscan(B1, phi[1:], Ws, S_init_k, Db=Db, qi=qi,
                                  qj=qj, sr=sr, sl=sl, interpret=interpret)
        return (jnp.moveaxis(Ns_k, -1, 0)[:nb].reshape(nb, S, sl, P * sr),
                jnp.moveaxis(Ms_k, -1, 0)[:nb],
                jnp.moveaxis(Ws[0], -1, 0)[:nb])

    Ns, Ms, Ws0 = _chunked(scans_chunk, (B3, S_init), Bn)

    # ---- assembly: identical to mpem3_stta_batched -------------------------
    c0 = jnp.einsum("znijr,znrb->zijb", B3[:, 0, 0], Ws0)
    first = jnp.zeros((Bn, sr, sr, P), dtype)
    first = first.at[:, 0].set(c0.reshape(Bn, P, sr).transpose(0, 2, 1))
    Bsol = _solve_batched(Ms, Ns, eps)
    Bsol = Bsol.reshape(Bn, S, sr, P, sr).transpose(0, 1, 2, 4, 3)
    last = jnp.zeros((Bn, sr, sr, P), dtype)
    last = last.at[:, :, 0, :].set(Bsol[:, -1][:, :, 0, :])
    cores = jnp.concatenate([first[:, None], Bsol[:, :-1], last[:, None]],
                            axis=1)
    cores = _fit_axis(_fit_axis(cores, 2, Dout), 3, Dout)
    return cores, logz


def mpem3_stta_fused_tm(B3f, logz, Db: int, qi: int, qj: int, Dout: int,
                        key, oversample: int = 4, interpret: bool = False):
    """Fused-kernel MPEM3 -> MPEM2 from the TIME-MAJOR FLAT layout — drop-in
    for ``stta.mpem3_stta_batched_tm``.

    B3f: [T1, B, qi*qj*qi'*Db*Db], column order ``(i, j, r, m, n)`` (the
    layout ``bp._bucket_update_batched`` builds for the *message* conversion).
    The round-3 attempt to fuse this path materialized the whole-batch 7-D
    B3, whose (2,128)-tiled small-trailing-dim layout padded to a +8 GB HBM
    temp at bench scale (measured; note at ``bp.py`` call site).  Here the
    only full-batch array is the flat [B, T1, cols] transpose (pads ~1.0x);
    the padded lanes-last kernel streams exist per 2048-instance chunk only
    (~0.4 GB live, sequential under ``lax.map``)."""
    from .stta import _solve_batched, _eps_for

    T1, Bn = B3f.shape[0], B3f.shape[1]
    P = qi * qj
    dtype = B3f.dtype
    eps = _eps_for(dtype)
    sr = min(Dout, Db * qi)
    sl = min(sr + oversample, max(Db * qi, 1))
    S = T1 - 1

    kphi, kpsi = jax.random.split(key)
    phi = jax.random.normal(kphi, (T1, sl, sl, qi, qj), dtype)
    psi = jax.random.normal(kpsi, (T1, sr, sr, qi, qj), dtype)

    # ---- site-0 boundary (XLA; one time row) -------------------------------
    B300 = B3f[0].reshape(Bn, qi, qj, qi, Db, Db)[..., 0, :]   # [z,i,j,r,n]
    S_init = jnp.einsum("fij,zijrn->zfnr", phi[0, 0], B300)
    S_init = S_init / _safe_scale(
        jnp.max(jnp.abs(S_init), axis=(1, 2, 3), keepdims=True))

    # chunk along the INSTANCE axis of the time-major input directly (no
    # full-batch [B, T1, cols] transpose — that copy alone is ~5 GB at the
    # chunked-sweep scale shape); at most two kernel shapes compile (full
    # chunk + remainder)
    def scans_chunk(B3_c, S_init_c):
        nb = B3_c.shape[1]
        Bk = B3_c[1:].reshape(S, nb, qi, qj, qi, Db, Db)
        B1 = _pad_lanes(jnp.transpose(Bk, (0, 5, 6, 2, 3, 4, 1)), -1)
        S_init_k = _pad_lanes(jnp.moveaxis(S_init_c, 0, -1), -1)
        Ws = _mpem3_wscan(B1, psi[1:], Db=Db, qi=qi, qj=qj, sr=sr,
                          interpret=interpret)
        Ns_k, Ms_k = _mpem3_fscan(B1, phi[1:], Ws, S_init_k, Db=Db, qi=qi,
                                  qj=qj, sr=sr, sl=sl, interpret=interpret)
        return (jnp.moveaxis(Ns_k, -1, 0)[:nb].reshape(nb, S, sl, P * sr),
                jnp.moveaxis(Ms_k, -1, 0)[:nb],
                jnp.moveaxis(Ws[0], -1, 0)[:nb])

    parts = [scans_chunk(B3f[:, lo:lo + _MPEM3_CHUNK],
                         S_init[lo:lo + _MPEM3_CHUNK])
             for lo in range(0, Bn, _MPEM3_CHUNK)]
    if len(parts) == 1:
        Ns, Ms, Ws0 = parts[0]
    else:
        Ns, Ms, Ws0 = (jnp.concatenate([p[k] for p in parts])
                       for k in range(3))

    # ---- assembly: identical to _mpem3_stta_tm -----------------------------
    c0 = jnp.einsum("zijrn,znrb->zijb", B300, Ws0)
    first = jnp.zeros((Bn, sr, sr, P), dtype)
    first = first.at[:, 0].set(c0.reshape(Bn, P, sr).transpose(0, 2, 1))
    Bsol = _solve_batched(Ms, Ns, eps)
    Bsol = Bsol.reshape(Bn, S, sr, P, sr).transpose(0, 1, 2, 4, 3)
    last = jnp.zeros((Bn, sr, sr, P), dtype)
    last = last.at[:, :, 0, :].set(Bsol[:, -1][:, :, 0, :])
    cores = jnp.concatenate([first[:, None], Bsol[:, :-1], last[:, None]],
                            axis=1)
    cores = _fit_axis(_fit_axis(cores, 2, Dout), 3, Dout)
    return cores, logz


def _band_indicator(Y, off, q, dtype):
    """Dense prob_yy for the sum-type band: [Y(y), Y(u), Y(v), q]."""
    y = np.arange(Y)[:, None, None]
    u = np.arange(Y)[None, :, None]
    v = np.arange(Y)[None, None, :]
    band = (u == y + off - v) & (y + off - v >= 0) & (y + off - v < Y)
    return jnp.asarray(np.broadcast_to(band[..., None], (Y, Y, Y, q)), dtype)


def merge_stta_fused(Lc, Llz, Bc, Blz, pyy, Dout: int, Y: int, q: int, key,
                     oversample: int = 4, yy_off: int | None = None,
                     interpret: bool = False):
    """Fused-kernel cavity merge; drop-in for ``merge_stta_batched``.

    Lc: [B, T1, DL, DL, Y*q]; Bc: [B, T1, DB, DB, Y*q]; pyy [Y, Y, Y, q]
    shared (ignored when ``yy_off`` selects the banded merge).  Same sketches
    and algebra as the XLA path — gated for near-equality by
    tests/test_fused_stta.py.
    """
    from .stta import _solve_batched, _eps_for

    Bn, T1, DL = Lc.shape[0], Lc.shape[1], Lc.shape[2]
    DB = Bc.shape[2]
    P = Y * q
    dtype = Lc.dtype
    eps = _eps_for(dtype)
    sr = min(Dout, DL * DB)
    sl = min(sr + oversample, DL * DB)
    S = T1 - 1

    kphi, kpsi = jax.random.split(key)
    phi = jax.random.normal(kphi, (T1, sl, sl, Y, q), dtype)
    psi = jax.random.normal(kpsi, (T1, sr, sr, Y, q), dtype)

    if yy_off is None:
        Th = jnp.einsum("tabyx,yuvx->tabuvx", psi, pyy)
        Pyy_d = pyy.astype(dtype)
    else:
        Th = y_expand(psi, yy_off, axis=3, mode="sum")
        Pyy_d = _band_indicator(Y, yy_off, q, dtype)
    # kernel layouts: Th [t, b, v, u, x, a]; phi premix [t, y, x, f, e]
    Thk = jnp.transpose(Th, (0, 2, 4, 3, 5, 1))
    Phik = jnp.transpose(phi, (0, 3, 4, 2, 1))

    Lf = Lc.reshape(Bn, T1, DL, DL, Y, q)
    Bf = Bc.reshape(Bn, T1, DB, DB, Y, q)

    # ---- site-0 boundary (XLA; one time row) -------------------------------
    if yy_off is None:
        c0 = jnp.einsum("yuvx,znux,zjvx->znjyx", pyy, Lf[:, 0, 0], Bf[:, 0, 0])
    else:
        LT = y_expand(Lf[:, 0, 0], yy_off, axis=2, mode="diff")
        c0 = jnp.einsum("znyvx,zjvx->znjyx", LT, Bf[:, 0, 0])
    S_init = jnp.einsum("fyx,znjyx->zfnj", phi[0, 0], c0)
    S_init = S_init / _safe_scale(
        jnp.max(jnp.abs(S_init), axis=(1, 2, 3), keepdims=True))

    # ---- the two fused scans, chunked over instances (see _chunked) --------
    def scans_chunk(xs):
        Lf_c, Bf_c, S_init_c = xs
        nb = Lf_c.shape[0]
        # node-last streams for the kernels
        L1 = _pad_lanes(jnp.moveaxis(Lf_c[:, 1:], 0, -1), -1)
        B1 = _pad_lanes(jnp.moveaxis(Bf_c[:, 1:], 0, -1), -1)
        S_init_k = _pad_lanes(jnp.moveaxis(S_init_c, 0, -1), -1)
        Ws = _merge_wscan(L1, B1, Thk[1:], DL=DL, DB=DB, Y=Y, q=q, sr=sr,
                          interpret=interpret)
        Ns_k, Ms_k = _merge_fscan(L1, B1, Pyy_d, Phik[1:], Ws, S_init_k,
                                  DL=DL, DB=DB, Y=Y, q=q, sr=sr, sl=sl,
                                  interpret=interpret)
        return (jnp.moveaxis(Ns_k, -1, 0)[:nb].reshape(nb, S, sl, P * sr),
                jnp.moveaxis(Ms_k, -1, 0)[:nb],
                jnp.moveaxis(Ws[0], -1, 0)[:nb])

    Ns, Ms, Ws0 = _chunked(scans_chunk, (Lf, Bf, S_init), Bn)

    # ---- assembly: identical to merge_stta_batched -------------------------
    v0 = jnp.einsum("znjyx,znjb->zbyx", c0, Ws0).reshape(Bn, sr, P)
    first = jnp.zeros((Bn, sr, sr, P), dtype).at[:, 0].set(v0)
    Bsol = _solve_batched(Ms, Ns, eps)
    Bsol = Bsol.reshape(Bn, S, sr, P, sr).transpose(0, 1, 2, 4, 3)
    last = jnp.zeros((Bn, sr, sr, P), dtype)
    last = last.at[:, :, 0, :].set(Bsol[:, -1][:, :, 0, :])
    cores = jnp.concatenate([first[:, None], Bsol[:, :-1], last[:, None]],
                            axis=1)
    cores = _fit_axis(_fit_axis(cores, 2, Dout), 3, Dout)
    m = _safe_scale(jnp.max(jnp.abs(cores), axis=(2, 3, 4)))
    cores = cores / m[:, :, None, None, None]
    logz = Llz + Blz - jnp.sum(jnp.log(m), axis=1)
    return cores, logz
