"""SVD truncation policies.

TPU-native re-design of the reference's ``SVDTrunc`` objects
(TensorTrains.jl surface imported at ``src/MatrixProductBP.jl:27-37``; selected
per call-site, e.g. ``test/glauber_small_tree.jl:30``, ``src/mpems.jl:161``).

On TPU all shapes are static, so "truncation" never changes array shapes:
a policy maps a (descending) singular-value vector to a 0/1 keep-mask of the
same length.  Discarded directions are *zeroed*; the enclosing sweep may then
crop the (always-sorted) bond axis to a static capacity ``Dmax``.  A tensor
train therefore represents "bond dimension <= capacity", exactly like the
reference's ragged bonds, but with XLA-friendly static layouts.

Policies mirror the reference truncators:
- ``TruncThresh(eps)``   keep sigma_i >  eps * ||sigma||_2
- ``TruncBond(d)``       keep the top d
- ``TruncBondMax(d)``    keep at most d (same keep-rule as TruncBond here)
- ``TruncBondThresh(d, eps)`` both constraints
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "SVDTrunc",
    "TruncThresh",
    "TruncBond",
    "TruncBondMax",
    "TruncBondThresh",
    "default_truncator",
]


@dataclasses.dataclass(frozen=True)
class SVDTrunc:
    """Base truncation policy: maps singular values to a keep-mask."""

    def keep_mask(self, s: jax.Array) -> jax.Array:
        """s: [..., k] descending singular values -> bool mask [..., k]."""
        raise NotImplementedError

    @property
    def max_bond(self) -> int | None:
        """Static bond cap implied by the policy (None = capacity-limited)."""
        return None


@dataclasses.dataclass(frozen=True)
class TruncThresh(SVDTrunc):
    """Discard singular values below ``eps * ||sigma||_2``.

    Mirrors the reference default ``TruncThresh(1e-6)`` (``src/mpems.jl:161``).
    ``TruncThresh(0.0)`` keeps every nonzero singular value (used by the
    exactness gates, e.g. ``test/glauber_small_tree.jl``).
    """

    eps: float = 1e-6

    def keep_mask(self, s: jax.Array) -> jax.Array:
        norm = jnp.sqrt(jnp.sum(s * s, axis=-1, keepdims=True))
        if self.eps == 0.0:
            return s > 0.0
        return s > self.eps * norm


@dataclasses.dataclass(frozen=True)
class TruncBond(SVDTrunc):
    """Keep the ``d`` largest singular values."""

    d: int

    def keep_mask(self, s: jax.Array) -> jax.Array:
        k = s.shape[-1]
        idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, len(s.shape) - 1)
        return (idx < self.d) & (s > 0.0)

    @property
    def max_bond(self) -> int | None:
        return self.d


@dataclasses.dataclass(frozen=True)
class TruncBondMax(SVDTrunc):
    """Keep at most ``d`` singular values (adaptive below the cap)."""

    d: int

    def keep_mask(self, s: jax.Array) -> jax.Array:
        idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, len(s.shape) - 1)
        return (idx < self.d) & (s > 0.0)

    @property
    def max_bond(self) -> int | None:
        return self.d


@dataclasses.dataclass(frozen=True)
class TruncBondThresh(SVDTrunc):
    """Bond cap plus relative threshold."""

    d: int
    eps: float = 0.0

    def keep_mask(self, s: jax.Array) -> jax.Array:
        idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, len(s.shape) - 1)
        norm = jnp.sqrt(jnp.sum(s * s, axis=-1, keepdims=True))
        thresh = s > self.eps * norm if self.eps > 0.0 else s > 0.0
        return (idx < self.d) & thresh

    @property
    def max_bond(self) -> int | None:
        return self.d


def default_truncator() -> SVDTrunc:
    """Reference default: ``TruncThresh(1e-6)`` (``src/mpems.jl:161``)."""
    return TruncThresh(1e-6)
