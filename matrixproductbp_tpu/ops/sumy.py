"""Sum-type (banded) y-merge support.

Every reference Glauber variant has ``prob_yy(y, y1, y2) = (y == y1 + y2 -
off)`` (0-indexed; ``glauber_bp.jl:44,80,170``): the pairwise cavity merge
over y is a banded *convolution*, not a dense 3-tensor contraction.  Using
the structure drops the merge from O(Y^3) to O(Y^2) work and removes the
``[d, Y, Y, Y, q]`` table whose size is what regresses high-degree hubs
(BASELINE.md row 4, the star-graph anchor; cf. the reference's lazy pointwise
``prob_yy`` at ``recursive_bp_factor.jl:117-131``).

The one helper here materializes the banded selection as a gather (a Toeplitz
or Hankel slab), after which every merge contraction is an ordinary einsum —
matmul-shaped in (y, b), which is exactly what the MXU wants at large Y.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["y_expand"]


def y_expand(A: jnp.ndarray, off: int, axis: int, mode: str) -> jnp.ndarray:
    """Split the y-axis of ``A`` into an index pair along the band.

    mode='diff':  out[..., y, b, ...] = A[..., y + off - b, ...]
                  (solves y == a + b - off for a given (y, b))
    mode='sum':   out[..., u, v, ...] = A[..., u + v - off, ...]
                  (evaluates at y = u + v - off for a given (u, v))

    Out-of-range indices give 0.  The new pair replaces ``axis``.
    """
    Y = A.shape[axis]
    ax = axis % A.ndim
    iy = jnp.arange(Y)[:, None]
    jb = jnp.arange(Y)[None, :]
    idx = iy + off - jb if mode == "diff" else iy + jb - off
    ok = (idx >= 0) & (idx < Y)
    out = jnp.take(A, jnp.clip(idx, 0, Y - 1).reshape(-1), axis=ax)
    shp = list(A.shape)
    out = out.reshape(shp[:ax] + [Y, Y] + shp[ax + 1:])
    mask_shape = [1] * ax + [Y, Y] + [1] * (A.ndim - ax - 1)
    return out * ok.reshape(mask_shape).astype(A.dtype)
