"""Batched tridiagonal solves (Thomas algorithm via lax.scan).

Building block of the spectral-direct Poisson solvers and of
line-relaxation smoothers. Solves many independent tridiagonal systems
along the LEADING axis, batched over all trailing axes — on TPU each
scan step is a fused vector op over the (large) batch, so the O(n)
sequential depth costs only n tiny steps while the lanes stay full.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def thomas_solve(
    lower: jnp.ndarray,   # (n, ...) sub-diagonal;  lower[0] unused
    diag: jnp.ndarray,    # (n, ...) main diagonal
    upper: jnp.ndarray,   # (n, ...) super-diagonal; upper[n-1] unused
    rhs: jnp.ndarray,     # (n, ...) right-hand sides
) -> jnp.ndarray:
    """Solve tridiag(lower, diag, upper) x = rhs along axis 0.

    Standard Thomas forward elimination + back substitution expressed
    as two scans. No pivoting — valid for the diagonally-dominant /
    SPD systems produced by the FV operators here.
    """
    # recurrences need >= f32 (and type-stable scan carries when the
    # coefficient arrays arrive in a narrower dtype than the rhs)
    acc = jnp.promote_types(jnp.promote_types(diag.dtype, rhs.dtype),
                            jnp.float32)
    lower, diag, upper, rhs = (a.astype(acc)
                               for a in (lower, diag, upper, rhs))

    # forward sweep: c'_i = u_i / (d_i - l_i c'_{i-1}),
    #                g_i  = (b_i - l_i g_{i-1}) / (d_i - l_i c'_{i-1})
    def fwd(carry, xs):
        c_prev, g_prev = carry
        l, d, u, b = xs
        denom = d - l * c_prev
        c = u / denom
        g = (b - l * g_prev) / denom
        return (c, g), (c, g)

    # carry shapes must match the per-step results even when the
    # coefficient arrays carry broadcast (size-1) batch axes against a
    # wider rhs (e.g. the 2-rhs Sherman-Morrison periodic solve)
    zeros_c = jnp.zeros_like(diag[0])
    zeros_g = jnp.zeros(jnp.broadcast_shapes(diag[0].shape,
                                             rhs[0].shape), acc)
    (_, _), (cs, gs) = jax.lax.scan(
        fwd, (zeros_c, zeros_g), (lower, diag, upper, rhs))

    # back substitution: x_i = g_i - c'_i x_{i+1}
    def bwd(x_next, xs):
        c, g = xs
        x = g - c * x_next
        return x, x

    _, xs_rev = jax.lax.scan(bwd, zeros_g, (cs, gs), reverse=True)
    return xs_rev
