"""Matrix-free preconditioned conjugate gradients.

TPU-native replacement for the reference's Trilinos-backed Krylov stack
(reference: SolverCG uses at inverse_matrix.hpp:93-120 and
boussinesq_model.tpp:1426-1440): the operator is a fused stencil
closure, the loop is a `lax.while_loop` compiled into the step program,
and every inner product is a single global reduction (the only global
collective on a sharded mesh — `psum` under the hood via GSPMD).

Tolerance semantics match the reference: stop when
||r|| <= rtol * ||b||  (SolverControl(max_iter, rtol * rhs.l2_norm())),
with two robustness additions for low precision:
  * the relative tolerance is clamped to 16*eps(dtype) — f32 cannot
    express the reference's 1e-8/1e-12 f64 tolerances;
  * the best iterate (smallest true-residual norm) is tracked and
    returned, and the loop aborts once the residual grows 4x above the
    best seen — finite-precision CG driven past its attainable accuracy
    diverges rather than stagnates, which must not corrupt the result
    (the reference leans on Trilinos + f64 and never hits this; see
    also its deliberate swallowing of NoConvergence,
    approximate_inverse.hpp:120-123).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray     # scalar int32
    residual_norm: jnp.ndarray  # scalar, best ||r|| reached
    converged: jnp.ndarray      # scalar bool
    # per-iteration ||r|| trail (NaN-padded), present only when the
    # solve was called with record_history > 0 — the deallog-style
    # solver history of `solver diagnostics level` >= 3 (reference:
    # main.cxx:89-90). None otherwise (keeps lax.cond pytrees stable).
    history: Optional[jnp.ndarray] = None


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    # accumulate reductions in f32 at minimum (bf16 inputs upcast)
    acc = jnp.promote_types(a.dtype, jnp.float32)
    return jnp.sum(a.astype(acc) * b.astype(acc))


def cg(
    operator: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    rtol: float = 1e-8,
    atol: float = 0.0,
    maxiter: int = 500,
    preconditioner: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    divergence_factor: float = 32.0,
    record_history: int = 0,
) -> CGResult:
    """Solve A x = b for SPD matrix-free ``operator``.

    Fully jit-compatible: fixed `maxiter` bound, traced early exit via
    `lax.while_loop`. The preconditioner must be SPD as well (Jacobi /
    Chebyshev / multigrid V-cycle). Returns the best iterate seen.

    ``divergence_factor``: abort once ||r|| grows this many times above
    the best seen (plus the stop threshold). The 32x default tolerates
    the transient residual oscillation of healthy CG on ill-conditioned
    systems (e.g. the high-aspect-ratio shell Poisson operator); pass
    4.0 for a tight guard on well-conditioned systems where iterations
    past the optimum are pure waste.

    ``record_history``: when > 0, record up to that many per-iteration
    residual norms into ``CGResult.history`` (NaN-padded) — the
    analogue of deal.II's deallog solver histories at
    ``solver diagnostics level`` >= 3 (reference: main.cxx:89-90,
    SolverControl log flags). The axon TPU platform has no host
    callbacks, so histories are device arrays printed by the caller.
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    x0 = x0.astype(b.dtype)  # type-stable while_loop carry
    M = preconditioner if preconditioner is not None else (lambda r: r)

    eps = float(jnp.finfo(b.dtype).eps)
    rtol_eff = max(rtol, 16.0 * eps)
    b_norm = jnp.sqrt(_dot(b, b))
    stop = jnp.maximum(rtol_eff * b_norm, atol)

    r0 = (b - operator(x0)).astype(b.dtype)
    z0 = M(r0)
    p0 = z0.astype(b.dtype)
    rz0 = _dot(r0, z0)
    rnorm0 = jnp.sqrt(_dot(r0, r0))

    cap = int(record_history)

    def cond(state):
        x, r, p, rz, k, rnorm, x_best, rbest, hist = state
        ok = jnp.logical_and(k < maxiter, rnorm > stop)
        # divergence guard: finite-precision CG past attainable accuracy
        # blows up by orders of magnitude; see divergence_factor above
        return jnp.logical_and(ok, rnorm < divergence_factor * rbest + stop)

    def body(state):
        x, r, p, rz, k, _, x_best, rbest, hist = state
        Ap = operator(p)
        pAp = _dot(p, Ap)
        alpha = jnp.where(pAp > 0, rz / pAp, 0.0)
        # scalars accumulate in >= f32; state stays in b.dtype so the
        # while_loop carry is type-stable under bfloat16
        sdt = b.dtype
        x = (x + alpha * p).astype(sdt)
        r = (r - alpha * Ap).astype(sdt)
        z = M(r)
        rz_new = _dot(r, z)
        beta = jnp.where(rz > 0, rz_new / rz, 0.0)
        p = (z + beta * p).astype(sdt)
        rnorm = jnp.sqrt(_dot(r, r))
        if cap > 0:
            hist = hist.at[jnp.minimum(k, cap - 1)].set(
                rnorm.astype(jnp.float32))
        better = rnorm < rbest
        x_best = jnp.where(better, x, x_best)
        rbest = jnp.where(better, rnorm, rbest)
        return (x, r, p, rz_new, k + 1, rnorm, x_best, rbest, hist)

    hist0 = jnp.full((max(cap, 1),), jnp.nan, jnp.float32)
    init = (x0, r0, p0, rz0, jnp.asarray(0, jnp.int32), rnorm0, x0,
            rnorm0, hist0)
    (x, r, p, rz, k, rnorm, x_best, rbest,
     hist) = jax.lax.while_loop(cond, body, init)
    return CGResult(x=x_best, iterations=k, residual_norm=rbest,
                    converged=rbest <= stop,
                    history=hist if cap > 0 else None)
