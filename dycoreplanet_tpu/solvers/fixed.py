"""Fixed-iteration Jacobi-Richardson solve for mass-dominated systems.

At the reference configurations the implicit momentum/temperature
Helmholtz systems are MASS-dominated: A = V + k(-L) with k = dt/Re (or
dt/Pe) small, so the Jacobi-preconditioned spectrum lies in (1-rho,
1+rho) with rho = k*sum|offdiag| / (vol + k*sum|offdiag|) << 1 over the
bulk. Preconditioned CG converges in 0-1 iterations — but the
`lax.while_loop` scaffolding (8-array carry, best-iterate tracking, a
traced exit test per iteration) costs ~0.1 ms per solve at 32x128x256
on TPU v5e, an order of magnitude more than the operator applies it
performs (measured: helmholtz_cg 0.126 ms at ZERO iterations vs
0.032 ms per raw operator apply; scripts/perf_breakdown.py).

This module replaces the loop with a STRAIGHT-LINE k-step
Jacobi-preconditioned Richardson iteration

    x_{j+1} = x_j + D^{-1} (b - A x_j)

(error contraction factor max|1 - lambda(D^-1 A)| = rho < 1 by
Gershgorin for the weak-form Helmholtz operators), tracks the residual
exactly (r_{j+1} = r_j - A D^{-1} r_j, no extra apply), and evaluates
the reference's stopping test ||r|| <= rtol*||b|| (SolverControl
semantics, reference: boussinesq_model.tpp:1426-1440) into the returned
``converged`` flag.

There is deliberately NO in-graph fallback: a `lax.cond` branch to CG
was measured to cost ~0.3 ms/step inside the scanned production loop
(the cond acts as a fusion/materialization barrier for every captured
field). Instead the model consumes ``converged`` the way the reference
handles NoConvergence — detect, then RETRY the step with the stronger
solver at the host level (reference: boussinesq_model.tpp:1203-1232
catches the exception and re-runs with a stronger preconditioner). See
BoussinesqModel.run / step for the escalation wiring; the fast path
compiles to a handful of fused stencil sweeps with one global
reduction.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from dycoreplanet_tpu.solvers.cg import CGResult, _dot


def richardson_solve(
    operator: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: jnp.ndarray,
    *,
    diag: jnp.ndarray,
    iters: int = 2,
    rtol: float = 1e-8,
    record_history: int = 0,
) -> CGResult:
    """``iters`` unrolled Jacobi-Richardson steps on A x = b.

    ``diag`` is the operator diagonal (the Jacobi preconditioner).
    The ``converged`` flag evaluates cg()'s stopping test
    ||r|| <= max(rtol, 16 eps)*||b|| on the exactly-tracked residual;
    callers decide how to escalate when it is False (the model retries
    the step with the full CG path, mirroring the reference's
    NoConvergence retry, boussinesq_model.tpp:1203-1232).
    """
    x = x0.astype(b.dtype)
    eps = float(jnp.finfo(b.dtype).eps)
    rtol_eff = max(rtol, 16.0 * eps)

    r = b - operator(x)
    hist = []
    for j in range(iters):
        dx = r / diag
        x = x + dx
        r = r - operator(dx)
        if record_history > 0:
            hist.append(jnp.sqrt(_dot(r, r)).astype(jnp.float32))

    rnorm = jnp.sqrt(_dot(r, r))
    stop = rtol_eff * jnp.sqrt(_dot(b, b))
    history = None
    if record_history > 0:
        pad = max(record_history - len(hist), 0)
        history = jnp.concatenate(
            [jnp.stack(hist)[:record_history],
             jnp.full((pad,), jnp.nan, jnp.float32)])
    return CGResult(x=x, iterations=jnp.asarray(iters, jnp.int32),
                    residual_norm=rnorm, converged=rnorm <= stop,
                    history=history)
