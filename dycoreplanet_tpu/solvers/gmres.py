"""Matrix-free restarted GMRES / FGMRES.

TPU-native replacement for the reference's non-SPD Krylov paths:
SolverGMRES inside the Schur pressure solve and the approximate
inverses (reference: boussinesq_model.tpp:1332-1374,
block_schur_preconditioner.hpp:47, shifted_schur_complement.hpp:284,
nested_schur_complement.hpp:301) and SolverFGMRES with restart 30/50
for the outer block-preconditioned momentum solve (reference:
boussinesq_model.tpp:1166-1232).

Design notes (why this shape, not a port):
  * The Arnoldi orthogonalization is classical Gram-Schmidt done TWICE
    (CGS2) — each pass is one (m+1, n) x (n,) matmul pair that XLA puts
    on the MXU, instead of the reference's sequential modified-GS dot
    chain. CGS2 has MGS-level stability at matmul speed.
  * The inner loop is a `lax.fori_loop` over a fixed restart length with
    masked updates; the outer restart loop is a `lax.while_loop` with a
    true-residual convergence check — fully jit/shard compatible, every
    reduction a single global `psum` under GSPMD.
  * Right preconditioning (x = M z updates) makes the residual norm the
    TRUE residual — same property the reference exploits by using right
    preconditioning for FGMRES (tpp:1191-1201).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from dycoreplanet_tpu.solvers.cg import CGResult, _dot


def gmres(
    operator: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    rtol: float = 1e-8,
    atol: float = 0.0,
    restart: int = 30,
    maxiter: int = 300,
    preconditioner: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    flexible: bool = False,
    record_history: int = 0,
) -> CGResult:
    """Solve A x = b for a general (non-SPD) matrix-free ``operator``.

    Right-preconditioned restarted GMRES(restart); with a fixed linear
    preconditioner this coincides with FGMRES. Stops when the true
    residual satisfies ||b - A x|| <= max(rtol * ||b||, atol) (the
    reference's SolverControl semantics) or after ``maxiter`` total
    Krylov steps. Returns a CGResult for interface parity with cg().

    ``flexible=True`` gives true FGMRES (reference: SolverFGMRES,
    boussinesq_model.tpp:1191-1228): the preconditioned vectors
    z_j = M(v_j) are stored and the update is x += Z y, so M may vary
    between applications (e.g. an inner iterative solve truncated at a
    tolerance). With a fixed linear M both variants produce the same
    iterates; ``flexible`` costs one extra (restart, n) buffer.
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    M = preconditioner if preconditioner is not None else (lambda r: r)
    m = int(restart)
    shape = b.shape
    dtype = b.dtype
    n = b.size

    acc = jnp.promote_types(dtype, jnp.float32)  # small dense algebra
    eps = float(jnp.finfo(dtype).eps)
    rtol_eff = max(rtol, 16.0 * eps)
    b_norm = jnp.sqrt(_dot(b, b))
    stop = jnp.maximum(rtol_eff * b_norm, atol)

    flat = lambda v: v.reshape(n)
    unflat = lambda v: v.reshape(shape)

    def cycle(x):
        """One GMRES(m) cycle from iterate x; returns (x_new, rnorm)."""
        r = b - operator(x)
        beta = jnp.sqrt(_dot(r, r))
        inv_beta = jnp.where(beta > 0, 1.0 / beta, 0.0)

        V = jnp.zeros((m + 1, n), dtype)
        V = V.at[0].set(flat(r) * inv_beta)
        # FGMRES Z-buffer: z_j = M(v_j). Kept at a dummy size when the
        # preconditioner is declared fixed (the common case).
        Z = jnp.zeros((m, n) if flexible else (1, 1), dtype)
        H = jnp.zeros((m + 1, m), acc)        # rotated Hessenberg (-> R)
        cs = jnp.zeros((m,), acc)
        sn = jnp.zeros((m,), acc)
        g = jnp.zeros((m + 1,), acc).at[0].set(beta)

        def arnoldi(carry):
            j, V, Z, H, cs, sn, g = carry
            z = M(unflat(V[j]))
            if flexible:
                Z = Z.at[j].set(flat(z))
            w = flat(operator(z)).astype(acc)
            # CGS2: two rounds of (project onto V[0..j], subtract)
            mask = (jnp.arange(m + 1) <= j).astype(acc)
            h1 = (V @ w).astype(acc) * mask
            w = w - (V.T @ h1).astype(acc)
            h2 = (V @ w).astype(acc) * mask
            w = w - (V.T @ h2).astype(acc)
            h = h1 + h2
            hj1 = jnp.sqrt(jnp.sum(w * w))
            inv = jnp.where(hj1 > 0, 1.0 / hj1, 0.0)
            V = V.at[j + 1].set(w * inv)

            # apply the j previous Givens rotations to the new column
            def rot(i, hcol):
                hi, hi1 = hcol[i], hcol[i + 1]
                active = (i < j).astype(acc)
                c, s = cs[i], sn[i]
                new_i = c * hi + s * hi1
                new_i1 = -s * hi + c * hi1
                hcol = hcol.at[i].set(active * new_i + (1 - active) * hi)
                return hcol.at[i + 1].set(active * new_i1 + (1 - active) * hi1)

            hcol = h.at[j + 1].set(hj1)
            hcol = jax.lax.fori_loop(0, m, rot, hcol)

            # new rotation annihilating hcol[j+1]
            a_, b_ = hcol[j], hcol[j + 1]
            rho = jnp.sqrt(a_ * a_ + b_ * b_)
            inv_rho = jnp.where(rho > 0, 1.0 / rho, 0.0)
            c_new = jnp.where(rho > 0, a_ * inv_rho, 1.0)
            s_new = b_ * inv_rho
            cs = cs.at[j].set(c_new)
            sn = sn.at[j].set(s_new)
            hcol = hcol.at[j].set(rho).at[j + 1].set(0.0)
            H = H.at[:, j].set(hcol)
            g = g.at[j + 1].set(-s_new * g[j]).at[j].set(c_new * g[j])
            return (j + 1, V, Z, H, cs, sn, g)

        def arnoldi_cond(carry):
            j, V, Z, H, cs, sn, g = carry
            # |g[j]| is the Givens-rotated residual-norm estimate of
            # the iterate after j Arnoldi steps: stop the cycle as
            # soon as it meets the tolerance instead of paying the
            # remaining (masked) operator+preconditioner applications
            # — at restart 30 with convergence at ~12 steps that is
            # ~60% of the cycle's sweeps saved. Partially-built H/g
            # are already safe: unset columns have zero diagonal and
            # the back-substitution pins their y_j to 0.
            return jnp.logical_and(j < m, jnp.abs(g[j]) > stop)

        j_done, V, Z, H, cs, sn, g = jax.lax.while_loop(
            arnoldi_cond, arnoldi,
            (jnp.asarray(0, jnp.int32), V, Z, H, cs, sn, g))

        # back-substitution R y = g[:m]; R = H[:m, :m] upper triangular.
        # Happy-breakdown guard: a zero diagonal entry means the Krylov
        # space was exhausted at that step — pin the row to y_j = 0.
        alive = (jnp.abs(jnp.diag(H[:m, :m])) > 0).astype(acc)
        R = H[:m, :m] + jnp.eye(m, dtype=acc) * (1.0 - alive)
        y = jax.scipy.linalg.solve_triangular(R, g[:m] * alive, lower=False)
        if flexible:
            x_new = (x + unflat((Z.T @ y.astype(dtype)))).astype(dtype)
        else:
            dx = unflat((V[:m].T @ y).astype(acc))
            x_new = (x + M(dx)).astype(dtype)
        r_new = b - operator(x_new)
        return x_new, jnp.sqrt(_dot(r_new, r_new)), j_done

    r0 = b - operator(x0)
    rnorm0 = jnp.sqrt(_dot(r0, r0))
    max_cycles = max(1, -(-maxiter // m))

    def cond(state):
        x, rnorm, k, iters, x_best, rbest, hist = state
        return jnp.logical_and(k < max_cycles, rnorm > stop)

    cap = int(record_history)

    def body(state):
        x, rnorm, k, iters, x_best, rbest, hist = state
        x, rnorm, j_done = cycle(x)
        if cap > 0:
            # per-restart-cycle residual trail (deallog analogue,
            # reference main.cxx:89-90)
            hist = hist.at[jnp.minimum(k, cap - 1)].set(
                rnorm.astype(jnp.float32))
        better = rnorm < rbest
        x_best = jnp.where(better, x, x_best)
        rbest = jnp.where(better, rnorm, rbest)
        return (x, rnorm, k + 1, iters + j_done, x_best, rbest, hist)

    hist0 = jnp.full((max(cap, 1),), jnp.nan, jnp.float32)
    zero = jnp.asarray(0, jnp.int32)
    init = (x0, rnorm0, zero, zero, x0, rnorm0, hist0)
    (x, rnorm, k, iters, x_best, rbest,
     hist) = jax.lax.while_loop(cond, body, init)
    # iterations = Arnoldi steps actually taken (the early-exit cycle
    # makes this the true Krylov count, not k * restart)
    return CGResult(x=x_best, iterations=iters, residual_norm=rbest,
                    converged=rbest <= stop,
                    history=hist if cap > 0 else None)
