"""Solver tests: CG on SPD stencil operators (reference tolerance
semantics: ||r|| <= rtol ||b||, inverse_matrix.hpp:93-120)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dycoreplanet_tpu.grid import make_annulus, make_cuboid
from dycoreplanet_tpu.ops.bc import BC, BCSpec
from dycoreplanet_tpu.ops import stencil as st
from dycoreplanet_tpu.solvers import cg


def test_cg_dense_spd():
    rng = np.random.RandomState(0)
    A = rng.randn(24, 24)
    A = A @ A.T + 24 * np.eye(24)
    b = rng.randn(24)
    res = cg(lambda x: jnp.asarray(A) @ x, jnp.asarray(b), rtol=1e-12, maxiter=200)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b), rtol=1e-8)
    assert bool(res.converged)


def test_cg_jits_and_counts():
    rng = np.random.RandomState(1)
    A = rng.randn(16, 16)
    A = A @ A.T + 16 * np.eye(16)
    b = jnp.asarray(rng.randn(16))

    @jax.jit
    def solve(b):
        return cg(lambda x: jnp.asarray(A) @ x, b, rtol=1e-10, maxiter=100)

    res = solve(b)
    assert int(res.iterations) <= 30
    assert bool(res.converged)


def test_cg_helmholtz_cuboid():
    # (V - dt/Re * weak_lap) x = V*b : the momentum implicit operator
    g = make_cuboid(8, 8, 8)
    specs = [BCSpec(BC.ANTISYM, BC.ANTISYM), None, None]
    vol = jnp.asarray(np.broadcast_to(g.vol, g.cell_shape))
    coef = 0.01

    def op(x):
        return vol * x - coef * st.weak_laplacian(g, x, specs)

    rng = np.random.RandomState(2)
    x_true = jnp.asarray(rng.randn(*g.cell_shape))
    b = op(x_true)
    res = cg(op, b, rtol=1e-12, maxiter=500)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_true), atol=1e-8)


def test_cg_poisson_annulus_with_nullspace():
    # pure Neumann/periodic Poisson: solvable for mean-free rhs; pin the
    # constant mode by projecting it out of the iterates' rhs
    g = make_annulus(12, 36, 1.0, 3.0)
    specs = [BCSpec(BC.NEUMANN, BC.NEUMANN), None]

    def op(x):
        return -st.weak_laplacian(g, x, specs)

    rng = np.random.RandomState(3)
    x_true = jnp.asarray(rng.randn(*g.cell_shape))
    x_true = x_true - st.volume_mean(g, x_true)
    b = op(x_true)
    res = cg(op, b, rtol=1e-11, maxiter=2000)
    x = res.x - st.volume_mean(g, res.x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), atol=1e-6)


# ---------------------------------------------------------------------------
# richardson_solve: the straight-line fast path (solvers/fixed.py).
# There is deliberately no in-graph fallback (a lax.cond costs ~0.3
# ms/step inside the scanned production loop); the converged flag must
# be HONEST so the model's host-level CG retry can fire.

from dycoreplanet_tpu.solvers import richardson_solve


def test_richardson_mass_dominated_converges():
    """A = D + small offdiag: a few Richardson steps meet the tolerance
    (the regime of the reference-config Helmholtz systems)."""
    rng = np.random.RandomState(3)
    n = 64
    off = rng.randn(n, n) * 0.002
    A = np.eye(n) + 0.5 * (off + off.T)
    A = A @ A.T  # SPD, strongly diagonal dominant
    d = jnp.asarray(np.diag(A))
    b = jnp.asarray(rng.randn(n))
    res = richardson_solve(lambda x: jnp.asarray(A) @ x, b, b / d,
                           diag=d, iters=3, rtol=1e-5)
    assert bool(res.converged)
    assert int(res.iterations) == 3
    r = np.asarray(b - jnp.asarray(A) @ res.x)
    assert np.linalg.norm(r) <= 1e-4 * np.linalg.norm(np.asarray(b))
    # the reported residual norm is the exactly-tracked one
    np.testing.assert_allclose(float(res.residual_norm),
                               np.linalg.norm(r), rtol=1e-6)


def test_richardson_reports_nonconvergence_honestly():
    """Ill-conditioned SPD system: 2 Richardson steps cannot converge
    and the flag must say so (the model escalates on it)."""
    rng = np.random.RandomState(4)
    n = 48
    Q, _ = np.linalg.qr(rng.randn(n, n))
    lam = np.geomspace(1.0, 3e3, n)
    A = (Q * lam) @ Q.T
    d = jnp.asarray(np.diag(A).copy())
    b = jnp.asarray(rng.randn(n))
    res = richardson_solve(lambda x: jnp.asarray(A) @ x, b,
                           jnp.zeros_like(b), diag=d, iters=2, rtol=1e-8)
    assert not bool(res.converged)


def test_richardson_matches_cg_solution_helmholtz():
    """On the cuboid Helmholtz operator both paths solve to the same
    tolerance; solutions agree to solver accuracy."""
    geo = make_cuboid(nz=8, ny=8, nx=8)
    specs = [BCSpec(BC.ANTISYM, BC.NEUMANN), None, None]
    vol = jnp.asarray(np.broadcast_to(geo.vol, geo.cell_shape))
    k = 0.0002  # mass-dominated regime (rho ~ 0.07)

    def op(x):
        return vol * x - k * st.weak_laplacian(geo, x, specs)

    from dycoreplanet_tpu.ops.diagonal import weak_laplacian_diagonal
    diag = vol + k * jnp.asarray(-weak_laplacian_diagonal(geo, specs))
    rng = np.random.RandomState(5)
    b = vol * jnp.asarray(rng.randn(*geo.cell_shape))
    r1 = richardson_solve(op, b, b / diag, diag=diag, iters=8, rtol=1e-9)
    r2 = cg(op, b, rtol=1e-9, maxiter=300,
            preconditioner=lambda r: r / diag)
    assert bool(r1.converged) and bool(r2.converged)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                               rtol=1e-5, atol=1e-8)
