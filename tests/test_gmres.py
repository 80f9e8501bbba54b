"""GMRES tests: the reference's non-SPD Krylov semantics
(SolverGMRES/SolverFGMRES, boussinesq_model.tpp:1166-1232, 1332-1374)
validated against dense solves."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dycoreplanet_tpu.solvers.gmres import gmres


def _random_system(rng, n, spd=False, shift=2.0):
    A = rng.randn(n, n) / np.sqrt(n)
    if spd:
        A = A @ A.T
    A = A + shift * np.eye(n)
    b = rng.randn(n)
    return jnp.asarray(A), jnp.asarray(b)


def test_nonsymmetric_matches_dense():
    rng = np.random.RandomState(0)
    A, b = _random_system(rng, 40)
    res = gmres(lambda x: A @ x, b, rtol=1e-12, restart=40, maxiter=40)
    expect = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), expect, rtol=1e-8)
    assert bool(res.converged)


def test_restarted_converges():
    rng = np.random.RandomState(1)
    A, b = _random_system(rng, 60, shift=3.0)
    res = gmres(lambda x: A @ x, b, rtol=1e-10, restart=10, maxiter=200)
    expect = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), expect, rtol=1e-6)
    assert int(res.iterations) > 10  # actually restarted


def test_right_preconditioning_true_residual():
    rng = np.random.RandomState(2)
    A, b = _random_system(rng, 50, shift=2.5)
    diag = jnp.diag(A)
    res = gmres(lambda x: A @ x, b, rtol=1e-10, restart=25, maxiter=100,
                preconditioner=lambda r: r / diag)
    r_true = np.asarray(b) - np.asarray(A) @ np.asarray(res.x)
    # reported residual_norm is the TRUE residual under right precond
    np.testing.assert_allclose(float(res.residual_norm),
                               np.linalg.norm(r_true), rtol=1e-5, atol=1e-12)
    assert bool(res.converged)


def test_multidimensional_operand_shapes():
    rng = np.random.RandomState(3)
    n = 36
    A, b = _random_system(rng, n, shift=2.0)
    b2 = b.reshape(6, 6)
    res = gmres(lambda x: (A @ x.reshape(-1)).reshape(6, 6), b2,
                rtol=1e-10, restart=36, maxiter=36)
    expect = np.linalg.solve(np.asarray(A), np.asarray(b)).reshape(6, 6)
    np.testing.assert_allclose(np.asarray(res.x), expect, rtol=1e-7)


def test_x0_and_early_exit():
    rng = np.random.RandomState(4)
    A, b = _random_system(rng, 30, spd=True)
    x_exact = jnp.asarray(np.linalg.solve(np.asarray(A), np.asarray(b)))
    res = gmres(lambda x: A @ x, b, x0=x_exact, rtol=1e-8, restart=10)
    assert int(res.iterations) == 0  # already converged, no cycles run
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_exact))


def test_jit_compatible():
    rng = np.random.RandomState(5)
    A, b = _random_system(rng, 32, shift=2.0)

    @jax.jit
    def solve(bb):
        return gmres(lambda x: A @ x, bb, rtol=1e-10, restart=16,
                     maxiter=64).x

    expect = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(solve(b)), expect, rtol=1e-6)


def test_weak_laplacian_neumann_singularity_handled():
    """GMRES on the (singular, compatible) pressure operator — the
    reference solves the same kind of system with GMRES + zero-mean
    projection (nested_schur_complement.hpp:170-183)."""
    from dycoreplanet_tpu.grid import factory
    from dycoreplanet_tpu.ops import stencil as st
    from dycoreplanet_tpu.ops.bc import BC, BCSpec

    geo = factory.make_annulus(8, 16, 1.0, 2.0)
    specs = [BCSpec(BC.NEUMANN, BC.NEUMANN), None]
    rng = np.random.RandomState(6)
    b = jnp.asarray(rng.randn(8, 16))
    b = b - jnp.mean(b)

    def op(x):
        ax = -st.weak_laplacian(geo, x, specs)
        return ax - jnp.mean(ax)

    res = gmres(op, b, rtol=1e-9, restart=40, maxiter=400)
    r = np.asarray(b) - np.asarray(op(res.x))
    assert np.linalg.norm(r) < 1e-7 * np.linalg.norm(np.asarray(b)) + 1e-10


class TestFlexibleFGMRES:
    """True FGMRES (stored Z-vectors) for variable preconditioners —
    the reference uses SolverFGMRES precisely because its block
    preconditioner contains inner iterative solves
    (boussinesq_model.tpp:1191-1228, block_schur_preconditioner.hpp:59-67)."""

    def test_matches_plain_gmres_with_fixed_preconditioner(self):
        rng = np.random.RandomState(7)
        A, b = _random_system(rng, 48)
        d = jnp.abs(jnp.diag(A)) + 1.0
        M = lambda r: r / d
        r_fix = gmres(lambda x: A @ x, b, rtol=1e-12, restart=24,
                      maxiter=96, preconditioner=M)
        r_flex = gmres(lambda x: A @ x, b, rtol=1e-12, restart=24,
                       maxiter=96, preconditioner=M, flexible=True)
        # identical math for a fixed linear M — same iterates
        np.testing.assert_allclose(np.asarray(r_flex.x),
                                   np.asarray(r_fix.x), rtol=1e-6)
        assert bool(r_flex.converged)

    def test_inner_cg_preconditioner_converges(self):
        """FGMRES with an inner truncated-CG preconditioner (nonlinear
        in its input) still satisfies the true-residual stop — the
        strong-retry configuration of the coupled momentum solve."""
        from dycoreplanet_tpu.solvers.cg import cg

        rng = np.random.RandomState(8)
        n = 48
        S = rng.randn(n, n) / np.sqrt(n)
        A = jnp.asarray(S @ S.T + 2.0 * np.eye(n))   # SPD so CG applies
        # mild nonsymmetric part so GMRES (not CG) is required outside
        N = jnp.asarray(0.1 * (rng.randn(n, n) / np.sqrt(n)))
        K = A + N - N.T
        b = jnp.asarray(rng.randn(n))

        def M_inner(r):
            # truncated CG on the SPD part: a genuinely flexible M —
            # 3 iterations from x0=0 is nonlinear in r
            return cg(lambda x: A @ x, r, rtol=1e-12, maxiter=3).x

        res = gmres(lambda x: K @ x, b, rtol=1e-10, restart=20,
                    maxiter=200, preconditioner=M_inner, flexible=True)
        r = np.asarray(b) - np.asarray(K @ res.x)
        assert bool(res.converged)
        assert np.linalg.norm(r) <= 1e-9 * np.linalg.norm(np.asarray(b))
