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
