"""Geometric multigrid tests: hierarchy construction, V-cycle
contraction, and CG acceleration (the ILU/AMG replacement,
SURVEY.md §2.3 item 5)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dycoreplanet_tpu.grid import make_annulus, make_cuboid, make_shell
from dycoreplanet_tpu.ops.bc import BC, BCSpec
from dycoreplanet_tpu.ops import stencil as st
from dycoreplanet_tpu.solvers import cg
from dycoreplanet_tpu.solvers.multigrid import PoissonMultigrid

NEU = BCSpec(BC.NEUMANN, BC.NEUMANN)


def _setup(kind):
    if kind == "cuboid":
        g = make_cuboid(16, 16, 16)
        specs = [NEU, None, None]
    elif kind == "annulus":
        g = make_annulus(16, 96, 1.0, 3.0)
        specs = [NEU, None]
    else:
        g = make_shell(8, 16, 32, 1.0, 3.0)
        specs = [NEU, BCSpec(BC.POLE, BC.POLE), None]
    return g, specs


@pytest.mark.parametrize("kind", ["cuboid", "annulus", "shell"])
def test_hierarchy_shapes(kind):
    g, specs = _setup(kind)
    mg = PoissonMultigrid(g, specs, dtype=jnp.float64)
    assert len(mg.geos) >= 2
    for fine, coarse in zip(mg.geos, mg.geos[1:]):
        assert all(c == f // 2 for f, c in zip(fine.cell_shape, coarse.cell_shape))
        # coarse metrics stay exact: same total volume
        assert coarse.total_volume == pytest.approx(fine.total_volume, rel=1e-12)


@pytest.mark.parametrize("kind", ["cuboid", "annulus", "shell"])
def test_transfer_operators_adjoint(kind):
    # restriction (child sum) must be the transpose of prolongation
    # (pc injection): <R r, x>_c == <r, P x>_f
    g, specs = _setup(kind)
    mg = PoissonMultigrid(g, specs, dtype=jnp.float64)
    rng = np.random.RandomState(0)
    r = jnp.asarray(rng.randn(*mg.geos[0].cell_shape))
    xc = jnp.asarray(rng.randn(*mg.geos[1].cell_shape))
    lhs = float(jnp.sum(mg._restrict(r) * xc))
    rhs = float(jnp.sum(r * mg._prolong(xc)))
    assert lhs == pytest.approx(rhs, rel=1e-12)


@pytest.mark.parametrize("kind", ["cuboid", "annulus"])
def test_cg_acceleration(kind):
    g, specs = _setup(kind)
    mg = PoissonMultigrid(g, specs, dtype=jnp.float64)

    def op(x):
        return -st.weak_laplacian(g, x, specs)

    rng = np.random.RandomState(1)
    x_true = jnp.asarray(rng.randn(*g.cell_shape))
    x_true = x_true - jnp.mean(x_true)
    b = op(x_true)
    res_mg = cg(op, b, rtol=1e-10, maxiter=200, preconditioner=mg)
    res_pl = cg(op, b, rtol=1e-10, maxiter=2000)
    assert bool(res_mg.converged)
    assert int(res_mg.iterations) < int(res_pl.iterations) / 3
    x = res_mg.x - jnp.mean(res_mg.x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), atol=1e-6)


def test_preconditioner_is_symmetric():
    # V(n,n) with symmetric smoother and R = P^T must be symmetric:
    # <M r1, r2> == <r1, M r2> (required for CG validity)
    g, specs = _setup("annulus")
    mg = PoissonMultigrid(g, specs, dtype=jnp.float64)
    rng = np.random.RandomState(2)
    r1 = jnp.asarray(rng.randn(*g.cell_shape))
    r2 = jnp.asarray(rng.randn(*g.cell_shape))
    a = float(jnp.sum(mg(r1) * r2))
    b = float(jnp.sum(r1 * mg(r2)))
    assert a == pytest.approx(b, rel=1e-9)
