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


class TestLineSmoother:
    """Alternating-direction line relaxation — the anisotropy remedy of
    SURVEY §7.4 (ILU/AMG replacement role, reference
    preconditioner.h:36-42). On the production lat-lon shell the stiff
    axes are LON (pole meridian convergence) and radius; point Jacobi
    defeats the V-cycle there entirely."""

    def _solve(self, g, specs, smoother, maxiter=400):
        def op(x):
            return -st.weak_laplacian(g, x, specs)

        rng = np.random.RandomState(1)
        xt = jnp.asarray(rng.randn(*g.cell_shape))
        xt = xt - jnp.mean(xt)
        b = op(xt)
        mg = PoissonMultigrid(g, specs, dtype=jnp.float64,
                              smoother=smoother)
        return cg(op, b, rtol=1e-10, maxiter=maxiter,
                  preconditioner=mg), mg, xt, op

    def test_anisotropic_shell_converges_fast(self):
        # a scaled-down production shell (same R0=1 -> R1=3 aspect and
        # axis ratios as the 32x128x256 bench grid, where point-Jacobi
        # MG-CG does NOT converge in 400 iterations and line-MG
        # measures 14; full-size numbers recorded in SCALING.md)
        from dycoreplanet_tpu.grid import make_shell
        g = make_shell(16, 64, 128, 1.0, 3.0)
        specs = [NEU, BCSpec(BC.POLE, BC.POLE), None]
        res, mg, xt, op = self._solve(g, specs, "line")
        assert bool(res.converged)
        assert int(res.iterations) <= 20
        x = res.x - jnp.mean(res.x)
        np.testing.assert_allclose(np.asarray(x), np.asarray(xt),
                                   atol=1e-6)
        # the auto-selected stiff axes include longitude (the periodic
        # Sherman-Morrison line)
        assert 2 in mg.line_axes

    def test_thin_shell_radial_line(self):
        # the SURVEY §7.4 thin-shell regime: radial spacing dominates
        from dycoreplanet_tpu.grid import make_shell
        g = make_shell(32, 32, 64, 1.0, 1.25)
        specs = [NEU, BCSpec(BC.POLE, BC.POLE), None]
        res, mg, xt, op = self._solve(g, specs, "line")
        assert bool(res.converged)
        assert 0 in mg.line_axes          # radius picked as stiff
        res_j, _, _, _ = self._solve(g, specs, "jacobi")
        assert int(res.iterations) < int(res_j.iterations) / 2

    def test_periodic_line_solve_exact(self):
        # the Sherman-Morrison periodic Thomas inverts the line block
        # exactly: on an annulus with pure-phi variation, one line
        # solve along phi must reproduce T^{-1} r to roundoff
        from dycoreplanet_tpu.grid import make_annulus
        g = make_annulus(8, 64, 1.0, 2.0)
        specs = [NEU, None]
        mg = PoissonMultigrid(g, specs, dtype=jnp.float64,
                              smoother="line")
        assert 1 in mg.line_axes
        lo, d, up, wrap = mg.lines[0][1]
        rng = np.random.RandomState(3)
        r = jnp.asarray(rng.randn(*g.cell_shape))
        x = mg._line_solve(0, 1, r)
        # verify T x = r with the periodic tridiagonal T
        xt = np.moveaxis(np.asarray(x), 1, 0)
        rt = np.moveaxis(np.asarray(r), 1, 0)
        Tx = (d * xt + lo * np.roll(xt, 1, 0) + up * np.roll(xt, -1, 0))
        Tx[0] += wrap * xt[-1]
        Tx[-1] += wrap * xt[0]
        np.testing.assert_allclose(Tx, rt, rtol=1e-10, atol=1e-10)

    def test_line_vcycle_symmetric(self):
        # reversed post-smooth axis order keeps the V-cycle symmetric
        # (CG-admissible) with the alternating-direction smoother
        from dycoreplanet_tpu.grid import make_shell
        g = make_shell(8, 16, 32, 1.0, 3.0)
        specs = [NEU, BCSpec(BC.POLE, BC.POLE), None]
        mg = PoissonMultigrid(g, specs, dtype=jnp.float64,
                              smoother="line")
        rng = np.random.RandomState(4)
        r1 = jnp.asarray(rng.randn(*g.cell_shape))
        r2 = jnp.asarray(rng.randn(*g.cell_shape))
        a = float(jnp.sum(mg(r1) * r2))
        b = float(jnp.sum(r1 * mg(r2)))
        assert a == pytest.approx(b, rel=1e-9)
