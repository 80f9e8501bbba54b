"""Direct Helmholtz solver tests: exactness of (vol - c*weak_lap)^-1
for every geometry and wall-rule stack, traced-coefficient safety, and
model-level equivalence of the direct and CG paths.

Replaces-by-construction the reference's implicit mass+diffusion Krylov
solves (InverseMatrix CG, inverse_matrix.hpp:93-120; temperature CG,
boussinesq_model.tpp:1426-1440).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dycoreplanet_tpu.grid import make_annulus, make_cuboid, make_shell
from dycoreplanet_tpu.ops.bc import BC, BCSpec
from dycoreplanet_tpu.ops import stencil as st
from dycoreplanet_tpu.solvers.helmholtz import make_helmholtz_solver

AS, NEU, PO, PF = BC.ANTISYM, BC.NEUMANN, BC.POLE, BC.POLE_FLIP


def _check_exact(geo, specs_list, c, tol=1e-11):
    wall = [s[0] for s in specs_list]
    sol = make_helmholtz_solver(geo, wall, dtype=jnp.float64,
                                use_pallas=False)
    assert sol is not None
    vol = jnp.asarray(np.broadcast_to(geo.vol, geo.cell_shape))
    rng = np.random.RandomState(42)
    x_true = jnp.asarray(rng.randn(len(specs_list), *geo.cell_shape))
    b = jnp.stack([
        vol * x_true[i] - c * st.weak_laplacian(geo, x_true[i], specs_list[i])
        for i in range(len(specs_list))
    ])
    x = sol.solve(b, jnp.asarray(c))
    err = float(jnp.max(jnp.abs(x - x_true)))
    assert err < tol, err


class TestShell:
    def test_momentum_stack(self):
        g = make_shell(8, 16, 32, 1.0, 3.0)
        u_specs = [
            [BCSpec(AS, AS), BCSpec(PO, PO), None],
            [BCSpec(AS, NEU), BCSpec(PF, PF), None],
            [BCSpec(AS, NEU), BCSpec(PF, PF), None],
        ]
        _check_exact(g, u_specs, 0.037)

    def test_temperature(self):
        g = make_shell(8, 16, 32, 1.0, 3.0)
        _check_exact(g, [[BCSpec(AS, NEU), BCSpec(PO, PO), None]], 2.1e-3)

    def test_thin_production_shell(self):
        # aqua_planet radii regime: extreme aspect ratio
        g = make_shell(8, 24, 48, 637.1, 647.1)
        u_specs = [
            [BCSpec(AS, AS), BCSpec(PO, PO), None],
            [BCSpec(AS, NEU), BCSpec(PF, PF), None],
            [BCSpec(AS, NEU), BCSpec(PF, PF), None],
        ]
        _check_exact(g, u_specs, 1e-4, tol=1e-7)

    def test_traced_coefficient(self):
        """c as a traced scalar (adaptive dt): one compile, many dt."""
        g = make_shell(4, 8, 16, 1.0, 2.0)
        specs = [[BCSpec(AS, NEU), BCSpec(PO, PO), None]]
        sol = make_helmholtz_solver(g, [specs[0][0]], dtype=jnp.float64,
                                    use_pallas=False)
        vol = jnp.asarray(np.broadcast_to(g.vol, g.cell_shape))
        rng = np.random.RandomState(3)
        x_true = jnp.asarray(rng.randn(1, *g.cell_shape))

        solve = jax.jit(sol.solve)
        for c in (1e-4, 3.3e-2, 0.7):
            b = vol[None] * x_true - c * st.weak_laplacian(
                g, x_true[0], specs[0])[None]
            x = solve(b, jnp.asarray(c))
            np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                                       atol=1e-11)


class TestAnnulus:
    def test_momentum_stack(self):
        g = make_annulus(16, 48, 1.0, 3.0)
        _check_exact(g, [[BCSpec(AS, AS), None],
                         [BCSpec(AS, NEU), None]], 0.05)

    def test_temperature(self):
        g = make_annulus(12, 36, 0.5, 1.0)
        _check_exact(g, [[BCSpec(AS, NEU), None]], 7e-3)


class TestCuboid:
    def test_momentum_stack(self):
        g = make_cuboid(8, 12, 16)
        _check_exact(g, [[BCSpec(AS, AS), None, None],
                         [BCSpec(AS, NEU), None, None],
                         [BCSpec(AS, NEU), None, None]], 0.02)

    def test_temperature(self):
        g = make_cuboid(6, 8, 8)
        _check_exact(g, [[BCSpec(AS, NEU), None, None]], 0.3)


class TestModelEquivalence:
    """The direct and CG paths must advance the model identically
    (up to the CG tolerance) — generalizing the reference's solver-path
    equivalence (block-preconditioned vs Schur, tpp:1131-1414)."""

    @pytest.mark.parametrize("dim", [2, 3])
    def test_direct_vs_cg_step(self, dim):
        from dycoreplanet_tpu.base.params import Parameters
        from dycoreplanet_tpu.models import BoussinesqModel

        def build(solver):
            p = Parameters.from_text("")
            p.space_dimension = dim
            p.cuboid_geometry = False
            p.initial_global_refinement = 3
            p.time_step = 0.01
            p.numerics.dtype = "float64"
            p.numerics.helmholtz_solver = solver
            p.numerics.temperature_tol = 1e-14
            p.numerics.helmholtz_tol = 1e-14
            p.numerics.max_cg_iters = 2000
            return BoussinesqModel(p)

        m_dir = build("direct")
        m_cg = build("cg")
        assert m_dir.helmholtz_direct is not None
        assert m_cg.helmholtz_direct is None

        s_dir = m_dir.initial_state()
        s_cg = m_cg.initial_state()
        dt = 0.01
        for _ in range(3):
            s_dir, _ = m_dir.step(s_dir, dt)
            s_cg, _ = m_cg.step(s_cg, dt)
        np.testing.assert_allclose(np.asarray(s_dir.u), np.asarray(s_cg.u),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(s_dir.T), np.asarray(s_cg.T),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(s_dir.p), np.asarray(s_cg.p),
                                   atol=1e-8)
