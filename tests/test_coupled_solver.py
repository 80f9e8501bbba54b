"""Coupled saddle-point momentum solve vs projection, and the two
coupled paths against each other (reference: solve_NSE_block_preconditioned
vs solve_NSE_Schur_complement, boussinesq_model.tpp:1131-1414)."""

import copy

import numpy as np
import pytest

from dycoreplanet_tpu.base.params import Parameters
from dycoreplanet_tpu.models import BoussinesqModel


def _params(**over):
    p = Parameters.from_text("")
    p.space_dimension = 2
    p.numerics.dtype = "float64"
    p.numerics.n_radial, p.numerics.n_lon = 8, 48
    p.physical_constants.R0 = 1.0
    p.physical_constants.atm_height = 2.0
    p.physical_constants.expansion_coefficient = 0.3
    p.physical_constants.__post_init__()
    p.reference_quantities.velocity = 1.0
    p.reference_quantities.length = 1.0
    p.reference_quantities.temperature_ref = 2.0
    p.reference_quantities.__post_init__()
    p.time_step = 0.01
    for k, v in over.items():
        setattr(p.numerics, k, v)
    return p


def _run(p, n=3):
    m = BoussinesqModel(p)
    s = m.initial_state()
    for _ in range(n):
        s, d = m.step(s, p.time_step)
    return s, d


class TestCoupledVsProjection:
    def test_same_flow_to_discretization_error(self):
        s_proj, d_proj = _run(_params())
        p2 = _params(momentum_solver="coupled")
        s_cpl, d_cpl = _run(p2)
        # Two *different* spatial discretizations of pressure-velocity
        # coupling (staggered-projection vs Rhie-Chow collocated): the
        # trajectories agree in the bulk but their discrete pressures
        # differ O(h) near walls, so compare with a coarse-grid
        # tolerance relative to the flow amplitude (~20%), plus tight
        # agreement of scalar diagnostics.
        umax = float(np.max(np.abs(np.asarray(s_proj.u))))
        np.testing.assert_allclose(np.asarray(s_cpl.u), np.asarray(s_proj.u),
                                   rtol=0, atol=0.25 * umax)
        np.testing.assert_allclose(np.asarray(s_cpl.T), np.asarray(s_proj.T),
                                   rtol=0, atol=1e-3)
        assert abs(d_cpl.max_velocity - d_proj.max_velocity) < 0.3 * umax

    def test_coupled_divergence_small(self):
        p = _params(momentum_solver="coupled")
        _, d = _run(p)
        assert d.div_norm < 1e-6

    def test_coupled_is_stable_and_spins_up(self):
        p = _params(momentum_solver="coupled")
        s, d = _run(p, n=5)
        assert np.isfinite(d.max_velocity)
        assert 1e-4 < d.max_velocity < 1.0


class TestWellBalanced:
    """Uniform density (beta=0): gravity is a pure gradient; with the
    hydrostatic split no flow may be generated from rest by either
    momentum solver. (With 'full' buoyancy the discrete imbalance of
    the large gradient force produces O(0.1) spurious currents.)"""

    @pytest.mark.parametrize("solver", ["projection", "coupled"])
    def test_no_spurious_currents(self, solver):
        p = _params(momentum_solver=solver)
        p.physical_constants.expansion_coefficient = 0.0
        p.physical_constants.__post_init__()
        _, d = _run(p)
        assert d.max_velocity < 1e-10

    def test_full_buoyancy_mode_reproduces_reference_behavior(self):
        p = _params(buoyancy="full")
        p.physical_constants.expansion_coefficient = 0.0
        p.physical_constants.__post_init__()
        _, d = _run(p)
        # documented, not asserted-small: the discrete imbalance exists
        assert d.max_velocity > 1e-4


class TestSchurVsBlockPath:
    def test_paths_agree_tightly(self):
        p1 = _params(momentum_solver="coupled")
        p1.use_schur_complement_solver = False
        s1, _ = _run(p1, n=2)
        p2 = _params(momentum_solver="coupled")
        p2.use_schur_complement_solver = True
        s2, _ = _run(p2, n=2)
        # identical linear system, two solvers -> agree to solver tol
        np.testing.assert_allclose(np.asarray(s2.u), np.asarray(s1.u),
                                   rtol=0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(s2.p), np.asarray(s1.p),
                                   rtol=0, atol=1e-6)


class TestCoupled3DShell:
    def test_shell_coupled_steps(self):
        p = Parameters.from_text("")
        p.space_dimension = 3
        p.cuboid_geometry = False
        p.numerics.dtype = "float64"
        p.numerics.momentum_solver = "coupled"
        p.numerics.n_radial, p.numerics.n_lat, p.numerics.n_lon = 4, 8, 16
        p.physical_constants.R0 = 1.0
        p.physical_constants.atm_height = 2.0
        p.physical_constants.__post_init__()
        p.reference_quantities.velocity = 1.0
        p.reference_quantities.length = 1.0
        p.reference_quantities.temperature_ref = 2.0
        p.reference_quantities.__post_init__()
        p.time_step = 0.01
        m = BoussinesqModel(p)
        s = m.initial_state()
        for _ in range(2):
            s, d = m.step(s, p.time_step)
        assert np.isfinite(d.max_velocity)
        assert d.div_norm < 1e-6


class TestFEECCoupled3x3:
    """The FEEC personality's 3x3 vorticity-velocity-pressure block
    solve (reference: ExteriorCalculus solve_NSE_block_preconditioned,
    boussineq_model_FEEC.tpp:1268-1477)."""

    def _params3d(self, **over):
        p = Parameters.from_text("")
        p.space_dimension = 3
        p.cuboid_geometry = False
        p.use_FEEC_solver = True
        p.numerics.dtype = "float64"
        p.numerics.n_radial, p.numerics.n_lat, p.numerics.n_lon = 6, 8, 16
        p.physical_constants.R0 = 1.0
        p.physical_constants.atm_height = 2.0
        p.physical_constants.expansion_coefficient = 0.3
        p.physical_constants.__post_init__()
        p.reference_quantities.velocity = 1.0
        p.reference_quantities.length = 1.0
        p.reference_quantities.temperature_ref = 2.0
        p.reference_quantities.__post_init__()
        p.time_step = 0.01
        for k, v in over.items():
            setattr(p.numerics, k, v)
        return p

    def test_feec_coupled_selected_and_stable(self):
        p = self._params3d(momentum_solver="coupled")
        m = BoussinesqModel(p)
        s = m.initial_state()
        for _ in range(3):
            s, d = m.step(s, p.time_step)
        assert np.isfinite(d.max_velocity)
        assert 1e-6 < d.max_velocity < 1.0
        assert d.div_norm < 1e-6          # Rhie-Chow faces div-free

    def test_feec_coupled_matches_projection(self):
        p1 = self._params3d()                       # FEEC projection
        p2 = self._params3d(momentum_solver="coupled")
        m1, m2 = BoussinesqModel(p1), BoussinesqModel(p2)
        s1, s2 = m1.initial_state(), m2.initial_state()
        for _ in range(3):
            s1, d1 = m1.step(s1, p1.time_step)
            s2, d2 = m2.step(s2, p2.time_step)
        umax = float(np.max(np.abs(np.asarray(s1.u))))
        np.testing.assert_allclose(np.asarray(s2.u), np.asarray(s1.u),
                                   rtol=0, atol=0.3 * umax)
        np.testing.assert_allclose(np.asarray(s2.T), np.asarray(s1.T),
                                   rtol=0, atol=1e-3)

    def test_system_solved_to_tolerance(self):
        """GMRES on the 3x3 operator must actually converge: the
        returned residual norm is far below the rhs scale."""
        p = self._params3d(momentum_solver="coupled")
        m = BoussinesqModel(p)
        s = m.initial_state()
        s, d = m.step(s, p.time_step)
        assert d.poisson_residual < 1e-8 or d.helmholtz_residual < 1e-8


class TestSolverFallback:
    """Retry-with-stronger-preconditioner on outer non-convergence
    (reference: boussinesq_model.tpp:1203-1232 catches NoConvergence and
    re-runs FGMRES with the inner-solved velocity block)."""

    def _stiff(self):
        # Re = 0.02: the velocity block is Laplacian-dominated, the
        # Jacobi u-sweep preconditioner stalls within max_cg_iters
        p = _params(momentum_solver="coupled", max_cg_iters=12)
        p.physical_constants.dynamic_viscosity = 50.0
        p.physical_constants.__post_init__()
        return p

    def test_stiff_solve_fails_without_and_passes_with(self):
        p = self._stiff()
        m_no = BoussinesqModel(p)
        m_no._enable_solver_fallback = False
        _, d_no = m_no.step(m_no.initial_state(), p.time_step)

        m_fb = BoussinesqModel(p)
        _, d_fb = m_fb.step(m_fb.initial_state(), p.time_step)

        # without the fallback the outer momentum residual stalls far
        # above tolerance; the strong-preconditioner retry converges it
        assert d_no.helmholtz_residual > 1e-5, d_no.helmholtz_residual
        assert d_fb.helmholtz_residual < 1e-8, d_fb.helmholtz_residual

    def test_fallback_not_triggered_when_converged(self):
        # benign config: identical result with the fallback compiled in
        p = _params(momentum_solver="coupled")
        m = BoussinesqModel(p)
        _, d = m.step(m.initial_state(), p.time_step)
        assert d.helmholtz_residual < 1e-8
