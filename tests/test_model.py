"""End-to-end integration tests for BoussinesqModel on the reference's
config matrix (the de-facto benchmark cases, SURVEY.md §4), at reduced
resolution for speed.

These generalize the reference's graduated data/*.prm manual runs into
automated checks: stability, incompressibility, boundary conditions,
conservation, and both discretization personalities.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dycoreplanet_tpu.base.params import Parameters
from dycoreplanet_tpu.models import BoussinesqModel
from dycoreplanet_tpu.ops import stencil as st


def _load(name, **num_overrides):
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "data", name)
    p = Parameters.from_file(path)
    p.numerics.dtype = "float64"
    for k, v in num_overrides.items():
        setattr(p.numerics, k, v)
    return p


@pytest.fixture(scope="module")
def annulus_model():
    p = _load("aqua_planet_test_2d.prm", n_radial=8, n_lon=48)
    return BoussinesqModel(p)


@pytest.fixture(scope="module")
def cube_model():
    p = _load("aqua_planet_cube_test_3d.prm", nx=8, ny=8, nz=8)
    return BoussinesqModel(p)


@pytest.fixture(scope="module")
def shell_model():
    p = _load("aqua_planet_shell_test_3d-classic.prm", n_radial=4, n_lat=8, n_lon=16)
    return BoussinesqModel(p)


class TestAnnulus2D:
    def test_ten_steps_stable(self, annulus_model):
        m = annulus_model
        s = m.initial_state()
        for _ in range(10):
            s, d = m.step(s, m.params.time_step)
        assert np.isfinite(float(d.max_velocity))
        assert float(d.max_velocity) < 1.0
        assert float(d.T_min) >= -1e-8  # advection-diffusion preserves positivity
        assert float(d.div_norm) < 1e-6

    def test_divergence_free_faces(self, annulus_model):
        m = annulus_model
        s = m.initial_state()
        s, d = m.step(s, m.params.time_step)
        div = st.divergence(m.geo, list(s.u_faces))
        assert float(jnp.max(jnp.abs(div))) < 1e-6

    def test_no_slip_inner_wall(self, annulus_model):
        m = annulus_model
        s = m.initial_state()
        for _ in range(5):
            s, d = m.step(s, m.params.time_step)
        # normal face velocity at the lo wall is exactly zero (the hi
        # wall face is implicit zero in the cell-shaped face layout)
        assert float(jnp.max(jnp.abs(s.u_faces[0][0]))) == 0.0

    def test_buoyancy_spins_up_flow(self, annulus_model):
        m = annulus_model
        s = m.initial_state()
        s, d = m.step(s, m.params.time_step)
        assert float(d.max_velocity) > 1e-4  # gravity drives motion


class TestCube3D:
    def test_steps_stable_rotational_form(self, cube_model):
        m = cube_model
        assert m.advection_form == "rotational"  # use_FEEC_solver = true
        s = m.initial_state()
        for _ in range(5):
            s, d = m.step(s, m.params.time_step)
        assert np.isfinite(float(d.max_velocity))
        assert float(d.div_norm) < 1e-6

    def test_temperature_mass_budget(self, cube_model):
        # with zero-flux side/top walls and Dirichlet bottom, total heat
        # changes only via boundary diffusion — advective change is zero
        m = cube_model
        s0 = m.initial_state()
        q0 = float(st.volume_integral(m.geo, s0.T))
        s, _ = m.step(s0, m.params.time_step)
        q1 = float(st.volume_integral(m.geo, s.T))
        # diffusive wall exchange is small in one step
        assert abs(q1 - q0) < 0.05 * abs(q0) + 1e-3

    def test_momentum_wall_bcs(self, cube_model):
        m = cube_model
        s = m.initial_state()
        for _ in range(3):
            s, _ = m.step(s, m.params.time_step)
        # no vertical flow through the bottom (top face implicit zero)
        assert float(jnp.max(jnp.abs(s.u_faces[0][0]))) == 0.0


class TestShell3D:
    def test_steps_stable(self, shell_model):
        m = shell_model
        s = m.initial_state()
        for _ in range(5):
            s, d = m.step(s, m.params.time_step)
        assert np.isfinite(float(d.max_velocity))
        assert float(d.div_norm) < 1e-5

    def test_reference_coriolis_mode_shell_is_off(self, shell_model):
        # SURVEY.md §7.5: the reference applies no Coriolis force in the
        # 3D shell standard path; 'reference' mode reproduces that
        from dycoreplanet_tpu.ops.vector import coriolis_acceleration
        m = shell_model
        u = jnp.ones((3,) + m.geo.cell_shape)
        a = coriolis_acceleration(m.geo, u, m.omega_hat, "reference")
        assert float(jnp.max(jnp.abs(a))) == 0.0
        a_phys = coriolis_acceleration(m.geo, u, m.omega_hat, "physical")
        assert float(jnp.max(jnp.abs(a_phys))) > 0.0

    def test_adaptive_dt_formula(self, shell_model):
        # dt = 0.25/(2.1*3*sqrt(3))/(max(deg)*cfl)   (tpp:1104-1125)
        m = shell_model
        dt = m.compute_time_step(cfl=2.0)
        expect = 0.25 / (2.1 * 3 * np.sqrt(3.0)) / (2 * 2.0)
        assert dt == pytest.approx(expect)


class TestRunLoop:
    def test_run_matches_reference_loop_semantics(self):
        # shell-classic: final_time=0.09, dt=0.1 -> exactly ONE step
        # (while time <= final after += dt; reference tpp:1843-1926)
        p = _load("aqua_planet_shell_test_3d-classic.prm", n_radial=4, n_lat=8, n_lon=16)
        m = BoussinesqModel(p)
        state, hist = m.run()
        assert len(hist) == 1
        assert int(state.step_number) == 1

    def test_run_2d_several_steps(self):
        p = _load("aqua_planet_test_2d.prm", n_radial=8, n_lon=48)
        p.final_time = 0.05  # 5 steps of 0.01
        m = BoussinesqModel(p)
        state, hist = m.run()
        assert len(hist) == 6  # while time <= final: 0,...,0.05 inclusive
        assert all(np.isfinite(h["max_velocity"]) for h in hist)


class TestSubcycling:
    def test_nse_interval_temperature_substeps(self):
        # interval=2: NSE solved on even iterations only, temperature
        # every iteration with dt/2 (reference: tpp:1867-1905)
        p = _load("aqua_planet_test_2d.prm", n_radial=8, n_lon=48)
        p.NSE_solver_interval = 2
        p.final_time = 0.04
        m = BoussinesqModel(p)
        state, hist = m.run()
        # time advances by dt/interval per iteration
        times = [h["time"] for h in hist]
        assert times[1] == pytest.approx(0.005)
        assert all(np.isfinite(h["max_velocity"]) for h in hist)
        # the temperature-only substep freezes the velocity
        s0 = m.initial_state()
        s1, _ = m.step(s0, p.time_step)
        s2, d2 = m.temperature_step(s1, p.time_step)
        np.testing.assert_array_equal(np.asarray(s2.u), np.asarray(s1.u))
        assert float(jnp.max(jnp.abs(s2.T - s1.T))) > 0
        assert int(s2.step_number) == 2
        assert float(s2.time) == pytest.approx(float(s1.time) + p.time_step / 2)


class TestPersonalitiesDiffer:
    def test_advective_vs_rotational_same_limit(self):
        # both transport forms discretize the same PDE: after one step
        # from rest the fields should be close but not identical
        p1 = _load("aqua_planet_test_2d.prm", n_radial=8, n_lon=48)
        p1.use_FEEC_solver = False
        p2 = _load("aqua_planet_test_2d.prm", n_radial=8, n_lon=48)
        p2.use_FEEC_solver = True
        m1, m2 = BoussinesqModel(p1), BoussinesqModel(p2)
        s1, _ = m1.step(m1.initial_state(), 0.01)
        s2, _ = m2.step(m2.initial_state(), 0.01)
        du = float(jnp.max(jnp.abs(s1.u - s2.u)))
        u_scale = float(jnp.max(jnp.abs(s1.u)))
        assert du < 0.5 * max(u_scale, 1e-12)


class TestMultiStep:
    """model.multi_step (on-device lax.scan) must reproduce the
    Python-level step loop exactly (same jitted step body)."""

    def test_matches_step_loop(self):
        from dycoreplanet_tpu.base.params import Parameters
        from dycoreplanet_tpu.models import BoussinesqModel

        p = Parameters.from_text("")
        p.space_dimension = 2
        p.numerics.dtype = "float64"
        p.numerics.n_radial, p.numerics.n_lon = 8, 32
        p.physical_constants.R0 = 1.0
        p.physical_constants.atm_height = 2.0
        p.physical_constants.expansion_coefficient = 0.3
        p.physical_constants.__post_init__()
        p.reference_quantities.velocity = 1.0
        p.reference_quantities.length = 1.0
        p.reference_quantities.temperature_ref = 2.0
        p.reference_quantities.__post_init__()
        m = BoussinesqModel(p)
        dt = 0.01

        s_loop = m.initial_state()
        for _ in range(4):
            s_loop, d_loop = m.step(s_loop, dt)

        s_scan, packed, _ = m.multi_step(m.initial_state(), dt, 4)
        assert packed.shape[0] == 4
        np.testing.assert_allclose(np.asarray(s_scan.u),
                                   np.asarray(s_loop.u), atol=1e-14)
        np.testing.assert_allclose(np.asarray(s_scan.T),
                                   np.asarray(s_loop.T), atol=1e-14)
        np.testing.assert_allclose(np.asarray(s_scan.p),
                                   np.asarray(s_loop.p), atol=1e-14)
        # stacked diagnostics: last row equals the loop's last step
        from dycoreplanet_tpu.models.boussinesq import StepDiagnostics
        d_last = StepDiagnostics(packed[-1], m.geo.dim)
        np.testing.assert_allclose(d_last.max_velocity, d_loop.max_velocity,
                                   rtol=1e-12)

    def _small_params(self, **over):
        from dycoreplanet_tpu.base.params import Parameters

        p = Parameters.from_text("")
        p.space_dimension = 2
        p.numerics.dtype = "float64"
        p.numerics.n_radial, p.numerics.n_lon = 8, 32
        p.physical_constants.R0 = 1.0
        p.physical_constants.atm_height = 2.0
        p.physical_constants.expansion_coefficient = 0.3
        p.physical_constants.__post_init__()
        p.reference_quantities.velocity = 1.0
        p.reference_quantities.length = 1.0
        p.reference_quantities.temperature_ref = 2.0
        p.reference_quantities.__post_init__()
        for k, v in over.items():
            setattr(p, k, v)
        return p

    def test_adaptive_dt_matches_host_loop(self):
        """The in-scan CFL recomputation (reference formula
        boussinesq_model.tpp:1104-1125) must reproduce the host loop's
        dt trajectory bitwise in f64."""
        from dycoreplanet_tpu.models import BoussinesqModel

        p = self._small_params(adapt_time_step=True)
        m = BoussinesqModel(p)
        n = 6

        # host loop: exactly BoussinesqModel.run's adaptive control
        s = m.initial_state()
        dt = p.time_step
        dts = []
        for k in range(n):
            s, diag = m.step(s, dt)
            if (k + 1) % p.NSE_solver_interval == 0:
                dt = m.compute_time_step(float(diag.cfl))
            dts.append(dt)

        s2, packed, dt_out = m.multi_step(
            m.initial_state(), p.time_step, n, adaptive=True)
        assert float(dt_out) == dts[-1]
        np.testing.assert_allclose(np.asarray(s2.u), np.asarray(s.u),
                                   rtol=1e-14, atol=1e-16)
        np.testing.assert_allclose(np.asarray(s2.T), np.asarray(s.T),
                                   rtol=1e-14, atol=1e-16)

    def test_nse_interval_subcycling_matches_run(self):
        """NSE-interval sub-cycling inside the scan must match the
        alternating step/temperature_step host loop."""
        from dycoreplanet_tpu.models import BoussinesqModel

        p = self._small_params(NSE_solver_interval=3)
        m = BoussinesqModel(p)
        dt = p.time_step
        n = 7

        s = m.initial_state()
        for k in range(n):
            if k % p.NSE_solver_interval == 0:
                s, _ = m.step(s, dt)
            else:
                s, _ = m.temperature_step(s, dt)

        s2, packed, _ = m.multi_step(m.initial_state(), dt, n)
        assert packed.shape[0] == n
        np.testing.assert_allclose(np.asarray(s2.u), np.asarray(s.u),
                                   rtol=1e-14, atol=1e-16)
        np.testing.assert_allclose(np.asarray(s2.T), np.asarray(s.T),
                                   rtol=1e-14, atol=1e-16)
        assert int(s2.step_number) == n


class TestCuboid2D:
    """The reference's dim=2 cuboid branch (planet_geometry.tpp:29-57):
    (z, x) slab, periodic x, no-slip bottom / free-slip top."""

    def _model(self):
        from dycoreplanet_tpu.base.params import Parameters
        from dycoreplanet_tpu.models import BoussinesqModel

        p = Parameters.from_text("")
        p.space_dimension = 2
        p.cuboid_geometry = True
        p.numerics.dtype = "float64"
        p.numerics.nz = p.numerics.nx = 12
        p.physical_constants.expansion_coefficient = 0.2
        p.reference_quantities.velocity = 1.0
        p.reference_quantities.length = 1.0
        p.reference_quantities.temperature_ref = 3.0
        p.time_step = 0.01
        return BoussinesqModel(p)

    def test_steps_stable(self):
        m = self._model()
        assert m.geo.kind == "cuboid" and m.geo.dim == 2
        s = m.initial_state()
        for _ in range(5):
            s, d = m.step(s, m.params.time_step)
        assert np.isfinite(float(d.max_velocity))
        assert float(d.max_velocity) > 1e-6   # buoyancy spins up flow
        assert float(d.div_norm) < 1e-9       # exact 2D fast-diag Poisson
        # no flow through the bottom wall
        assert float(jnp.max(jnp.abs(s.u_faces[0][0]))) == 0.0

    def test_vtk_output(self, tmp_path):
        from dycoreplanet_tpu.io.vtk import write_vts

        m = self._model()
        s = m.initial_state()
        path = write_vts(str(tmp_path / "slab.vts"), m.geo,
                         scalars={"T": np.asarray(s.T)},
                         vectors={"velocity": np.asarray(s.u)})
        import xml.etree.ElementTree as ET
        assert ET.parse(path).getroot().attrib["type"] == "StructuredGrid"


class TestSpectralResidualCheck:
    """`poisson tol` is live on the default spectral-direct path: the
    post-projection divergence is the solve residual of the compatible
    grad/div pair, so a regression in the fast-diag constants is
    detected and repaired by the CG escalation (VERDICT r4 item 7;
    reference: inner pressure solves converge to tolerance,
    inverse_matrix.hpp:93-120)."""

    def _model(self):
        p = _load("aqua_planet_shell_test_3d-classic.prm",
                  n_radial=4, n_lat=8, n_lon=16)
        p.NSE_solver_interval = 1
        p.adapt_time_step = False
        p.final_time = 1e9
        # helmholtz/temperature tolerances the fast path genuinely
        # meets at this tiny grid (as in TestEscalationRearm), so the
        # ONLY possible miss is the Poisson spot-check under test
        p.numerics.helmholtz_tol = 1e-4
        p.numerics.temperature_tol = 1e-6
        m = BoussinesqModel(p)
        assert m.poisson_spectral is not None
        return m

    def test_healthy_solve_reports_real_residual(self):
        m = self._model()
        s = m.initial_state()
        s, d = m.step(s, m.params.time_step)
        # the -1 'direct solve' sentinel is replaced by the measured
        # post-projection residual, and it passes the tolerance
        assert d.poisson_residual >= 0.0
        assert d.solver_ok

    def test_corrupted_fast_diag_trips_escalation_and_cg_repairs(self):
        m = self._model()
        # corrupt the fast-diag eigendenominators (any constant
        # regression must surface through the residual spot-check)
        m.poisson_spectral._inv_denom = \
            3.0 * m.poisson_spectral._inv_denom
        m._setup_const_registry()
        m._reset_jit_caches()
        s = m.initial_state()
        s, d = m.step(s, m.params.time_step)
        assert not d.solver_ok          # spot-check caught it
        # run() escalates; the strong path bypasses the spectral solve
        # for (spectral-preconditioned) CG, so the run self-repairs
        strong_calls = []
        real_strong = m.step_strong

        def spy_strong(state, dt):
            strong_calls.append(int(state.step_number))
            return real_strong(state, dt)

        m.step_strong = spy_strong
        state, hist = m.run(max_steps=3)
        assert strong_calls, "escalation never fired"
        # the CG-repaired steps are honestly converged and div-free
        assert all(h["div_norm"] < 1e-6 for h in hist)


class TestEscalationRearm:
    """The host-level NoConvergence escalation re-arms: one transient
    fast-path miss opens a bounded full-CG window, after which the fast
    path returns (reference: per-solve retry returning to normal,
    boussinesq_model.tpp:1203-1232; a permanently sticky escalation was
    VERDICT r3 weak #4)."""

    def _model(self, rearm=3):
        p = _load("aqua_planet_shell_test_3d-classic.prm",
                  n_radial=4, n_lat=8, n_lon=16)
        p.NSE_solver_interval = 1
        p.adapt_time_step = False
        p.final_time = 1e9
        # tolerances the genuine fast path meets at this resolution
        # (measured residuals ~1e-7 / 1e-9), so the ONLY miss is the
        # injected transient one
        p.numerics.helmholtz_tol = 1e-4
        p.numerics.temperature_tol = 1e-6
        assert p.numerics.fixed_solver_iters > 0
        m = BoussinesqModel(p)
        m._fast_rearm_steps = rearm
        m._fast_penalty_now = rearm
        return m

    def test_run_rearms_after_transient_miss(self):
        m = self._model(rearm=3)
        calls = {"fast": [], "strong": []}
        real_step, real_strong = m.step, m.step_strong
        miss = {"armed": True}

        def fake_step(state, dt):
            calls["fast"].append(int(state.step_number))
            ns, diag = real_step(state, dt)
            if miss["armed"]:
                miss["armed"] = False
                vals = np.asarray(diag.packed).copy()
                vals[10] = 0.0          # report a transient miss
                diag._host_vals = vals
            return ns, diag

        def fake_strong(state, dt):
            calls["strong"].append(int(state.step_number))
            return real_strong(state, dt)

        m.step, m.step_strong = fake_step, fake_strong
        m.run(max_steps=8)
        # step 0: fast attempt misses -> strong redo; steps 1-3 inside
        # the CG window; steps 4-7 back on the fast path
        assert calls["fast"] == [0, 4, 5, 6, 7], calls
        assert calls["strong"] == [0, 1, 2, 3], calls
        assert m._strong_steps_left == 0
        # a clean fast step resets the repeat-miss penalty to base
        assert m._fast_penalty_now == m._fast_rearm_steps

    def test_interval_mode_rewinds_unchecked_window(self):
        """`residual check interval` = M > 1 in run(): a miss detected
        on a checked step must DISCARD the unchecked steps since the
        last verified state and redo the whole window with full CG —
        the unchecked steps carry no residual evidence of their own
        (VERDICT r4 item 2; the reference checks per-solve,
        boussinesq_model.tpp:1203-1232)."""
        M = 4
        m = self._model(rearm=2)
        m.params.numerics.residual_check_interval = M
        calls = {"fast": [], "strong": []}
        real_step, real_strong = m.step, m.step_strong
        inject = {"armed": True}

        def fake_step(state, dt):
            sn = int(state.step_number)
            calls["fast"].append(sn)
            ns, diag = real_step(state, dt)
            vals = np.asarray(diag.packed).copy()
            if sn % M != 0:
                # emulate the unchecked-variant kernel: residual
                # sentinel, solver_ok forced true
                vals[7] = -1.0
                vals[10] = 1.0
            elif sn == 8 and inject["armed"]:
                inject["armed"] = False
                vals[10] = 0.0          # checked-step miss
            diag._host_vals = vals
            return ns, diag

        def fake_strong(state, dt):
            calls["strong"].append(int(state.step_number))
            return real_strong(state, dt)

        m.step, m.step_strong = fake_step, fake_strong
        state, history = m.run(max_steps=12)
        # fast: steps 0-8 (8 misses on its checked residual), then 9-11
        # after the window; strong: the whole unchecked window 5-8 is
        # redone, NOT just the missed step 8
        assert calls["fast"] == list(range(9)) + [9, 10, 11], calls
        assert calls["strong"] == [5, 6, 7, 8], calls
        # every accepted step appears exactly once, in order
        assert [r["step"] for r in history] == list(range(12))
        dts = m.params.time_step
        assert np.allclose([r["time"] for r in history],
                           np.arange(12) * dts)
        assert m._strong_steps_left == 0
        assert m._fast_penalty_now == m._fast_rearm_steps
        # the redone trajectory matches an uninjected run of the same
        # configuration (fast path and CG agree to the model's OWN
        # solver tolerance, 1e-4 here, compounding over the window)
        m_ref = self._model(rearm=2)
        state_ref, _ = m_ref.run(max_steps=12)
        np.testing.assert_allclose(np.asarray(state.u),
                                   np.asarray(state_ref.u),
                                   rtol=5e-3, atol=5e-5)
        np.testing.assert_allclose(np.asarray(state.T),
                                   np.asarray(state_ref.T),
                                   rtol=5e-3, atol=5e-5)

    def test_repeat_misses_double_the_window(self):
        m = self._model(rearm=2)
        m._escalate()
        assert m._strong_steps_left == 2 and m._fast_penalty_now == 4
        m._strong_steps_left = 0       # window served, fast retried...
        m._escalate()                  # ...and missed again
        assert m._strong_steps_left == 4 and m._fast_penalty_now == 8
        m._fast_penalty_now = m._fast_rearm_cap
        m._escalate()
        assert m._fast_penalty_now == m._fast_rearm_cap  # capped

    def test_multi_step_window_counts_down(self):
        m = self._model(rearm=4)
        s = m.initial_state()
        m._strong_steps_left = 4       # escalation window open
        out_state, packed, _ = m.multi_step(s, m.params.time_step, 3,
                                            collect_diagnostics=True)
        assert m._strong_steps_left == 1   # 3 clean strong steps served
        m.multi_step(out_state, m.params.time_step, 3)
        assert m._strong_steps_left == 0   # window closed, re-armed
