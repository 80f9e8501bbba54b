"""Manufactured/analytic correctness anchor with MEASURED convergence order.

BASELINE.md's correctness gate ("velocity, pressure, temperature allclose
to the deal.II reference after 100 steps") is unverifiable without a
deal.II build; the reference publishes no solution fields. These
analytic validations of the FULL time step (not operator unit tests, not
self-convergence) stand in for that gate:

  * Taylor-Green vortex viscous decay — exact nonlinear Navier-Stokes
    solution on the fully periodic cuboid: advection, pressure gradient,
    projection and implicit diffusion all active. Measured spatial order
    ~2 over two refinement doublings (dt ~ h^2 keeps the first-order
    IMEX time error at the same order).
  * Conductive slab eigenmode decay — exact heat-equation solution with
    the Dirichlet-bottom / Neumann-top wall handling in the loop.
  * Annulus steady conduction — exact log-r equilibrium with Dirichlet
    walls; the stepped model must hold it to O(h^2).
  * Rotating solid-body equilibrium on the shell — exact nonlinear
    balance of the advection curvature terms, physical Coriolis force
    and a prescribed pressure-gradient force; the tendency must vanish
    to round-off (the curvature/Coriolis terms are pointwise-exact).
  * Solid-body advection on the shell — a passive blob transported by
    the equilibrium flow has the exact solution T0(lon - omega*t);
    measures the shell transport + metric convergence order.

Reference system being validated: the continuous equations documented at
/root/reference/include/core/boussinesq_model.h:84-114.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from dycoreplanet_tpu.base.params import Parameters
from dycoreplanet_tpu.grid.factory import make_annulus, make_cuboid, make_shell
from dycoreplanet_tpu.models import BoussinesqModel
from dycoreplanet_tpu.ops import stencil as st
from dycoreplanet_tpu.ops.bc import BC, BCSpec
from dycoreplanet_tpu.ops.diagonal import weak_laplacian_diagonal


def observed_orders(hs, errs):
    """Per-doubling convergence order log2(e_coarse / e_fine)."""
    hs, errs = np.asarray(hs, float), np.asarray(errs, float)
    return [float(np.log(errs[i] / errs[i + 1])
                  / np.log(hs[i] / hs[i + 1])) for i in range(len(hs) - 1)]


def _base_params(dtype="float64"):
    p = Parameters.from_text("")
    p.numerics.dtype = dtype
    p.reference_quantities.velocity = 1.0
    p.reference_quantities.length = 1.0
    p.reference_quantities.temperature_ref = 0.0
    p.reference_quantities.__post_init__()
    p.physical_constants.gravity_constant = 0.0
    p.physical_constants.omega = 0.0
    p.physical_constants.expansion_coefficient = 0.0
    p.physical_constants.density = 1.0
    return p


# ----------------------------------------------------------------------
# Taylor-Green vortex (fully periodic cuboid)
# ----------------------------------------------------------------------
def _taylor_green_run(n, scheme, Re=100.0, t_final=0.1, dt0=0.006, n0=16):
    p = _base_params()
    p.space_dimension = 3
    p.cuboid_geometry = True
    p.numerics.advection_scheme = scheme
    p.physical_constants.dynamic_viscosity = 1.0 / Re
    p.physical_constants.__post_init__()
    geo = make_cuboid(4, n, n, periodic_z=True)
    m = BoussinesqModel(p, geometry=geo)

    k = 2.0 * np.pi
    nu = 1.0 / Re
    yc = geo.axes[1].centers.reshape(1, -1, 1)
    xc = geo.axes[2].centers.reshape(1, 1, -1)
    yf = geo.axes[1].faces.reshape(1, -1, 1)
    xf = geo.axes[2].faces.reshape(1, 1, -1)

    def u_x(x, y, t):
        return np.sin(k * x) * np.cos(k * y) * np.exp(-2 * nu * k * k * t)

    def u_y(x, y, t):
        return -np.cos(k * x) * np.sin(k * y) * np.exp(-2 * nu * k * k * t)

    s = m.initial_state()
    u0 = np.zeros((3,) + geo.cell_shape)
    u0[2] = np.broadcast_to(u_x(xc, yc, 0.0), geo.cell_shape)
    u0[1] = np.broadcast_to(u_y(xc, yc, 0.0), geo.cell_shape)
    faces = (
        jnp.zeros(geo.cell_shape, dtype=s.T.dtype),
        jnp.asarray(np.broadcast_to(u_y(xc, yf, 0.0), geo.cell_shape)),
        jnp.asarray(np.broadcast_to(u_x(xf, yc, 0.0), geo.cell_shape)),
    )
    p_exact0 = -0.25 * (np.cos(2 * k * xc) + np.cos(2 * k * yc))
    s = s._replace(
        u=jnp.asarray(u0, dtype=s.u.dtype),
        u_faces=faces,
        p=jnp.asarray(np.broadcast_to(p_exact0, geo.cell_shape),
                      dtype=s.p.dtype),
    )

    # dt ~ h^2.5: the first-order time error decays FASTER than the
    # second-order spatial error, so the measured order is spatial
    # (at dt ~ h^2 the two terms partially cancel at coarse resolution,
    # masking the true order)
    dt = dt0 * (n0 / n) ** 2.5
    n_steps = max(1, int(round(t_final / dt)))
    dt = t_final / n_steps          # land exactly on t_final
    s, _, _ = m.multi_step(s, dt, n_steps, collect_diagnostics=False)

    ue = np.zeros((3,) + geo.cell_shape)
    ue[2] = np.broadcast_to(u_x(xc, yc, t_final), geo.cell_shape)
    ue[1] = np.broadcast_to(u_y(xc, yc, t_final), geo.cell_shape)
    return float(np.sqrt(np.mean((np.asarray(s.u) - ue) ** 2)))


class TestTaylorGreen:
    def test_second_order_centered(self):
        ns = [16, 32, 64]
        errs = [_taylor_green_run(n, "centered") for n in ns]
        orders = observed_orders([1.0 / n for n in ns], errs)
        assert min(orders) > 1.7, (errs, orders)

    def test_muscl_converges(self):
        # van Leer limiting clips to first order at smooth extrema, so
        # the L2 order lands between 1.5 and 2
        ns = [16, 32, 64]
        errs = [_taylor_green_run(n, "muscl") for n in ns]
        orders = observed_orders([1.0 / n for n in ns], errs)
        assert min(orders) > 1.2, (errs, orders)

    def test_decay_amplitude(self):
        # the energy decay rate itself is exact physics: at n=64 the
        # amplitude error must be well under 1%
        err = _taylor_green_run(64, "centered")
        amp = np.exp(-2 * (2 * np.pi) ** 2 * 0.1 / 100.0) / 2.0  # rms of TG
        assert err < 0.01 * amp, (err, amp)


# ----------------------------------------------------------------------
# Conductive slab eigenmode decay (cuboid with z walls)
# ----------------------------------------------------------------------
def _slab_run(n, t_final=0.08, dt0=0.01, n0=16):
    p = _base_params()
    p.space_dimension = 3
    p.cuboid_geometry = True
    # kappa = k / (c_p * pressure) = 1  =>  Pe = u L / kappa = 1
    p.physical_constants.pressure = 1.0
    p.physical_constants.specific_heat_p = 1.0
    p.physical_constants.thermal_conductivity = 1.0
    p.physical_constants.__post_init__()
    geo = make_cuboid(n, 4, 4)
    m = BoussinesqModel(p, geometry=geo)
    # homogeneous Dirichlet bottom instead of the IC-valued wall
    m.T_specs[0] = BCSpec(BC.DIRICHLET, BC.NEUMANN, lo_value=0.0)
    m.T_lap_offset = np.zeros(geo.cell_shape)

    mu = np.pi / 2.0  # sin(mu z): T(0)=0, T'(1)=0
    zc = geo.axes[0].centers.reshape(-1, 1, 1)
    T0 = np.broadcast_to(np.sin(mu * zc), geo.cell_shape)
    s = m.initial_state()._replace(T=jnp.asarray(T0))

    dt = dt0 * (n0 / n) ** 2
    n_steps = max(1, int(round(t_final / dt)))
    dt = t_final / n_steps
    s, _, _ = m.multi_step(s, dt, n_steps, collect_diagnostics=False)

    Te = T0 * np.exp(-mu * mu * t_final)  # Pe = 1
    return float(np.sqrt(np.mean((np.asarray(s.T) - Te) ** 2)))


class TestConductiveSlab:
    def test_second_order_decay(self):
        ns = [16, 32, 64]
        errs = [_slab_run(n) for n in ns]
        orders = observed_orders([1.0 / n for n in ns], errs)
        assert min(orders) > 1.7, (errs, orders)


# ----------------------------------------------------------------------
# Annulus steady conduction: exact log-r equilibrium
# ----------------------------------------------------------------------
def _annulus_conduction_run(nr, t_final=3.0, dt=0.05):
    p = _base_params()
    p.space_dimension = 2
    p.physical_constants.R0 = 1.0
    p.physical_constants.atm_height = 1.0
    p.physical_constants.pressure = 1.0
    p.physical_constants.specific_heat_p = 1.0
    p.physical_constants.thermal_conductivity = 1.0
    p.physical_constants.__post_init__()
    geo = make_annulus(nr, 8, 1.0, 2.0)
    m = BoussinesqModel(p, geometry=geo)
    # Dirichlet at both walls: T(r0)=1, T(r1)=0
    m.T_specs[0] = BCSpec(BC.DIRICHLET, BC.DIRICHLET,
                          lo_value=1.0, hi_value=0.0)
    m.T_specs_hom[0] = BCSpec(BC.ANTISYM, BC.ANTISYM)
    m.T_lap_offset = np.asarray(
        st.weak_laplacian(geo, jnp.zeros(geo.cell_shape), m.T_specs))
    m.T_diag = -weak_laplacian_diagonal(geo, m.T_specs_hom)

    rc = geo.axes[0].centers.reshape(-1, 1)
    Te = np.broadcast_to(np.log(2.0 / rc) / np.log(2.0), geo.cell_shape)
    s = m.initial_state()._replace(T=jnp.asarray(Te))
    n_steps = int(round(t_final / dt))
    s, _, _ = m.multi_step(s, dt, n_steps, collect_diagnostics=False)
    return float(np.max(np.abs(np.asarray(s.T) - Te)))


class TestAnnulusConduction:
    def test_log_r_equilibrium_order(self):
        ns = [8, 16, 32]
        errs = [_annulus_conduction_run(n) for n in ns]
        orders = observed_orders([1.0 / n for n in ns], errs)
        assert min(orders) > 1.7, (errs, orders)


# ----------------------------------------------------------------------
# Rotating solid-body equilibrium + solid-body advection (shell)
# ----------------------------------------------------------------------
def _solid_body_model(shape, omega_rot=0.5, Omega=1.0):
    """Shell model initialized with the exact rotating equilibrium
    u_lon = omega_rot * r * cos(lat), balanced by a prescribed
    pressure-gradient force injected through the gravity field
    (grad p = A grad s^2, s = r cos lat, A = omega_rot^2/2 +
    Omega*omega_rot) — so no pressure boundary handling enters."""
    p = _base_params()
    p.space_dimension = 3
    p.numerics.coriolis_mode = "physical"
    p.numerics.buoyancy = "full"     # buoy = rho * gravity = gravity (beta=0)
    p.physical_constants.omega = Omega
    p.physical_constants.dynamic_viscosity = 1e-12
    # kappa tiny: pure transport for the advection test
    p.physical_constants.pressure = 1.0
    p.physical_constants.specific_heat_p = 1.0
    p.physical_constants.thermal_conductivity = 1e-12
    p.physical_constants.R0 = 1.0
    p.physical_constants.atm_height = 1.0
    p.physical_constants.__post_init__()
    nr, nlat, nlon = shape
    geo = make_shell(nr, nlat, nlon, 1.0, 2.0)
    m = BoussinesqModel(p, geometry=geo)

    rc = geo.axes[0].centers.reshape(-1, 1, 1)
    latc = geo.axes[1].centers.reshape(1, -1, 1)
    cosl, sinl = np.cos(latc), np.sin(latc)
    A = 0.5 * omega_rot**2 + Omega * omega_rot

    # exact wall values for the zonal jet (the Helmholtz affine offset
    # is negligible at 1/Re ~ 1e-12, so Dirichlet specs are safe here)
    r0, r1 = 1.0, 2.0
    m.u_specs[2][0] = BCSpec(
        BC.DIRICHLET, BC.DIRICHLET,
        lo_value=jnp.asarray(omega_rot * r0 * cosl),
        hi_value=jnp.asarray(omega_rot * r1 * cosl))
    m.helm_diags = np.stack([
        -weak_laplacian_diagonal(geo, m.u_specs[c]) for c in range(3)])

    # -grad p as a force field (enters via buoyancy with rho = 1)
    g = np.zeros((3,) + geo.cell_shape)
    g[0] = np.broadcast_to(-2.0 * A * rc * cosl**2, geo.cell_shape)
    g[1] = np.broadcast_to(2.0 * A * rc * cosl * sinl, geo.cell_shape)
    m.gravity = g.astype(m.dtype)

    up = np.broadcast_to(omega_rot * rc * cosl, geo.cell_shape)
    u0 = np.zeros((3,) + geo.cell_shape)
    u0[2] = up
    s = m.initial_state()
    faces = (jnp.zeros_like(s.T), jnp.zeros_like(s.T), jnp.asarray(up))
    s = s._replace(u=jnp.asarray(u0), u_faces=faces)
    return m, s, up


class TestShellSolidBody:
    def test_equilibrium_tendency_is_roundoff(self):
        # the discrete curvature + Coriolis + force balance is pointwise
        # exact, so the state must be a fixed point to f64 round-off
        m, s, up = _solid_body_model((16, 32, 64))
        u0 = np.asarray(s.u)
        s, _, _ = m.multi_step(s, 0.005, 5, collect_diagnostics=False)
        drift = float(np.max(np.abs(np.asarray(s.u) - u0)))
        assert drift < 1e-9, drift

    def test_advection_order(self):
        # a passive blob rides the equilibrium zonal flow with constant
        # angular rate: T(t) = T0(lon - omega_rot * t) exactly
        omega_rot = 0.5
        t_final = 0.1
        shapes = [(8, 16, 32), (16, 32, 64), (32, 64, 128)]
        errs = []
        for i, shape in enumerate(shapes):
            m, s, _ = _solid_body_model(shape, omega_rot=omega_rot)
            m.advection_scheme = "centered"
            geo = m.geo
            latc = geo.axes[1].centers.reshape(1, -1, 1)
            lonc = geo.axes[2].centers.reshape(1, 1, -1)

            def blob(lon_shift):
                return np.broadcast_to(
                    np.exp(4.0 * (np.cos(lonc - np.pi - lon_shift) - 1.0))
                    * np.exp(-((latc / 0.5) ** 2)), geo.cell_shape)

            s = s._replace(T=jnp.asarray(blob(0.0)))
            dt = 0.01 / 4**i           # dt ~ h^2
            n_steps = max(1, int(round(t_final / dt)))
            dt = t_final / n_steps
            s, _, _ = m.multi_step(s, dt, n_steps, collect_diagnostics=False)
            Te = blob(omega_rot * t_final)
            errs.append(float(np.sqrt(np.mean((np.asarray(s.T) - Te) ** 2))))
        orders = observed_orders([1, 0.5, 0.25], errs)
        assert min(orders) > 1.7, (errs, orders)
