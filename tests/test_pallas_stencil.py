"""Equivalence of the fused Pallas explicit-forcing kernel against the
jnp stencil path (interpret mode — CPU-safe), across schemes, physics
modes and radial block counts."""

import numpy as np
import pytest
import jax.numpy as jnp

from dycoreplanet_tpu.base.params import Parameters
from dycoreplanet_tpu.models import BoussinesqModel
from dycoreplanet_tpu.ops.pallas_stencil import make_shell_forcing


def _rhs(out):
    """Unwrap the (rhs_u, T_adv) tuple of advect_T kernels."""
    return out[0] if isinstance(out, tuple) else out


def _model(scheme="muscl", coriolis="reference", buoyancy="perturbation",
           projection="incremental"):
    p = Parameters.from_text("")
    p.space_dimension = 3
    p.cuboid_geometry = False
    p.numerics.dtype = "float64"
    p.numerics.advection_scheme = scheme
    p.numerics.coriolis_mode = coriolis
    p.numerics.buoyancy = buoyancy
    p.numerics.projection = projection
    p.numerics.n_radial, p.numerics.n_lat, p.numerics.n_lon = 8, 8, 16
    p.physical_constants.R0 = 1.0
    p.physical_constants.atm_height = 2.0
    p.physical_constants.omega = 0.7
    p.physical_constants.__post_init__()
    p.reference_quantities.velocity = 1.0
    p.reference_quantities.length = 1.0
    p.reference_quantities.temperature_ref = 2.0
    p.reference_quantities.__post_init__()
    return BoussinesqModel(p)


def _seeded_fields(m, seed=0):
    rng = np.random.default_rng(seed)
    shape = m.geo.cell_shape
    u = jnp.asarray(rng.standard_normal((3,) + shape))
    faces = tuple(jnp.asarray(rng.standard_normal(shape)) for _ in range(3))
    T = jnp.asarray(m.T_init + 0.1 * rng.standard_normal(shape))
    pres = jnp.asarray(rng.standard_normal(shape))
    return u, faces, T, pres


@pytest.mark.parametrize("scheme", ["muscl", "upwind", "centered"])
def test_scheme_equivalence(scheme):
    m = _model(scheme=scheme)
    pall = make_shell_forcing(m.geo, m, interpret=True, use_pallas=True)
    assert pall is not None
    u, faces, T, pres = _seeded_fields(m)
    dt = 0.01
    want = np.asarray(u + dt * m._explicit_forcing(u, faces, pres, T))
    got = np.asarray(_rhs(pall(u, faces, T, pres, dt)))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("coriolis", ["reference", "physical"])
@pytest.mark.parametrize("buoyancy", ["perturbation", "full"])
def test_physics_modes(coriolis, buoyancy):
    m = _model(coriolis=coriolis, buoyancy=buoyancy)
    pall = make_shell_forcing(m.geo, m, interpret=True, use_pallas=True)
    u, faces, T, pres = _seeded_fields(m, seed=1)
    dt = 0.004
    want = np.asarray(u + dt * m._explicit_forcing(u, faces, pres, T))
    got = np.asarray(_rhs(pall(u, faces, T, pres, dt)))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("blk", [2, 4, 8])
def test_block_counts(blk):
    """Radial halo plumbing: 1, 2 and 4 blocks must agree exactly."""
    from dycoreplanet_tpu.ops.pallas_stencil import ShellForcingPallas

    m = _model()
    pall = ShellForcingPallas(
        m.geo, dtype=np.float64, beta=m.beta, T_ref=m.T_ref,
        rho_background=m.rho_background,
        gravity_r=np.asarray(m.gravity[0]), one_over_Re=m.one_over_Re,
        omega_hat=m.omega_hat, coriolis_mode=m.coriolis_mode,
        buoyancy="perturbation", scheme="muscl", include_gradp=True,
        block_rows=blk, interpret=True)
    u, faces, T, pres = _seeded_fields(m, seed=2)
    dt = 0.01
    want = np.asarray(u + dt * m._explicit_forcing(u, faces, pres, T))
    got = np.asarray(_rhs(pall(u, faces, T, pres, dt)))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("blk", [2, 8])
def test_projection_kernels(blk):
    """faces_div + correct must reproduce the jnp projection blocks."""
    from dycoreplanet_tpu.ops import stencil as st
    from dycoreplanet_tpu.ops.pallas_stencil import ShellProjectionPallas

    m = _model()
    geo = m.geo
    proj = ShellProjectionPallas(geo, dtype=np.float64, incremental=True,
                                 block_rows=blk, interpret=True)
    u_star, _, _, pres = _seeded_fields(m, seed=4)
    rng = np.random.default_rng(5)
    phi = jnp.asarray(rng.standard_normal(geo.cell_shape))
    dt = 0.01

    # jnp oracle: pre-Poisson stage
    uf_ref = [m._apply_wall_face_values(
        m._interp_component_to_faces(u_star[c], c), c) for c in range(3)]
    vol = jnp.asarray(np.broadcast_to(geo.vol, geo.cell_shape))
    rhs_ref = -vol * st.divergence(geo, uf_ref) / dt
    rhs_ref = rhs_ref - jnp.mean(rhs_ref)

    uf0, uf1, uf2, rhs_raw, psums = proj.faces_div(u_star, dt)
    rhs_got = rhs_raw - jnp.sum(psums) / float(geo.n_cells)
    for got, want in zip((uf0, uf1, uf2), uf_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(rhs_got), np.asarray(rhs_ref),
                               rtol=1e-10, atol=1e-10)

    # jnp oracle: post-Poisson stage
    phi0 = phi - st.volume_mean(geo, phi)
    faces_ref = []
    for d in range(3):
        gphi = st.grad_left_faces(geo, phi0, d, m.p_specs[d])
        faces_ref.append(m._apply_wall_face_values(
            uf_ref[d] - dt * gphi, d))
    gradc = jnp.stack([st.centered_gradient(geo, phi0, d, m.p_specs[d])
                       for d in range(3)])
    u_ref2 = u_star - dt * gradc
    p_ref = pres + phi0

    u_new, f0n, f1n, f2n, p_new = proj.correct(
        u_star, (uf0, uf1, uf2), phi, pres, dt, st.volume_mean(geo, phi))
    np.testing.assert_allclose(np.asarray(u_new), np.asarray(u_ref2),
                               rtol=1e-12, atol=1e-12)
    for got, want in zip((f0n, f1n, f2n), faces_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(p_new), np.asarray(p_ref),
                               rtol=1e-12, atol=1e-12)


def test_pressure_free_variant():
    m = _model(projection="pressure-free")
    pall = make_shell_forcing(m.geo, m, interpret=True, use_pallas=True)
    assert pall is not None and not pall.include_gradp
    u, faces, T, pres = _seeded_fields(m, seed=3)
    dt = 0.01
    want = np.asarray(u + dt * m._explicit_forcing(u, faces, pres, T))
    got = np.asarray(_rhs(pall(u, faces, T, pres, dt)))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("scheme", ["muscl", "upwind", "centered"])
def test_fused_temperature_transport(scheme):
    """The kernel's fused T - dt_T*(u.grad T) must match advect_scalar
    (form="advective") with the model's Dirichlet/Neumann/pole specs."""
    from dycoreplanet_tpu.ops import stencil as st

    m = _model(scheme=scheme)
    pall = make_shell_forcing(m.geo, m, interpret=True, use_pallas=True)
    assert pall is not None and pall.advect_T
    u, faces, T, pres = _seeded_fields(m, seed=7)
    dt = 0.01
    dt_T = dt / m.params.NSE_solver_interval
    out = pall(u, faces, T, pres, dt)
    assert isinstance(out, tuple)
    _, T_adv_got = out
    want = np.asarray(T - dt_T * st.advect_scalar(
        m.geo, faces, T, m.T_specs, scheme=scheme, form="advective"))
    np.testing.assert_allclose(np.asarray(T_adv_got), want,
                               rtol=1e-12, atol=1e-12)


def test_fused_temperature_nse_interval():
    """dt_T = dt / NSE_solver_interval must be honored by the kernel."""
    from dycoreplanet_tpu.ops import stencil as st

    m = _model()
    m.params.NSE_solver_interval = 5
    pall = make_shell_forcing(m.geo, m, interpret=True, use_pallas=True)
    u, faces, T, pres = _seeded_fields(m, seed=8)
    dt = 0.02
    _, T_adv_got = pall(u, faces, T, pres, dt)
    want = np.asarray(T - (dt / 5) * st.advect_scalar(
        m.geo, faces, T, m.T_specs, scheme="muscl", form="advective"))
    np.testing.assert_allclose(np.asarray(T_adv_got), want,
                               rtol=1e-12, atol=1e-12)
