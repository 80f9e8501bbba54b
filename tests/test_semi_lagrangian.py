"""Semi-Lagrangian transport (ops/semi_lagrangian.py): accuracy on
solid rotation, unconditional stability beyond the Eulerian CFL limit,
and the model-level temperature option."""

import jax.numpy as jnp
import numpy as np
import pytest

from dycoreplanet_tpu.grid import factory
from dycoreplanet_tpu.ops import stencil as st
from dycoreplanet_tpu.ops.bc import BC, BCSpec
from dycoreplanet_tpu.ops.semi_lagrangian import semi_lagrangian_transport


def _annulus_setup(n_phi=128):
    geo = factory.make_annulus(4, n_phi, 1.0, 2.0)
    specs = [BCSpec(BC.NEUMANN, BC.NEUMANN), None]
    phi = np.asarray(geo.axes[1].centers)
    f0 = jnp.asarray(np.broadcast_to(
        np.sin(2 * phi)[None, :], geo.cell_shape).copy())
    r = np.asarray(geo.axes[0].centers)
    # angular velocity 1 rad/time: u_phi(cell) = r
    u = jnp.stack([jnp.zeros(geo.cell_shape),
                   jnp.asarray(np.broadcast_to(r[:, None], geo.cell_shape))])
    return geo, specs, phi, f0, u


def test_solid_rotation_accuracy():
    geo, specs, phi, f0, u = _annulus_setup()
    dt = 0.02
    f = f0
    for _ in range(50):       # one time unit of rotation
        f = semi_lagrangian_transport(geo, u, f, specs, dt)
    exact = np.broadcast_to(np.sin(2 * (phi - 1.0))[None, :], geo.cell_shape)
    err = float(jnp.max(jnp.abs(f - jnp.asarray(exact))))
    # linear interpolation diffuses ~n*dx^2 over n sub-steps; SL is
    # meant for FEW LARGE steps (see the CFL-3 test) — this bounds the
    # worst case of many small ones
    assert err < 0.08


def test_stable_beyond_eulerian_cfl():
    """CFL ~ 3 per sub-step: Eulerian upwind explodes, SL stays bounded
    and accurate — the large-dt sub-cycling regime the scheme exists
    for (reference: NSE solver interval, boussinesq_model.tpp:1867-1905)."""
    geo, specs, phi, f0, u = _annulus_setup(64)
    dphi = 2 * np.pi / 64
    dt = 3.0 * dphi            # CFL 3 against angular speed 1
    f = f0
    for _ in range(12):
        f = semi_lagrangian_transport(geo, u, f, specs, dt, ghost_width=4)
    assert float(jnp.max(jnp.abs(f))) <= 1.0 + 1e-6   # monotone, stable
    t_end = 12 * dt
    exact = np.broadcast_to(np.sin(2 * (phi - t_end))[None, :],
                            geo.cell_shape)
    assert float(jnp.max(jnp.abs(f - jnp.asarray(exact)))) < 0.25


def test_no_flow_identity():
    geo, specs, _, f0, _ = _annulus_setup(32)
    u0 = jnp.zeros((2,) + geo.cell_shape)
    f = semi_lagrangian_transport(geo, u0, f0, specs, 0.1)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f0), atol=1e-12)


def test_model_temperature_option_runs():
    from dycoreplanet_tpu.base.params import Parameters
    from dycoreplanet_tpu.models import BoussinesqModel

    p = Parameters.from_text("")
    p.space_dimension = 2
    p.numerics.dtype = "float64"
    p.numerics.n_radial, p.numerics.n_lon = 8, 48
    p.numerics.temperature_advection = "semi-lagrangian"
    p.physical_constants.R0 = 1.0
    p.physical_constants.atm_height = 2.0
    p.physical_constants.expansion_coefficient = 0.3
    p.physical_constants.__post_init__()
    p.reference_quantities.velocity = 1.0
    p.reference_quantities.length = 1.0
    p.reference_quantities.temperature_ref = 2.0
    p.reference_quantities.__post_init__()
    m = BoussinesqModel(p)
    s = m.initial_state()
    for _ in range(3):
        s, d = m.step(s, 0.01)
    assert np.isfinite(d.max_velocity)
    assert d.T_max <= float(np.max(np.asarray(m.T_init))) + 1e-6  # monotone
