"""bfloat16 state / f32-accumulate mixed precision, and the
reference-state buoyancy split on the production constants config."""

import numpy as np

from dycoreplanet_tpu.base.params import Parameters
from dycoreplanet_tpu.models import BoussinesqModel


def _annulus_params(dtype="bfloat16"):
    p = Parameters.from_text("")
    p.space_dimension = 2
    p.numerics.dtype = dtype
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
    return p


def test_bfloat16_steps_track_float64():
    import jax.numpy as jnp

    m16 = BoussinesqModel(_annulus_params("bfloat16"))
    m64 = BoussinesqModel(_annulus_params("float64"))
    s16, s64 = m16.initial_state(), m64.initial_state()
    assert s16.u.dtype == jnp.bfloat16
    for _ in range(3):
        s16, d16 = m16.step(s16, 0.01)
        s64, d64 = m64.step(s64, 0.01)
    assert np.isfinite(d16.max_velocity)
    # bf16 has ~3 decimal digits; trajectories agree to that level
    assert abs(d16.max_velocity - d64.max_velocity) < 0.1 * max(
        d64.max_velocity, 1e-6)
    assert d16.div_norm < 1e-2


def test_production_constants_reference_state_split():
    """aqua_planet.prm-style dimensional constants: T_ref = 273.15 K
    makes 1 - beta (T - T_ref) a ~2x uniform density. The reference-state
    split absorbs rho0 = rho(mean T_init) into the hydrostatic
    background, so the quiescent-atmosphere start stays quiescent
    instead of developing an O(10) uniform-buoyancy blowup."""
    p = Parameters.from_file("data/aqua_planet.prm")
    p.numerics.dtype = "float64"
    p.numerics.n_radial, p.numerics.n_lon = 8, 48
    m = BoussinesqModel(p)
    assert abs(m.rho_background - 2.0) < 0.1   # 1 + 0.003661*273.15
    s = m.initial_state()
    for _ in range(3):
        s, d = m.step(s, p.time_step)
    assert d.max_velocity < 1e-3
