"""Tests for physics closures and initial data
(reference parity: include/model_data/*.tpp)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from dycoreplanet_tpu.physics import closures
from dycoreplanet_tpu.physics.initial_data import (
    TemperatureInitialValues,
    TemperatureInitialValuesCuboid,
    temperature_rhs,
    velocity_initial_values,
)


def test_vertical_gravity():
    p = jnp.asarray([[0.3, 0.4, 0.5], [1.0, 2.0, 3.0]])
    g = closures.vertical_gravity_vector(p, 9.81)
    np.testing.assert_allclose(np.asarray(g), [[0, 0, -9.81], [0, 0, -9.81]])


def test_radial_gravity_piecewise():
    # reference: core_model_data.tpp:97-106 — -g p/r outside unit radius,
    # -g p/sqrt(r) inside
    p_out = jnp.asarray([2.0, 0.0, 0.0])
    g_out = closures.gravity_vector(p_out, 9.81)
    np.testing.assert_allclose(np.asarray(g_out), [-9.81, 0, 0], rtol=1e-12)
    p_in = jnp.asarray([0.25, 0.0, 0.0])
    g_in = closures.gravity_vector(p_in, 1.0)
    # r=0.25 -> -g*p/sqrt(0.25) = -p*2
    np.testing.assert_allclose(np.asarray(g_in), [-0.5, 0, 0], rtol=1e-12)


def test_radial_gravity_scalar_consistent_with_vector():
    for r in [0.3, 0.9, 1.5, 2.9]:
        p = jnp.asarray([r, 0.0, 0.0])
        vec = closures.gravity_vector(p, 1.7)
        scal = closures.radial_gravity_scalar(jnp.asarray(r), 1.7)
        np.testing.assert_allclose(float(vec[0]), float(scal), rtol=1e-12)


def test_coriolis_3d_matches_cross_product():
    om = (0.0, 0.0, 2.0)
    u = jnp.asarray([[1.0, 0.0, 0.0]])
    a = closures.coriolis_acceleration_3d(u, om)
    # -2 Omega x u = -2*(0,0,2)x(1,0,0) = -2*(0,2,0)
    np.testing.assert_allclose(np.asarray(a), [[0.0, -4.0, 0.0]], atol=1e-12)


def test_coriolis_2d_reference_form():
    u = jnp.asarray([[3.0, 4.0]])
    a = closures.coriolis_acceleration_2d(u)
    # +2*cross2d(u) = 2*(u_y, -u_x)
    np.testing.assert_allclose(np.asarray(a), [[8.0, -6.0]], atol=1e-12)


def test_euler_rotation_orthonormal():
    R = closures.euler_rotation_matrix(math.pi / 3, math.pi / 6, math.pi / 4)
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-12)
    assert float(jnp.linalg.det(R)) == pytest.approx(1.0)


class TestTemperatureIC:
    def test_3d_centers_unrotated(self):
        # reference 3D: rotate=false, centers at (R0+0.35dR, 0, 0) and
        # (0, R0+0.65dR, 0) (boussinesq_model_data.tpp:109-118)
        ic = TemperatureInitialValues(3, 1.0, 3.0)
        np.testing.assert_allclose(np.asarray(ic.center1), [1.7, 0, 0], atol=1e-12)
        np.testing.assert_allclose(np.asarray(ic.center2), [0, 2.3, 0], atol=1e-12)
        # precision 20/(dR/2) = 20
        assert ic.precision == pytest.approx(20.0)

    def test_3d_value_formula(self):
        ic = TemperatureInitialValues(3, 1.0, 3.0)
        p = jnp.asarray([1.7, 0.0, 0.0])  # exactly at center1
        got = float(ic(p))
        prec = 20.0
        expect = math.sqrt(prec**3) / math.sqrt((2 * math.pi) ** 3) * (
            1.0 + math.exp(-0.5 * prec * (1.7**2 + 2.3**2))
        )
        assert got == pytest.approx(expect, rel=1e-12)

    def test_2d_centers_rotated_twice(self):
        # 2D applies R*c*R^T which for deal.II tensor algebra equals R(Rc):
        # a rotation by 2*pi/3 (see initial_data.py docstring).
        ic = TemperatureInitialValues(2, 10.0, 30.0)
        ang = 2 * math.pi / 3
        c1 = np.array([math.cos(ang), math.sin(ang)]) * 17.0
        np.testing.assert_allclose(np.asarray(ic.center1), c1, atol=1e-10)

    def test_positive_and_symmetric(self):
        ic = TemperatureInitialValues(3, 1.0, 3.0)
        pts = jnp.asarray(np.random.RandomState(0).randn(50, 3) * 2)
        vals = ic(pts)
        assert np.all(np.asarray(vals) >= 0)


class TestCuboidIC:
    def test_peak_amplitude(self):
        # reference: precision=1/(0.1 d)^2, divisor 2*(2 pi)
        ic = TemperatureInitialValuesCuboid(3, jnp.asarray([0.5, 0.5, 0.5]), 1.0)
        got = float(ic(jnp.asarray([0.5, 0.5, 0.5])))
        prec = 1.0 / 0.01
        expect = prec ** 1.5 / (2 * (2 * math.pi))
        assert got == pytest.approx(expect, rel=1e-12)


def test_velocity_ic_zero_and_rhs_zero():
    p = jnp.ones((4, 3))
    assert float(jnp.max(jnp.abs(velocity_initial_values(p)))) == 0.0
    assert float(jnp.max(jnp.abs(temperature_rhs(p)))) == 0.0


def test_coriolis_mode_knob():
    """'coriolis mode = physical' applies 2 Omega x u on the 3D shell
    where the reference path has none (SURVEY.md section 7.5)."""
    from dycoreplanet_tpu.base.params import Parameters
    from dycoreplanet_tpu.models import BoussinesqModel

    def build(mode):
        p = Parameters.from_text("")
        p.space_dimension = 3
        p.cuboid_geometry = False
        p.numerics.dtype = "float64"
        p.numerics.coriolis_mode = mode
        p.numerics.n_radial, p.numerics.n_lat, p.numerics.n_lon = 4, 8, 16
        p.physical_constants.R0 = 1.0
        p.physical_constants.atm_height = 2.0
        p.physical_constants.omega = 0.5
        p.physical_constants.__post_init__()
        p.reference_quantities.velocity = 1.0
        p.reference_quantities.length = 1.0
        p.reference_quantities.temperature_ref = 2.0
        p.reference_quantities.__post_init__()
        return BoussinesqModel(p)

    mr, mp = build("reference"), build("physical")
    sr, sp = mr.initial_state(), mp.initial_state()
    for _ in range(3):
        sr, _ = mr.step(sr, 0.01)
        sp, _ = mp.step(sp, 0.01)
    dr = float(np.max(np.abs(np.asarray(sr.u) - np.asarray(sp.u))))
    assert dr > 1e-8  # rotation actually acts in physical mode
    assert np.isfinite(np.asarray(sp.u)).all()
