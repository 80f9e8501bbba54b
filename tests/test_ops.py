"""Stencil-operator tests: discrete identities and convergence to
analytic derivatives on all three geometries."""

import jax.numpy as jnp
import numpy as np
import pytest

from dycoreplanet_tpu.grid import make_annulus, make_cuboid, make_shell
from dycoreplanet_tpu.ops.bc import BC, BCSpec
from dycoreplanet_tpu.ops import stencil as st


NEU = BCSpec(BC.NEUMANN, BC.NEUMANN)


def _cuboid_coords(g):
    z = g.axes[0].centers.reshape(-1, 1, 1)
    y = g.axes[1].centers.reshape(1, -1, 1)
    x = g.axes[2].centers.reshape(1, 1, -1)
    return z, y, x


class TestDivergenceTheorem:
    """Integral of div over the domain telescopes to the boundary flux —
    exact (machine precision) for the FV operator, any geometry."""

    def test_cuboid_divergence_theorem(self):
        # arbitrary face field with zero wall-normal flow: total
        # divergence integrates to exactly zero (cell-shaped faces,
        # index 0 = lo wall, hi wall implicit zero)
        g = make_cuboid(8, 8, 8)
        rng = np.random.RandomState(7)
        u = [jnp.asarray(rng.randn(*g.cell_shape)) for _ in range(3)]
        u[0] = u[0].at[0].set(0.0)
        div = st.divergence(g, u)
        integral = float(st.volume_integral(g, div))
        assert abs(integral) < 1e-12

    def test_annulus_radial_field(self):
        # u_r = 1/r has zero divergence in 2D polar coords; discrete FV
        # version is exact (A_r = r dphi) away from the implicit hi wall
        g = make_annulus(16, 64, 1.0, 3.0)
        rf_left = jnp.asarray(g.extras["r_faces"][:-1])  # left faces (nr,1)
        u_r = jnp.broadcast_to(1.0 / rf_left, g.cell_shape)
        u_phi = jnp.zeros(g.cell_shape)
        div = st.divergence(g, [u_r, u_phi])
        assert float(jnp.max(jnp.abs(div[:-1]))) < 1e-13

    def test_shell_radial_field(self):
        # u_r = 1/r^2 is divergence-free in 3D; exact for FV with A_r ~ r^2
        g = make_shell(8, 16, 32, 1.0, 3.0)
        rf_left = jnp.asarray(g.extras["r_faces"][:-1])
        u_r = jnp.broadcast_to(1.0 / rf_left**2, g.cell_shape)
        u_lat = jnp.zeros(g.cell_shape)
        u_lon = jnp.zeros(g.cell_shape)
        div = st.divergence(g, [u_r, u_lat, u_lon])
        assert float(jnp.max(jnp.abs(div[:-1]))) < 1e-12


class TestLaplacianConvergence:
    def test_cuboid_trig(self):
        errs = []
        for n in (16, 32):
            g = make_cuboid(n, n, n)
            z, y, x = _cuboid_coords(g)
            f = jnp.sin(2 * np.pi * jnp.asarray(x)) * jnp.cos(2 * np.pi * jnp.asarray(y)) + 0 * z
            specs = [NEU, None, None]
            lap = st.laplacian(g, jnp.broadcast_to(f, g.cell_shape), specs)
            exact = -2 * (2 * np.pi) ** 2 * f
            errs.append(float(jnp.max(jnp.abs(lap - exact))))
        assert errs[1] < errs[0] / 3.0  # ~2nd order

    def test_annulus_log_r(self):
        # log(r) is harmonic in 2D away from origin; measure on the
        # fixed physical band r in [1.5, 2.5] (resolution-independent
        # region) to see the clean interior order
        errs = []
        for nr, nphi in ((16, 48), (32, 96)):
            g = make_annulus(nr, nphi, 1.0, 3.0)
            rc = jnp.asarray(g.extras["r_centers"])
            f = jnp.broadcast_to(jnp.log(rc), g.cell_shape)
            lap = st.laplacian(g, f, [NEU, None])
            band = (np.asarray(g.extras["r_centers"])[:, 0] > 1.5) & (
                np.asarray(g.extras["r_centers"])[:, 0] < 2.5)
            errs.append(float(jnp.max(jnp.abs(lap[band]))))
        assert errs[1] < errs[0] / 3.0

    def test_shell_one_over_r(self):
        # 1/r is harmonic in 3D; same fixed-band measurement
        errs = []
        for nr, nlat, nlon in ((8, 16, 32), (16, 32, 64)):
            g = make_shell(nr, nlat, nlon, 1.0, 3.0)
            rc = jnp.asarray(g.extras["r_centers"])
            f = jnp.broadcast_to(1.0 / rc, g.cell_shape)
            lap = st.laplacian(g, f, [NEU, NEU, None])
            band = (np.asarray(g.extras["r_centers"])[:, 0, 0] > 1.5) & (
                np.asarray(g.extras["r_centers"])[:, 0, 0] < 2.5)
            errs.append(float(jnp.max(jnp.abs(lap[band]))))
        assert errs[1] < errs[0] / 3.0


class TestWeakLaplacianSymmetry:
    """weak_laplacian must be symmetric: <L f, g> == <f, L g> in the
    plain dot product (this is what makes CG valid)."""

    @pytest.mark.parametrize("kind", ["cuboid", "annulus", "shell"])
    def test_symmetry(self, kind):
        rng = np.random.RandomState(3)
        if kind == "cuboid":
            g = make_cuboid(6, 6, 6)
            specs = [NEU, None, None]
        elif kind == "annulus":
            g = make_annulus(8, 16, 1.0, 3.0)
            specs = [NEU, None]
        else:
            g = make_shell(4, 8, 16, 1.0, 3.0)
            specs = [NEU, BCSpec(BC.POLE, BC.POLE), None]
        f = jnp.asarray(rng.randn(*g.cell_shape))
        h = jnp.asarray(rng.randn(*g.cell_shape))
        Lf = st.weak_laplacian(g, f, specs)
        Lh = st.weak_laplacian(g, h, specs)
        a = float(jnp.sum(Lf * h))
        b = float(jnp.sum(f * Lh))
        assert a == pytest.approx(b, rel=1e-10)


class TestAdvection:
    def test_constant_field_advection_zero(self):
        # advective form of a constant field must vanish regardless of u
        g = make_cuboid(8, 8, 8)
        rng = np.random.RandomState(0)
        u = [jnp.asarray(rng.randn(*g.cell_shape)) for _ in range(3)]
        f = jnp.full(g.cell_shape, 3.7)
        adv = st.advect_scalar(g, u, f, [NEU, None, None], scheme="upwind")
        assert float(jnp.max(jnp.abs(adv))) < 1e-12

    def test_flux_form_conserves(self):
        # conservative form integrates to zero with no wall flux
        g = make_cuboid(8, 8, 8)
        rng = np.random.RandomState(1)
        u = [jnp.asarray(rng.randn(*g.cell_shape)) for _ in range(3)]
        u[0] = u[0].at[0].set(0.0)
        f = jnp.asarray(rng.rand(*g.cell_shape))
        adv = st.advect_scalar(g, u, f, [NEU, None, None], scheme="upwind", form="flux")
        assert abs(float(st.volume_integral(g, adv))) < 1e-12

    def test_uniform_advection_accuracy(self):
        # translate a smooth bump with constant u: upwind approximates u df/dx
        g = make_cuboid(4, 4, 64)
        z, y, x = _cuboid_coords(g)
        f = jnp.broadcast_to(jnp.sin(2 * np.pi * jnp.asarray(x)), g.cell_shape)
        u = [jnp.zeros(g.cell_shape), jnp.zeros(g.cell_shape),
             jnp.ones(g.cell_shape)]
        adv = st.advect_scalar(g, u, f, [NEU, None, None], scheme="centered")
        exact = 2 * np.pi * jnp.cos(2 * np.pi * jnp.asarray(x))
        err = float(jnp.max(jnp.abs(adv - jnp.broadcast_to(exact, g.cell_shape))))
        assert err < 0.05  # centered 2nd order at n=64


def test_volume_mean_constant():
    g = make_shell(4, 8, 16, 1.0, 3.0)
    f = jnp.full(g.cell_shape, 2.5)
    assert float(st.volume_mean(g, f)) == pytest.approx(2.5, rel=1e-12)
