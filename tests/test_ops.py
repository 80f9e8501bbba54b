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


class TestMusclAdvection:
    """Second-order MUSCL vs first-order upwind (ops/stencil.py
    muscl_to_faces): convergence order and TVD monotonicity on solid
    rotation around the periodic annulus axis."""

    @staticmethod
    def _advect_error(n_phi, scheme, steps=None):
        from dycoreplanet_tpu.grid import factory
        from dycoreplanet_tpu.ops import stencil as st
        from dycoreplanet_tpu.ops.bc import BC, BCSpec

        geo = factory.make_annulus(4, n_phi, 1.0, 2.0)
        specs = [BCSpec(BC.NEUMANN, BC.NEUMANN), None]
        phi = np.asarray(geo.axes[1].centers)
        r = np.asarray(geo.axes[0].centers)
        f0 = jnp.asarray(np.broadcast_to(
            np.sin(3 * phi)[None, :], geo.cell_shape).copy())
        # angular velocity 1: u_phi = r at faces -> df/dt = -df/dphi
        u_phi = jnp.asarray(np.broadcast_to(r[:, None], geo.cell_shape))
        u_faces = [jnp.zeros(geo.cell_shape), u_phi]
        dphi = 2 * np.pi / n_phi
        dt = 0.2 * dphi          # CFL 0.2 against angular speed 1
        steps = steps if steps is not None else int(round(0.5 / dt))
        t_end = steps * dt
        def rhs(g):
            return -st.advect_scalar(geo, u_faces, g, specs,
                                     scheme=scheme, form="advective")

        f = f0
        for _ in range(steps):   # SSP-RK2: isolates the SPATIAL order
            f1 = f + dt * rhs(f)
            f = 0.5 * (f + f1 + dt * rhs(f1))
        exact = np.broadcast_to(
            np.sin(3 * (phi - t_end))[None, :], geo.cell_shape)
        return float(jnp.max(jnp.abs(f - jnp.asarray(exact))))

    def test_muscl_converges_faster_than_upwind(self):
        e_mu_64 = self._advect_error(64, "muscl")
        e_mu_128 = self._advect_error(128, "muscl")
        e_up_128 = self._advect_error(128, "upwind")
        assert e_mu_128 < e_up_128 / 3          # much more accurate
        # max-norm order ~1.4 (van Leer clips smooth extrema; L1 is ~2)
        assert e_mu_64 / e_mu_128 > 2.3

    def test_muscl_is_tvd_on_step_profile(self):
        from dycoreplanet_tpu.grid import factory
        from dycoreplanet_tpu.ops import stencil as st
        from dycoreplanet_tpu.ops.bc import BC, BCSpec

        geo = factory.make_annulus(4, 64, 1.0, 2.0)
        specs = [BCSpec(BC.NEUMANN, BC.NEUMANN), None]
        phi = np.asarray(geo.axes[1].centers)
        step = (np.abs(phi - np.pi) < 0.8).astype(float)
        f = jnp.asarray(np.broadcast_to(step[None, :], geo.cell_shape).copy())
        r = np.asarray(geo.axes[0].centers)
        u_faces = [jnp.zeros(geo.cell_shape),
                   jnp.asarray(np.broadcast_to(r[:, None], geo.cell_shape))]
        dt = 0.2 * (2 * np.pi / 64)
        for _ in range(40):
            f = f - dt * st.advect_scalar(geo, u_faces, f, specs,
                                          scheme="muscl", form="advective")
        assert float(jnp.max(f)) <= 1.0 + 1e-10   # no overshoot
        assert float(jnp.min(f)) >= -1e-10        # no undershoot


class TestBatchedVectorOps:
    """weak_laplacian_stacked / advect_vector must equal the stacked
    per-component scalar calls exactly, for every geometry."""

    def _setup(self, kind):
        from dycoreplanet_tpu.grid import factory
        from dycoreplanet_tpu.ops.bc import BC, BCSpec
        AS, NEU = BC.ANTISYM, BC.NEUMANN
        if kind == "shell":
            g = factory.make_shell(6, 8, 16, 1.0, 3.0)
            PO, PF = BC.POLE, BC.POLE_FLIP
            specs = [
                [BCSpec(AS, AS), BCSpec(PO, PO), None],
                [BCSpec(AS, NEU), BCSpec(PF, PF), None],
                [BCSpec(AS, NEU), BCSpec(PF, PF), None],
            ]
        elif kind == "cuboid":
            g = factory.make_cuboid(6, 8, 10)
            specs = [
                [BCSpec(AS, AS), None, None],
                [BCSpec(AS, NEU), None, None],
                [BCSpec(AS, NEU), None, None],
            ]
        else:
            g = factory.make_annulus(6, 16, 1.0, 2.0)
            specs = [
                [BCSpec(AS, AS), None],
                [BCSpec(AS, NEU), None],
            ]
        rng = np.random.RandomState(hash(kind) % 2**31)
        u = jnp.asarray(rng.randn(g.dim, *g.cell_shape))
        uf = [jnp.asarray(rng.randn(*g.cell_shape)) for _ in range(g.dim)]
        return g, specs, u, uf

    @pytest.mark.parametrize("kind", ["shell", "cuboid", "annulus"])
    def test_weak_laplacian_stacked(self, kind):
        g, specs, u, _ = self._setup(kind)
        batched = st.weak_laplacian_stacked(g, u, specs)
        ref = jnp.stack([st.weak_laplacian(g, u[c], specs[c])
                         for c in range(g.dim)])
        np.testing.assert_allclose(np.asarray(batched), np.asarray(ref),
                                   rtol=0, atol=1e-13)

    @pytest.mark.parametrize("kind", ["shell", "cuboid", "annulus"])
    @pytest.mark.parametrize("scheme", ["upwind", "muscl", "centered"])
    def test_advect_vector(self, kind, scheme):
        g, specs, u, uf = self._setup(kind)
        batched = st.advect_vector(g, uf, u, specs, scheme=scheme,
                                   form="advective")
        ref = jnp.stack([
            st.advect_scalar(g, uf, u[c], specs[c], scheme=scheme,
                             form="advective")
            for c in range(g.dim)
        ])
        np.testing.assert_allclose(np.asarray(batched), np.asarray(ref),
                                   rtol=0, atol=1e-12)

    @pytest.mark.parametrize("kind", ["shell"])
    def test_advect_vector_flux_form(self, kind):
        g, specs, u, uf = self._setup(kind)
        batched = st.advect_vector(g, uf, u, specs, scheme="muscl",
                                   form="flux")
        ref = jnp.stack([
            st.advect_scalar(g, uf, u[c], specs[c], scheme="muscl",
                             form="flux")
            for c in range(g.dim)
        ])
        np.testing.assert_allclose(np.asarray(batched), np.asarray(ref),
                                   rtol=0, atol=1e-12)
