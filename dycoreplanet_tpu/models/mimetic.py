"""MimeticBoussinesqModel — the staggered C-grid FEEC personality.

The structure-preserving counterpart of the reference's
ExteriorCalculus::BoussinesqModel (reference:
include/core/boussineq_model_FEEC.{h,tpp}): where the reference uses a
Nedelec (H(curl) vorticity) / Raviart-Thomas (H(div) velocity) / DGQ
(L2 pressure) complex, this model makes the FACE-NORMAL velocities the
prognostic variables on the MAC lattice and evaluates the dynamics
through the discrete de Rham complex of ops/staggered.py:

  * advection is the vector-invariant rotational form
    omega x u + grad|u|^2/2 with omega the EDGE vorticity
    (reference explicit advection: FEEC.tpp:786-805), Sadourny
    double-averaged — discretely energy-conserving on the periodic
    uniform cuboid;
  * Coriolis enters as planetary vorticity added to the edge vorticity
    before the cross product (automatically energy-conserving);
  * viscosity is the mimetic -curl(curl u) — exactly the FEEC weak
    form's dt/Re (phi_u, curl w) coupling (FEEC.tpp:753-769) — solved
    implicitly by CG on the SPD operator W + dt/Re C^T M C;
  * the pressure projection acts directly on the prognostic faces:
    div u = 0 holds to solver tolerance afterwards, and because
    curl(grad phi) = 0 telescopes exactly, the correction never
    changes the discrete vorticity (the property the collocated
    projection path cannot provide; tests/test_mimetic_model.py).

Geometries: 3D/2D cuboid, 2D annulus and the 3D spherical shell. The
shell's pole closure (reference shell FEEC constraints:
boussineq_model_FEEC.tpp:372-420) reuses the half-turn antipodal ghost
rules of the collocated path for the edge algebra (ops/staggered.py
_gapply; ghost metrics are the mirrored |cos| values), the pole faces
carry zero normal flux through their zero areas, and the degenerate
zero-area polar dual loops carry zero vorticity / zero viscous weight
(symmetric PSD is preserved). `feec formulation = staggered` therefore
runs aqua_planet_shell_test_3d-feec.prm on this model; the coupled 3x3
solve of models/boussinesq.py remains the `coupled` realization.

Everything else (temperature solve, diagnostics, multi-step scan, CFL
control, IO) is inherited from BoussinesqModel; temperature advection
uses the conservative flux form (exact discrete heat conservation with
the divergence-free face fluxes in flux-closed domains).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dycoreplanet_tpu.base import nondim
from dycoreplanet_tpu.base.params import Parameters
from dycoreplanet_tpu.grid.geometry import Geometry
from dycoreplanet_tpu.models.boussinesq import (
    BoussinesqModel,
    State,
    StepDiagnostics,
)
from dycoreplanet_tpu.ops import stencil as st
from dycoreplanet_tpu.ops.staggered import StaggeredOps
from dycoreplanet_tpu.solvers.cg import cg


class MimeticBoussinesqModel(BoussinesqModel):
    """Staggered (C-grid) structure-preserving Boussinesq driver."""

    def __init__(self, params: Parameters, geometry: Optional[Geometry] = None):
        super().__init__(params, geometry)
        geo = self.geo
        self.stag = StaggeredOps(geo, self.u_specs, self.scalar_specs)
        sg = self.stag
        dtn = self.dtype

        # face mass weights w = A*h in the cell-shaped layout
        self._w_cell = [
            np.ascontiguousarray(np.broadcast_to(
                st._left_metric(geo, d, sg.w_face[d]), geo.cell_shape)
            ).astype(dtn)
            for d in range(geo.dim)
        ]
        self._w_stack = np.stack(self._w_cell)
        self._cc_diag = np.stack([
            np.ascontiguousarray(np.broadcast_to(
                np.asarray(dg), geo.cell_shape)).astype(dtn)
            for dg in sg.curlcurl_diag()
        ])
        # gravity at the axis-0 faces (cell-shaped): same radial law as
        # the cell-centered field (core_model_data.tpp:97-106)
        if geo.kind == "cuboid":
            g0f = np.full(geo.cell_shape,
                          -params.physical_constants.gravity_constant)
        else:
            rf = np.asarray(geo.axes[0].faces[:-1])  # left faces
            g0 = params.physical_constants.gravity_constant
            grf = np.where(rf > 1.0, -g0, -g0 * np.sqrt(np.maximum(rf, 0.0)))
            shape1 = (geo.cell_shape[0],) + (1,) * (geo.dim - 1)
            g0f = np.broadcast_to(grf.reshape(shape1), geo.cell_shape)
        self._gravity_face0 = np.ascontiguousarray(
            self.g_hat_scale * g0f).astype(dtn)

        # planetary vorticity on the shell's edges (physical mode):
        # 2*Omega*sin(lat) at the r-edges (lat faces), 2*Omega*cos(lat)
        # at the lat-edges (lat centers)
        if geo.kind == "shell":
            om = 2.0 * self.omega_hat
            lat_f = np.asarray(geo.axes[1].faces, np.float64)
            lat_c = np.asarray(geo.axes[1].centers, np.float64)
            self._plan_vort0 = (om * np.sin(lat_f)).reshape(
                1, -1, 1).astype(dtn)
            self._plan_vort1 = (om * np.cos(lat_c)).reshape(
                1, -1, 1).astype(dtn)

        # the staggered path added large numpy constants after the
        # parent registry scan — rebuild so they hoist consistently
        self._setup_const_registry()
        self._jit_step = jax.jit(self._step_consts)

    # ------------------------------------------------------------------
    def _face_tendency(self, U, pres, T):
        """Explicit face-normal momentum tendency from step n:
        vector-invariant advection + Coriolis (as planetary vorticity)
        + buoyancy + grad p^n (incremental). Full-face input, list of
        full-face outputs."""
        geo = self.geo
        p = self.params
        sg = self.stag
        dim = geo.dim

        zeta = sg.vorticity(U)
        if dim == 2:
            # q = zeta_cyc + f  (2D tendency = q * (u_1, -u_0); the
            # reference's 2D Coriolis is the un-scaled 2*u_perp quirk,
            # boussinesq_model.tpp:663-667)
            f_cor = 2.0 if self.coriolis_mode == "reference" \
                else 2.0 * self.omega_hat
            q = zeta + jnp.asarray(f_cor, zeta.dtype)
        else:
            # q = -zeta_cyc + 2 Omega_hat (z_hat . e_c)  (left-handed
            # (z,y,x)/(r,lat,lon) array ordering; see ops/staggered.py
            # module docstring). Cuboid: rotation about array axis 0,
            # matching both reference modes (boussinesq_model.tpp:
            # 616-621). Shell: the reference's 3D shell standard path
            # applies NO Coriolis (the documented quirk), so
            # coriolis_mode="reference" adds none; "physical" adds the
            # planetary vorticity decomposed in the local frame,
            # z_hat = sin(lat) r_hat + cos(lat) lat_hat, evaluated at
            # the edge latitudes (validated against the collocated
            # kernel's Coriolis acceleration in test_mimetic_model.py).
            om = 2.0 * self.omega_hat
            if geo.kind == "cuboid":
                q = [-zeta[0] + jnp.asarray(om, zeta[0].dtype),
                     -zeta[1], -zeta[2]]
            elif self.coriolis_mode == "physical":
                f0 = jnp.asarray(self._plan_vort0, zeta[0].dtype)
                f1 = jnp.asarray(self._plan_vort1, zeta[1].dtype)
                q = [-zeta[0] + f0, -zeta[1] + f1, -zeta[2]]
            else:
                q = [-zeta[0], -zeta[1], -zeta[2]]
        tend = sg.cross(q, U)

        K = sg.kinetic_energy(U)
        gradK = sg.grad_faces(K, self.scalar_specs)
        tend = [tend[d] - gradK[d] for d in range(dim)]

        # buoyancy: rho(T) g on the gravity-axis faces (well-balanced
        # perturbation split like the parent; boussinesq.py docstring)
        rho = nondim.density_scaling(self.beta, T, self.T_ref)
        if p.numerics.buoyancy == "perturbation":
            rho = rho - jnp.asarray(self.rho_background, rho.dtype)
        rho_f = sg.avg_c2f(rho, 0, self.p_specs[0])
        gf = jnp.asarray(self._gravity_face0, U[0].dtype)
        # full-face buoyancy: pad the cell-shaped gravity with its wall
        # value (tendency at walls is discarded by contract anyway)
        if not geo.axes[0].periodic:
            gf_full = jnp.concatenate([gf, gf[-1:]], axis=0)
        else:
            gf_full = gf
        tend[0] = tend[0] + rho_f * gf_full

        if p.numerics.projection == "incremental":
            gp = sg.grad_faces(pres, self.p_specs)
            tend = [tend[d] - gp[d] for d in range(dim)]
        return tend

    # ------------------------------------------------------------------
    def _solve_momentum_mimetic(self, uf_star_rhs, dt):
        """Implicit mimetic viscous solve: (W + dt/Re C^T M C) u* =
        W rhs on the stacked cell-shaped face layout (SPD; Jacobi-CG).
        The reference analogue is the w-u coupling block of the 3x3
        FEEC system (FEEC.tpp:753-769)."""
        geo = self.geo
        p = self.params
        sg = self.stag
        dim = geo.dim
        coef = dt * self.one_over_Re
        w = jnp.asarray(self._w_stack)

        def helm_op(x):
            U = sg.expand([x[d] for d in range(dim)])
            cc = sg.contract(sg.curlcurl_weighted(U))
            return w * x + coef * jnp.stack(cc)

        rhs = w * uf_star_rhs
        diag = w + coef * jnp.asarray(self._cc_diag)
        # NOTE: unlike the collocated Helmholtz, this system is NOT
        # Jacobi-benign at production grids — the edge-weighted
        # curl-curl's off-diagonal reach near the poles defeats the
        # fixed Jacobi-Richardson fast path (measured at 32x128x256:
        # every chunk missed 1e-8 and escalated to CG, round-5 A/B),
        # so Jacobi-CG stays the solver here.
        res = cg(helm_op, rhs, x0=uf_star_rhs,
                 rtol=p.numerics.helmholtz_tol,
                 maxiter=p.numerics.max_cg_iters,
                 preconditioner=lambda r: r / diag)
        return res.x, res.iterations, res.residual_norm, res.converged

    # ------------------------------------------------------------------
    def _step_impl(self, state: State, dt: jnp.ndarray):
        # same per-model sharded-lowering scope as the parent class:
        # without it the staggered algebra lowers through the pad/
        # concat stencil forms that GSPMD reshards with all-to-alls
        # (measured 95 per step on an 8-device mesh; with the scope the
        # step is permute+psum only — tests/test_collectives.py)
        with st.trace_sharded(self._sharded_trace):
            return self._step_body(state, dt)

    def _step_body(self, state: State, dt: jnp.ndarray):
        geo = self.geo
        p = self.params
        sg = self.stag
        dim = geo.dim
        vol = self.vol
        pres, T = state.p, state.T
        dt = jnp.asarray(dt, self.dtype)
        dt_T = dt / p.NSE_solver_interval

        uf_cell = [jnp.asarray(f) for f in state.u_faces]
        U = sg.expand(uf_cell)

        # ---------------- explicit tendency on faces ------------------
        tend = self._face_tendency(U, pres, T)
        rhs_faces = jnp.stack(sg.contract(
            [U[d] + dt * tend[d] for d in range(dim)]))

        # ---------------- implicit mimetic viscosity ------------------
        u_star, helm_it, helm_rnorm, helm_ok = self._solve_momentum_mimetic(
            rhs_faces, dt)
        uf_star = [u_star[d] for d in range(dim)]
        uf_star = [self._apply_wall_face_values(uf_star[d], d)
                   for d in range(dim)]

        # ---------------- pressure projection on the faces ------------
        div_star = st.divergence(geo, uf_star)
        rhs_phi = -vol * div_star / dt
        rhs_phi = rhs_phi - jnp.mean(rhs_phi)
        phi, poisson_iters, poisson_rnorm, _poisson_ok = self._solve_pressure_poisson(
            rhs_phi)
        phi = phi - st.volume_mean(geo, phi)

        new_faces = []
        for d in range(dim):
            gphi = st.grad_left_faces(geo, phi, d, self.p_specs[d])
            new_faces.append(self._apply_wall_face_values(
                uf_star[d] - dt * gphi, d))
        if p.numerics.projection == "incremental":
            p_new = pres + phi
        else:
            p_new = phi
        if p.correct_pressure_to_zero_mean:
            p_new = p_new - st.volume_mean(geo, p_new)

        # diagnostic cell-centered velocity (local-frame components)
        U_new = sg.expand(new_faces)
        u_new = jnp.stack([sg.avg_f2c(U_new[c], c) for c in range(dim)])

        # ---------------- temperature (conservative flux form) --------
        T_adv = self._advected_temperature(state.u, state.u_faces, T, dt_T)
        rhs_T = vol * T_adv + dt_T * self.one_over_Pe * self.T_lap_offset
        kT = dt_T * self.one_over_Pe
        T_new, T_iters, T_rnorm, T_ok = self._solve_temperature_system(
            rhs_T, kT, T)

        # ---------------- diagnostics ---------------------------------
        speed = st.cell_max_speed(geo, u_new)
        cfl = jnp.max(jnp.maximum(speed, 1e-10) / self.diameter)
        max_vel = jnp.max(speed)
        div_new = st.divergence(geo, new_faces)
        packed = StepDiagnostics.pack(
            cfl, max_vel, jnp.min(T_new), jnp.max(T_new),
            jnp.max(jnp.abs(div_new)),
            poisson_iters, T_iters,
            jnp.stack([helm_it] * dim),
            helmholtz_residual=helm_rnorm, poisson_residual=poisson_rnorm,
            temperature_residual=T_rnorm,
            solver_ok=jnp.logical_and(
                jnp.logical_and(T_ok, _poisson_ok), helm_ok))
        new_state = State(
            u=u_new, u_faces=tuple(new_faces), p=p_new, T=T_new,
            time=state.time + dt_T,
            step_number=state.step_number + 1,
        )
        return new_state, packed

    # ------------------------------------------------------------------
    def _advected_temperature(self, u, u_faces, T, dt_T):
        """Conservative flux-form transport with the (divergence-free)
        prognostic face fluxes: total heat sum(V T) is exactly conserved
        in flux-closed domains (walls carry zero normal velocity)."""
        if self.params.numerics.temperature_advection == "semi-lagrangian":
            return super()._advected_temperature(u, u_faces, T, dt_T)
        adv_T = st.advect_scalar(self.geo, list(u_faces), T, self.T_specs,
                                 scheme=self.advection_scheme,
                                 form="flux")
        return T - dt_T * adv_T

    # ------------------------------------------------------------------
    def faces_from_velocity(self, fn) -> tuple:
        """Sample an analytic velocity (callable component index d,
        coordinate meshgrid tuple -> array) at the face-normal points —
        test/IC helper. Returns the cell-shaped face tuple."""
        geo = self.geo
        out = []
        for d in range(geo.dim):
            cs = []
            for e, a in enumerate(geo.axes):
                if e == d:
                    cs.append(a.faces[: a.n] if not a.periodic else a.faces)
                else:
                    cs.append(a.centers)
            mesh = np.meshgrid(*cs, indexing="ij")
            vals = np.asarray(fn(d, mesh), dtype=self.dtype)
            uf = jnp.asarray(np.broadcast_to(vals, geo.cell_shape))
            out.append(self._apply_wall_face_values(uf, d))
        return tuple(out)

    def state_from_faces(self, u_faces, T=None) -> State:
        """Initial state with prescribed staggered faces (cell-centered
        velocity reconstructed by averaging)."""
        sg = self.stag
        geo = self.geo
        U = sg.expand(list(u_faces))
        u = jnp.stack([sg.avg_f2c(U[c], c) for c in range(geo.dim)])
        base = self.initial_state()
        return base._replace(
            u=u, u_faces=tuple(u_faces),
            T=base.T if T is None else jnp.asarray(T, self.dtype))
