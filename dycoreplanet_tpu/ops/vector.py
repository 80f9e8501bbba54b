"""Vector-field operators in local orthonormal bases: curl, curvature
(Christoffel) corrections, and Coriolis accelerations.

Velocity components are stored in the local orthonormal frame of each
geometry: cuboid (w,v,u) = (z,y,x) Cartesian, annulus (u_r, u_phi),
shell (u_r, u_lat, u_lon). Component d is aligned with grid axis d, so
scalar stencils apply componentwise and the curvilinear corrections are
the pointwise terms implemented here.

The rotational-form operators (curl, kinetic-energy gradient) realize
the FEEC/mimetic personality: the reference's exterior-calculus model
advects with w x u + grad(|u|^2/2) where w is vorticity
(reference: boussineq_model_FEEC.tpp:786-805); on our A-grid the same
vector-invariant form uses these centered curl stencils.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from dycoreplanet_tpu.grid.geometry import Geometry
from dycoreplanet_tpu.ops.bc import BC, BCSpec
from dycoreplanet_tpu.ops.stencil import centered_gradient


def _require(kind: str, geo: Geometry) -> None:
    if geo.kind != kind:
        raise ValueError(f"operator requires {kind} geometry, got {geo.kind}")


# ----------------------------------------------------------------------
# curvature (Christoffel) terms of (u . grad) u  — added to the
# componentwise advective derivative
# ----------------------------------------------------------------------
def advection_curvature(geo: Geometry, u: jnp.ndarray) -> jnp.ndarray:
    """Extra pointwise terms of (u.grad)u in curvilinear coordinates.
    ``u``: (dim, *cells). Returns same shape; zero for the cuboid."""
    if geo.kind == "cuboid":
        return jnp.zeros_like(u)
    if geo.kind == "annulus":
        r = jnp.asarray(geo.extras["r_centers"], dtype=u.dtype)
        ur, up = u[0], u[1]
        return jnp.stack([-up * up / r, ur * up / r])
    if geo.kind == "shell":
        r = jnp.asarray(geo.extras["r_centers"], dtype=u.dtype)
        tanl = jnp.asarray(geo.extras["tan_lat"], dtype=u.dtype)
        ur, ul, up = u[0], u[1], u[2]
        return jnp.stack(
            [
                -(ul * ul + up * up) / r,
                ur * ul / r + up * up * tanl / r,
                ur * up / r - ul * up * tanl / r,
            ]
        )
    raise ValueError(geo.kind)


# ----------------------------------------------------------------------
# explicit curvature corrections of the vector Laplacian
# (the componentwise scalar Laplacian is handled implicitly by the
#  Helmholtz solve; these O(1/r^2) couplings are integrated explicitly)
# ----------------------------------------------------------------------
def vector_laplacian_curvature(
    geo: Geometry,
    u: jnp.ndarray,
    specs: Sequence[Sequence[Optional[BCSpec]]],
) -> jnp.ndarray:
    """(Delta u)_local - componentwise Delta(u_local); zero for cuboid.
    ``specs[c][d]`` is the BC of component c along axis d."""
    if geo.kind == "cuboid":
        return jnp.zeros_like(u)
    if geo.kind == "annulus":
        r = jnp.asarray(geo.extras["r_centers"], dtype=u.dtype)
        ur, up = u[0], u[1]
        dphi_up = centered_gradient(geo, up, 1, specs[1][1])  # (1/r)d/dphi via metric dist
        dphi_ur = centered_gradient(geo, ur, 1, specs[0][1])
        # centered_gradient already divides by physical distance r*dphi,
        # so dphi_* == (1/r) d(.)/dphi
        return jnp.stack(
            [
                -ur / r**2 - 2.0 / r * dphi_up,
                -up / r**2 + 2.0 / r * dphi_ur,
            ]
        )
    if geo.kind == "shell":
        r = jnp.asarray(geo.extras["r_centers"], dtype=u.dtype)
        tanl = jnp.asarray(geo.extras["tan_lat"], dtype=u.dtype)
        cosl = jnp.asarray(geo.extras["cos_lat"], dtype=u.dtype)
        ur, ul, up = u[0], u[1], u[2]
        # physical-space angular derivatives (centered_gradient divides by
        # the arc distances r dlat / r cos(lat) dlon)
        dlat_ur = centered_gradient(geo, ur, 1, specs[0][1])
        dlat_ul = centered_gradient(geo, ul, 1, specs[1][1])
        dlon_ur = centered_gradient(geo, ur, 2, specs[0][2])
        dlon_ul = centered_gradient(geo, ul, 2, specs[1][2])
        dlon_up = centered_gradient(geo, up, 2, specs[2][2])
        # (Delta u)_r     = ... - 2 u_r/r^2 - (2/r^2)[d_lat u_lat - u_lat tan(lat)
        #                   + (1/cos lat) d_lon u_lon]   (angular derivs below are
        #                   already physical: d_lat == (1/r) d/dlat etc.)
        extra_r = (
            -2.0 * ur / r**2
            - 2.0 / r * (dlat_ul - ul * tanl / r + dlon_up)
        )
        extra_lat = (
            2.0 / r * dlat_ur
            - ul / (r * cosl) ** 2
            + 2.0 * tanl / r * dlon_up
        )
        extra_lon = (
            2.0 / r * dlon_ur
            - 2.0 * tanl / r * dlon_ul
            - up / (r * cosl) ** 2
        )
        return jnp.stack([extra_r, extra_lat, extra_lon])
    raise ValueError(geo.kind)


# ----------------------------------------------------------------------
# curl (centered) — the vorticity diagnostic / rotational-form advection
# ----------------------------------------------------------------------
def curl_2d(geo: Geometry, u: jnp.ndarray,
            specs: Sequence[Sequence[Optional[BCSpec]]]) -> jnp.ndarray:
    """Scalar vorticity zeta = (1/r)[d_r(r u_phi) - d_phi u_r] (annulus)
    or dv/dx - du/dy ... for 2D geometries. Returns (*cells,)."""
    if geo.kind == "annulus":
        r = jnp.asarray(geo.extras["r_centers"], dtype=u.dtype)
        ur, up = u[0], u[1]
        # d_r(r u_phi)/r = d(r u_phi)/dr / r, via centered gradient of r*u_phi
        d_rup = centered_gradient(geo, r * up, 0, specs[1][0])
        dphi_ur = centered_gradient(geo, ur, 1, specs[0][1])  # physical (1/r) d/dphi
        return d_rup / r - dphi_ur
    raise ValueError(geo.kind)


def curl_3d(geo: Geometry, u: jnp.ndarray,
            specs: Sequence[Sequence[Optional[BCSpec]]]) -> jnp.ndarray:
    """omega = curl u in the local frame, (3, *cells)."""
    if geo.kind == "cuboid":
        w, v, uu = u[0], u[1], u[2]  # (z,y,x) components
        dz = lambda f, c: centered_gradient(geo, f, 0, specs[c][0])
        dy = lambda f, c: centered_gradient(geo, f, 1, specs[c][1])
        dx = lambda f, c: centered_gradient(geo, f, 2, specs[c][2])
        # physical right-handed curl, restacked into (z,y,x) ordering
        om_x = dy(w, 0) - dz(v, 1)
        om_y = dz(uu, 2) - dx(w, 0)
        om_z = dx(v, 1) - dy(uu, 2)
        return jnp.stack([om_z, om_y, om_x])
    if geo.kind == "shell":
        r = jnp.asarray(geo.extras["r_centers"], dtype=u.dtype)
        cosl = jnp.asarray(geo.extras["cos_lat"], dtype=u.dtype)
        ur, ul, up = u[0], u[1], u[2]
        # all centered_gradients below are physical derivatives
        # (1/r d/dlat and 1/(r cos lat) d/dlon respectively)
        d_cos_up = centered_gradient(geo, cosl * up, 1, specs[2][1])
        dlon_ul = centered_gradient(geo, ul, 2, specs[1][2])
        om_r = -d_cos_up / cosl + dlon_ul
        d_rup = centered_gradient(geo, r * up, 0, specs[2][0])
        dlon_ur = centered_gradient(geo, ur, 2, specs[0][2])
        om_lat = dlon_ur - d_rup / r
        dlat_ur = centered_gradient(geo, ur, 1, specs[0][1])
        d_rul = centered_gradient(geo, r * ul, 0, specs[1][0])
        om_lon = d_rul / r - dlat_ur
        return jnp.stack([om_r, om_lat, om_lon])
    raise ValueError(geo.kind)


def rotational_advection(
    geo: Geometry,
    u: jnp.ndarray,
    specs: Sequence[Sequence[Optional[BCSpec]]],
    ke_spec: Sequence[Optional[BCSpec]],
) -> jnp.ndarray:
    """Vector-invariant (rotational) form of (u.grad)u:
    omega x u + grad(|u|^2 / 2) — the FEEC personality's advection
    (reference: boussineq_model_FEEC.tpp:786-805). Returns (dim,*cells)."""
    ke = 0.5 * jnp.sum(u * u, axis=0)
    grad_ke = jnp.stack(
        [centered_gradient(geo, ke, d, ke_spec[d]) for d in range(geo.dim)]
    )
    if geo.dim == 2:
        zeta = curl_2d(geo, u, specs)
        # (zeta e_z) x u = zeta * (-u_phi, u_r) in (r,phi) components
        rot = jnp.stack([-zeta * u[1], zeta * u[0]])
    else:
        om = curl_3d(geo, u, specs)
        if geo.kind == "cuboid":
            # components ordered (z,y,x); cross product in right-handed
            # (x,y,z): (a x b)_x = a_y b_z - a_z b_y etc. Reorder:
            az, ay, ax = om[0], om[1], om[2]
            bz, by, bx = u[0], u[1], u[2]
            cx = ay * bz - az * by
            cy = az * bx - ax * bz
            cz = ax * by - ay * bx
            rot = jnp.stack([cz, cy, cx])
        else:  # shell: right-handed triad (e_lon, e_lat, e_r)
            ar, al, ap = om[0], om[1], om[2]
            br, bl, bp = u[0], u[1], u[2]
            # using e_lon x e_lat = e_r cyclic (geographic frame):
            # (a x b) = (a_lat b_lon - a_lon b_lat) ... derive via mapping
            # to (x,y,z) = (lon,lat,r) right-handed:
            cx = al * br - ar * bl   # lon-component
            cy = ar * bp - ap * br   # lat-component
            cz = ap * bl - al * bp   # r-component
            rot = jnp.stack([cz, cy, cx])
    return rot + grad_ke


# ----------------------------------------------------------------------
# Coriolis acceleration (added to du/dt)
# ----------------------------------------------------------------------
def coriolis_acceleration(
    geo: Geometry,
    u: jnp.ndarray,
    omega_hat: float,
    mode: str = "reference",
) -> jnp.ndarray:
    """Coriolis acceleration in the local frame.

    mode='reference' reproduces the reference exactly (SURVEY.md §7.5):
      2D:          +2 * (u_phi, -u_r)   [cross_product_2d, no Omega factor,
                    boussinesq_model.tpp:663-667]
      3D cuboid:   -2 Omega_hat e_z x u [boussinesq_model.tpp:616-621]
      3D shell:    0                    [Coriolis skipped for shell geometry]
    mode='physical' applies -2 Omega x u everywhere (documented equations,
    boussinesq_model.h:95).
    """
    if geo.dim == 2:
        if mode == "reference":
            return 2.0 * jnp.stack([u[1], -u[0]])
        # physical: -2 Omega e_z x u, e_z out of plane: e_z x (ur,uph) =
        # rotate +90 deg: (-u_phi, u_r)
        return -2.0 * omega_hat * jnp.stack([-u[1], u[0]])
    if geo.kind == "cuboid":
        # -2 Om e_z x u with components (z,y,x): e_z x u = (0, u_x, -u_y)
        # in (z,y,x) ordering: (e_z x u)_x = -u_y? cross in (x,y,z):
        # (0,0,Om) x (ux,uy,uz) = (-Om uy, Om ux, 0)
        w, v, uu = u[0], u[1], u[2]
        return -2.0 * omega_hat * jnp.stack([jnp.zeros_like(w), uu, -v])
    # shell
    if mode == "reference":
        return jnp.zeros_like(u)
    sinl = jnp.sin(jnp.asarray(geo.extras["lat_centers"], dtype=u.dtype))
    cosl = jnp.asarray(geo.extras["cos_lat"], dtype=u.dtype)
    om_r = omega_hat * sinl
    om_l = omega_hat * cosl
    ur, ul, up = u[0], u[1], u[2]
    # -2 Omega x u with Omega = om_r e_r + om_l e_lat (see docstring
    # derivation in models/boussinesq.py): components
    a_r = 2.0 * om_l * up
    a_lat = -2.0 * om_r * up
    a_lon = 2.0 * (om_r * ul - om_l * ur)
    return jnp.stack([a_r, a_lat, a_lon])
