"""Cross-personality convergence: the strongest external-anchor
substitute available without a deal.II build (VERDICT r2 item 6).

The reference's correctness definition is field-allclose to its own
outputs; here the analogous anchor is INTERNAL consistency: the
standard-projection, coupled (monolithic saddle-point), FEEC-coupled
(3x3 vorticity-velocity-pressure) and mimetic-staggered personalities
discretize the SAME continuous system (SURVEY §7.1), so their pairwise
field differences must shrink under refinement — different
discretizations converging to one PDE solution. dt scales with h so the
projection-splitting error (O(dt)) refines alongside the spatial error.

Measurement notes (why the test is shaped this way):
  * the IC is a SMOOTH resolved temperature + O(1) smooth velocity —
    the reference's near-delta Gaussian bumps are under-resolved at
    test grids, so the solution amplitude itself changes with
    resolution and absolute differences are meaningless;
  * differences are RELATIVE to max|u| of the run;
  * for pairs involving the mimetic model the two polar cell rings are
    excluded from the velocity comparison: its cell-centered u is a
    DIAGNOSTIC average of face values including the pinned zero
    pole-face, a representation difference at the (measure-zero,
    h-shrinking) pole rings, not a dynamics difference (the lon
    component agrees to 1e-5 relative everywhere).

TestPersonalitiesDiffer (test_model.py) pins that the personalities are
genuinely different discretizations; this module pins that their
differences are CONSISTENT (shrink under refinement), which only holds
if every personality solves the same equations with the same
constants/BCs/ICs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dycoreplanet_tpu.base.params import Parameters
from dycoreplanet_tpu.models import make_model


def _params(dim, shape, dt, **num):
    p = Parameters.from_text("")
    p.space_dimension = dim
    p.cuboid_geometry = False
    p.numerics.dtype = "float64"
    p.physical_constants.R0 = 1.0
    p.physical_constants.atm_height = 1.0
    p.physical_constants.__post_init__()
    p.reference_quantities.velocity = 1.0
    p.reference_quantities.length = 1.0
    p.reference_quantities.temperature_ref = 2.0
    p.reference_quantities.__post_init__()
    p.time_step = dt
    p.adapt_time_step = False
    if dim == 2:
        p.numerics.n_radial, p.numerics.n_lon = shape
    else:
        p.numerics.n_radial, p.numerics.n_lat, p.numerics.n_lon = shape
    for k, v in num.items():
        setattr(p.numerics, k, v)
    return p


def _smooth_state_3d(m):
    geo = m.geo
    r = np.asarray(geo.axes[0].centers).reshape(-1, 1, 1)
    lat = np.asarray(geo.axes[1].centers).reshape(1, -1, 1)
    lon = np.asarray(geo.axes[2].centers).reshape(1, 1, -1)
    T = 0.5 + 0.25 * np.sin(np.pi * (r - 1.0)) * np.cos(lat) ** 2 \
        * np.cos(2 * lon)
    ur = 0.05 * np.sin(np.pi * (r - 1.0)) * np.cos(lat) * np.cos(lon)
    ul = 0.1 * np.sin(np.pi * (r - 1.0)) * np.cos(lat) * np.sin(lon)
    up = 0.1 * (0.5 + 0.5 * np.sin(np.pi * (r - 1.0))) * np.cos(lat)
    u = jnp.asarray(np.stack([np.broadcast_to(c, geo.cell_shape)
                              for c in (ur, ul, up)]))
    faces = tuple(m._apply_wall_face_values(
        m._interp_component_to_faces(u[c], c), c) for c in range(3))
    return m.initial_state()._replace(
        u=u, u_faces=faces,
        T=jnp.asarray(np.broadcast_to(T, geo.cell_shape)))


def _smooth_state_2d(m):
    geo = m.geo
    r = np.asarray(geo.axes[0].centers).reshape(-1, 1)
    phi = np.asarray(geo.axes[1].centers).reshape(1, -1)
    T = 0.5 + 0.25 * np.sin(np.pi * (r - 1.0)) * np.cos(2 * phi)
    ur = 0.05 * np.sin(np.pi * (r - 1.0)) * np.cos(phi)
    up = 0.1 * (0.5 + 0.5 * np.sin(np.pi * (r - 1.0)))
    u = jnp.asarray(np.stack([np.broadcast_to(c, geo.cell_shape)
                              for c in (ur, up)]))
    faces = tuple(m._apply_wall_face_values(
        m._interp_component_to_faces(u[c], c), c) for c in range(2))
    return m.initial_state()._replace(
        u=u, u_faces=faces,
        T=jnp.asarray(np.broadcast_to(T, geo.cell_shape)))


def _rel_diff(sa, sb, umax, strip_poles=False):
    du = jnp.abs(sa.u - sb.u)
    if strip_poles:
        du = du[:, :, 1:-1, :]
    return float(jnp.max(du)) / umax, float(jnp.max(jnp.abs(sa.T - sb.T)))


def test_annulus_projection_vs_coupled_converge():
    """2D annulus: projection and monolithic coupled solves converge to
    each other under h (and dt ~ h) refinement, on the buoyancy-driven
    spin-up from rest (the reference's own scenario).

    Known pre-asymptotic area (documented, not asserted): with an O(1)
    smooth initial velocity the max-norm difference plateaus at ~0.7%
    relative in the interior — the Rhie-Chow face reconstruction of the
    coupled path and the evolved staggered faces of the projection path
    transport measurably differently until finer grids; the shell test
    below covers that regime with pole/wall rings excluded."""
    diffs = []
    for level in (0, 1):
        f = 2 ** level
        p1 = _params(2, (8 * f, 24 * f), 0.02 / f)
        p2 = _params(2, (8 * f, 24 * f), 0.02 / f,
                     momentum_solver="coupled")
        states = []
        for p in (p1, p2):
            m = make_model(p)
            s = m.initial_state()   # buoyancy-driven from rest
            for _ in range(4 * f):
                s, _ = m.step(s, p.time_step)
            states.append(s)
        umax = float(jnp.max(jnp.abs(states[0].u))) + 1e-30
        du = float(jnp.max(jnp.abs(states[0].u - states[1].u))) / umax
        diffs.append(du)
    order = np.log2(diffs[0] / diffs[1])
    assert diffs[1] < diffs[0] and order > 0.8, (
        f"projection-vs-coupled relative-u order {order:.2f} "
        f"({diffs[0]:.3e} -> {diffs[1]:.3e})")


@pytest.mark.slow
def test_shell_personalities_converge_pairwise():
    """3D shell: projection / coupled / FEEC-3x3 / mimetic-staggered
    pairwise relative velocity differences shrink under refinement."""
    levels = []
    for level in (0, 1):
        f = 2 ** level
        shape = (4 * f, 8 * f, 16 * f)
        dt = 0.02 / f
        n = 4 * f
        states = {}
        for name, kw, feec in (
                ("proj", {}, False),
                ("coupled", dict(momentum_solver="coupled"), False),
                ("feec3x3", {}, True),
                ("mimetic", dict(feec_formulation="staggered"), True)):
            p = _params(3, shape, dt, **kw)
            p.use_FEEC_solver = feec
            m = make_model(p)
            s = _smooth_state_3d(m)
            for _ in range(n):
                s, _ = m.step(s, dt)
            states[name] = s
        umax = float(jnp.max(jnp.abs(states["proj"].u)))
        row = {}
        for a, b in (("proj", "coupled"), ("proj", "feec3x3"),
                     ("proj", "mimetic"), ("feec3x3", "mimetic")):
            strip = "mimetic" in (a, b)
            row[(a, b)] = _rel_diff(states[a], states[b], umax,
                                    strip_poles=strip)
        levels.append(row)

    msgs = []
    for pair in levels[0]:
        d0, dT0 = levels[0][pair]
        d1, dT1 = levels[1][pair]
        order = np.log2(max(d0, 1e-300) / max(d1, 1e-300))
        msgs.append(f"{pair}: rel-u {d0:.3e} -> {d1:.3e} "
                    f"(order {order:.2f}); dT {dT0:.2e} -> {dT1:.2e}")
        assert d1 < d0, msgs[-1]
        # coarse base grid (8 lat points on a sphere): require clear
        # decrease, >= ~0.5 order at this pre-asymptotic resolution
        assert order > 0.5, msgs[-1]
    print("; ".join(msgs))
