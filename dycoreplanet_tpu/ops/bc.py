"""Boundary conditions as ghost-cell rules.

TPU-native replacement for the reference's AffineConstraints machinery
(no-slip / no-normal-flux interpolation + Dirichlet temperature,
reference: boussinesq_model.tpp:259-387): on a structured grid every
constraint becomes a ghost-layer fill, after which all stencils are
uniform dense slices — no constraint matrices, no scatter.

Supported ghost rules (one per wall end of each non-periodic axis):
  PERIODIC   wrap-around (implied by the axis, not user-set)
  NEUMANN    ghost = interior          (zero normal gradient)
  DIRICHLET  ghost = 2*value - interior (mirror through boundary value)
  ANTISYM    ghost = -interior          (zero boundary value: no-slip
             tangential velocity / zero normal velocity)
  POLE       ghost = value at the same latitude ring shifted by pi in
             longitude (proper lat-lon pole closure; requires even nlon)
  POLE_FLIP  like POLE but negated (for lat/lon vector components whose
             local basis flips across the pole)
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Optional, Union

import jax.numpy as jnp


class BC(enum.Enum):
    PERIODIC = "periodic"
    NEUMANN = "neumann"
    DIRICHLET = "dirichlet"
    ANTISYM = "antisym"
    POLE = "pole"
    POLE_FLIP = "pole_flip"


@dataclass(frozen=True)
class BCSpec:
    """BC at the (lo, hi) ends of one axis. ``value`` arrays must be
    broadcastable to the boundary slice shape."""

    lo: BC = BC.NEUMANN
    hi: BC = BC.NEUMANN
    lo_value: Union[float, jnp.ndarray] = 0.0
    hi_value: Union[float, jnp.ndarray] = 0.0


def _take(f: jnp.ndarray, d: int, idx) -> jnp.ndarray:
    sl = [slice(None)] * f.ndim
    sl[d] = idx
    return f[tuple(sl)]


def _ghost(f: jnp.ndarray, d: int, end: str, rule: BC, value, lon_axis: int) -> jnp.ndarray:
    """Build one ghost slice (thickness 1) for axis d."""
    interior = _take(f, d, slice(0, 1)) if end == "lo" else _take(f, d, slice(-1, None))
    if rule == BC.NEUMANN:
        return interior
    if rule == BC.DIRICHLET:
        return 2.0 * value - interior
    if rule == BC.ANTISYM:
        return -interior
    if rule in (BC.POLE, BC.POLE_FLIP):
        shifted = jnp.roll(interior, f.shape[lon_axis] // 2, axis=lon_axis)
        return -shifted if rule == BC.POLE_FLIP else shifted
    raise ValueError(f"ghost rule {rule} not valid for a wall axis")


def pad_axis(
    f: jnp.ndarray,
    d: int,
    spec: Optional[BCSpec],
    periodic: bool,
    lon_axis: int = -1,
) -> jnp.ndarray:
    """Return ``f`` extended by one ghost layer at each end of axis ``d``."""
    if periodic:
        lo = _take(f, d, slice(-1, None))
        hi = _take(f, d, slice(0, 1))
    else:
        assert spec is not None, "wall axis requires a BCSpec"
        lo = _ghost(f, d, "lo", spec.lo, spec.lo_value, lon_axis)
        hi = _ghost(f, d, "hi", spec.hi, spec.hi_value, lon_axis)
    return jnp.concatenate([lo, f, hi], axis=d)


def pad_axis_stacked(
    f: jnp.ndarray,
    d: int,
    specs,
    periodic: bool,
    lon_axis: int = -1,
) -> jnp.ndarray:
    """One ghost layer at each end of GRID axis ``d`` for a component-
    stacked field ``f`` of shape (ncomp, *cells) — array axis d+1.

    ``specs[c]`` is component c's BCSpec for this axis (ignored when
    periodic). The per-component ghost construction touches only thin
    edge slices; the bulk concatenation happens ONCE for the whole
    stack, so downstream stencil math runs as a single fused kernel
    over all components instead of ncomp separate pad/slice chains."""
    ax = d + 1
    if periodic:
        lo = _take(f, ax, slice(-1, None))
        hi = _take(f, ax, slice(0, 1))
    else:
        ncomp = f.shape[0]
        lo = jnp.concatenate([
            _ghost(f[c:c + 1], ax, "lo", specs[c].lo, specs[c].lo_value,
                   lon_axis)
            for c in range(ncomp)
        ], axis=0)
        hi = jnp.concatenate([
            _ghost(f[c:c + 1], ax, "hi", specs[c].hi, specs[c].hi_value,
                   lon_axis)
            for c in range(ncomp)
        ], axis=0)
    return jnp.concatenate([lo, f, hi], axis=ax)


def _ghost_k(f, d, end, rule, value, lon_axis, k):
    """Ghost slice at distance k (reflection through the wall: the
    mirror partner of ghost k is interior cell k-1)."""
    if end == "lo":
        interior = _take(f, d, slice(k - 1, k))
    else:
        interior = _take(f, d, slice(-k, -k + 1) if k > 1
                         else slice(-1, None))
    if rule == BC.NEUMANN:
        return interior
    if rule == BC.DIRICHLET:
        return 2.0 * value - interior
    if rule == BC.ANTISYM:
        return -interior
    if rule in (BC.POLE, BC.POLE_FLIP):
        shifted = jnp.roll(interior, f.shape[lon_axis] // 2, axis=lon_axis)
        return -shifted if rule == BC.POLE_FLIP else shifted
    raise ValueError(f"ghost rule {rule} not valid for a wall axis")


def pad_axis_width(
    f: jnp.ndarray,
    d: int,
    spec: Optional[BCSpec],
    periodic: bool,
    width: int,
    lon_axis: int = -1,
) -> jnp.ndarray:
    """``f`` extended by ``width`` ghost layers at each end of axis d
    (reflection-consistent for every rule; periodic wraps properly).
    Used by wide-stencil consumers (semi-Lagrangian transport)."""
    if periodic:
        lo = _take(f, d, slice(-width, None))
        hi = _take(f, d, slice(0, width))
    else:
        assert spec is not None, "wall axis requires a BCSpec"
        lo = jnp.concatenate(
            [_ghost_k(f, d, "lo", spec.lo, spec.lo_value, lon_axis, k)
             for k in range(width, 0, -1)], axis=d)
        hi = jnp.concatenate(
            [_ghost_k(f, d, "hi", spec.hi, spec.hi_value, lon_axis, k)
             for k in range(1, width + 1)], axis=d)
    return jnp.concatenate([lo, f, hi], axis=d)
