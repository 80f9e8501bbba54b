"""Semi-Lagrangian scalar transport.

The unconditionally-stable transport option for the sub-cycled
temperature equation (BASELINE.md north star; the reference advances
temperature every step while solving the NSE only every interval-th
step, boussinesq_model.tpp:1867-1905 — large effective CFL is exactly
where Eulerian sub-stepping hurts).

Scheme: backward departure points in *index space* (the structured
grid makes the index map trivial: fractional displacement =
dt * u_phys / local physical spacing), one trilinear gather via
`jax.scipy.ndimage.map_coordinates` on a BC-padded array. First-order
departure integration + linear interpolation: stable for any dt,
O(dx^2 + dt dx) accurate, monotone (no new extrema) — the classic
trade against the TVD Eulerian path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dycoreplanet_tpu.grid.geometry import Geometry
from dycoreplanet_tpu.ops.bc import BCSpec, pad_axis_width


def _center_spacing(geo: Geometry, d: int) -> np.ndarray:
    """Physical width of each cell along axis d (cell-shaped)."""
    m = np.asarray(geo.face_dist[d])
    if not geo.axes[d].periodic and m.shape[d] == geo.axes[d].n + 1:
        sl = [slice(None)] * m.ndim
        sl[d] = slice(0, -1)
        m = m[tuple(sl)]
    return np.broadcast_to(m, geo.cell_shape)


def semi_lagrangian_transport(
    geo: Geometry,
    u: jnp.ndarray,                      # (dim, *cells) cell velocities
    f: jnp.ndarray,                      # (*cells) scalar
    specs: Sequence[Optional[BCSpec]],
    dt,
    *,
    ghost_width: int = 2,
) -> jnp.ndarray:
    """f evaluated at the backward departure points x - dt u.

    ``ghost_width`` bounds the representable displacement in cells;
    larger displacements clamp to the padded boundary (monotone, never
    unstable). Returns the transported field (NOT a tendency): the
    caller uses it directly as the advected state.
    """
    dim = geo.dim
    # pad with BC ghosts, ghost_width layers per axis (wall axes first:
    # Dirichlet boundary values are shaped for the unpadded slice of
    # later axes; the periodic wrap then includes the wall ghosts)
    p = f
    for d in range(dim):
        p = pad_axis_width(p, d, specs[d], geo.axes[d].periodic,
                           ghost_width)
    # fractional departure indices on the padded array
    coords = []
    for d in range(dim):
        h = jnp.asarray(_center_spacing(geo, d), dtype=f.dtype)
        disp = dt * u[d] / h                       # cells
        base = jnp.arange(geo.cell_shape[d], dtype=f.dtype).reshape(
            [-1 if k == d else 1 for k in range(dim)])
        idx = base - disp + ghost_width            # padded coordinates
        coords.append(jnp.broadcast_to(idx, geo.cell_shape))
    return jax.scipy.ndimage.map_coordinates(p, coords, order=1,
                                             mode="nearest")
