"""Semi-Lagrangian scalar transport (TPU-native, gather-free).

The unconditionally-stable transport option for the sub-cycled
temperature equation (BASELINE.md north star; the reference advances
temperature every step while solving the NSE only every interval-th
step, boussinesq_model.tpp:1867-1905 — large effective CFL is exactly
where Eulerian sub-stepping hurts).

Scheme: backward departure points in *index space* (the structured
grid makes the index map trivial: fractional displacement =
dt * u_phys / local physical spacing), then multilinear interpolation
expressed WITHOUT a gather: the interpolated value is

    f(x - s) = sum_{o in window^dim}  prod_d hat(s_d + o_d)  f[x + o]

where hat(t) = max(0, 1 - |t|) is the linear-interpolation kernel and
the window is the static range [-K, K] (K = ``ghost_width``). Each
term is a statically-shifted slice of the BC-padded array times a
pointwise weight product — (2K+1)^dim fused multiply-adds that XLA
compiles to a single VPU kernel. A `map_coordinates` gather, by
contrast, lowers to per-element dynamic addressing that runs ~100x
slower than the whole time step on TPU (measured 115 ms vs 0.95 ms at
32x128x256). The hat weights reproduce exact multilinear interpolation
because at most two consecutive offsets per axis are nonzero and they
sum to one.

Displacements are clamped to K cells per axis (monotone, never
unstable — the same role the padded-boundary clamp played in the
gather formulation). First-order departure integration + linear
interpolation: stable for any dt, O(dx^2 + dt dx) accurate, monotone
(no new extrema) — the classic trade against the TVD Eulerian path.
"""

from __future__ import annotations

import itertools
from typing import Optional, Sequence

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

    ``ghost_width`` bounds the representable displacement in cells
    (clamped per axis — monotone, never unstable). Returns the
    transported field (NOT a tendency): the caller uses it directly as
    the advected state.
    """
    dim = geo.dim
    K = int(ghost_width)
    n = geo.cell_shape
    # pad with BC ghosts, K layers per axis (wall axes first: Dirichlet
    # boundary values are shaped for the unpadded slice of later axes;
    # the periodic wrap then includes the wall ghosts)
    p = f
    for d in range(dim):
        p = pad_axis_width(p, d, specs[d], geo.axes[d].periodic, K)

    # per-axis hat-kernel weight stacks: w[d][o + K] = hat(s_d + o)
    weights = []
    one = jnp.asarray(1.0, f.dtype)
    for d in range(dim):
        h = jnp.asarray(_center_spacing(geo, d), dtype=f.dtype)
        s = jnp.clip(dt * u[d] / h, -K, K)
        weights.append([
            jnp.maximum(0.0, one - jnp.abs(s + o)) for o in range(-K, K + 1)
        ])

    out = jnp.zeros_like(f)
    for offs in itertools.product(range(2 * K + 1), repeat=dim):
        w = weights[0][offs[0]]
        for d in range(1, dim):
            w = w * weights[d][offs[d]]
        sl = tuple(slice(offs[d], offs[d] + n[d]) for d in range(dim))
        out = out + w * p[sl]
    return out
