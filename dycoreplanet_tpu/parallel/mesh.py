"""Device mesh + sharding specs: SPMD domain decomposition.

TPU-native replacement for the reference's MPI/p4est parallelism
(reference: parallel::distributed::Triangulation partitioning,
planet_geometry.tpp:17-20; IndexSet row ownership,
boussinesq_model.tpp:240-252): prognostic arrays are sharded over a
`jax.sharding.Mesh` of devices along the horizontal grid axes, and
XLA's GSPMD partitioner inserts the halo exchanges (collective-permute
over ICI) for every stencil plus the psum reductions inside CG dots —
the same communication pattern SURVEY.md §5 documents for the
reference (neighbor exchange at stencils, Allreduce at Krylov dots).

Sharding layout per geometry (cell arrays indexed [vertical, horiz...]):
  cuboid  (z, y, x): shard (y, x)   — vertical column stays on-device
  annulus (r, phi):  shard (phi,)
  shell   (r, lat, lon): shard (lat, lon)
The wall/radial axis is never sharded: Helmholtz/Poisson vertical
coupling and wall BCs stay local, halos ride only the horizontal
stencils (width 1).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dycoreplanet_tpu.grid.geometry import Geometry


def _factor2(n: int) -> Tuple[int, int]:
    """Split n into the most-square (a, b) with a*b = n."""
    best = (1, n)
    for a in range(1, int(math.isqrt(n)) + 1):
        if n % a == 0:
            best = (a, n // a)
    return best


def build_mesh(
    geo: Geometry,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a device mesh shaped for the geometry's horizontal axes."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if geo.kind == "annulus":
        return Mesh(np.asarray(devices).reshape(n), ("phi",))
    if geo.kind == "cuboid" and geo.dim == 2:
        return Mesh(np.asarray(devices).reshape(n), ("x",))
    a, b = _factor2(n)
    names = ("y", "x") if geo.kind == "cuboid" else ("lat", "lon")
    return Mesh(np.asarray(devices).reshape(a, b), names)


def mesh_shape_for(geo: Geometry, n_devices: Optional[int] = None) -> Tuple[int, ...]:
    """Shard counts per cell-array axis for the canonical layout
    (vertical axis unsharded) — e.g. for mesh partition visualization."""
    n = n_devices if n_devices is not None else len(jax.devices())
    if geo.kind == "annulus" or (geo.kind == "cuboid" and geo.dim == 2):
        return (1, n)
    a, b = _factor2(n)
    return (1, a, b)


def cell_pspec(geo: Geometry, mesh: Mesh) -> P:
    """PartitionSpec for a cell-centered array."""
    if geo.kind == "annulus":
        return P(None, "phi")
    if geo.kind == "cuboid" and geo.dim == 2:
        return P(None, "x")
    if geo.kind == "cuboid":
        return P(None, "y", "x")
    return P(None, "lat", "lon")


def state_sharding(geo: Geometry, mesh: Mesh):
    """NamedShardings for every leaf of a models.boussinesq.State."""
    cspec = cell_pspec(geo, mesh)
    cell = NamedSharding(mesh, cspec)
    vec = NamedSharding(mesh, P(None, *cspec))  # leading component dim
    scalar = NamedSharding(mesh, P())
    # u_faces are cell-shaped (left-face convention) so every array
    # shares the same partitioning
    faces = tuple(cell for _ in range(geo.dim))
    from dycoreplanet_tpu.models.boussinesq import State

    return State(u=vec, u_faces=faces, p=cell, T=cell, time=scalar,
                 step_number=scalar)


def shard_state(state, geo: Geometry, mesh: Mesh):
    """Place a State's arrays onto the mesh with the canonical layout."""
    sh = state_sharding(geo, mesh)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), state, sh)
