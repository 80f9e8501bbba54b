"""Explicit halo exchange over the device mesh.

The TPU-native equivalent of the reference's ghost ("locally relevant")
dof replication and `compress()` neighbor exchange (reference:
DoFTools::extract_locally_relevant_dofs, boussinesq_model.tpp:244-251;
Trilinos import/export inside compress, tpp:736-737): each shard owns a
block of the structured grid and fetches width-k ghost layers from its
ring neighbors with `jax.lax.ppermute` over ICI.

Two ways to run stencils on a sharded grid:
  1. GSPMD (default in this framework): `NamedSharding` on the arrays
     and XLA inserts the collective-permutes automatically — this is
     what the model's jitted step uses.
  2. Explicit `shard_map` + these primitives — manual control of the
     communication schedule, e.g. to issue halo pulls ahead of interior
     compute (communication/computation overlap) or to fuse the
     exchange into Pallas kernels later.
Both produce identical numerics (tests/test_halo.py pins 1-vs-8-device
equality); the primitives exist so the hot path can graduate from (1)
to (2) where the compiler's schedule is not optimal.

All functions here must be called INSIDE `shard_map` (they use
collective axis names).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def ring_perms(n: int, periodic: bool) -> Tuple[list, list]:
    """Source->dest pairs for the forward (i -> i+1) and backward
    (i -> i-1) ring shifts along a mesh axis of size n."""
    if periodic:
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [((i + 1) % n, i) for i in range(n)]
    else:
        fwd = [(i, i + 1) for i in range(n - 1)]
        bwd = [(i + 1, i) for i in range(n - 1)]
    return fwd, bwd


def exchange_ghosts(
    x: jnp.ndarray,
    axis_name: str,
    array_axis: int,
    *,
    width: int = 1,
    periodic: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fetch (lo_ghost, hi_ghost) layers of ``width`` cells from the
    ring neighbors along ``axis_name``.

    lo_ghost holds the neighbor-on-the-left's top edge (what belongs
    just below this shard's first row), hi_ghost the
    neighbor-on-the-right's bottom edge. On non-periodic boundary
    shards the missing neighbor contributes zeros (ppermute semantics);
    physical BC ghost rules are applied by the caller on top.
    """
    n = lax.psum(1, axis_name)
    fwd, bwd = ring_perms(n, periodic)
    sz = x.shape[array_axis]
    hi_edge = lax.slice_in_dim(x, sz - width, sz, axis=array_axis)
    lo_edge = lax.slice_in_dim(x, 0, width, axis=array_axis)
    # my hi edge travels forward to become my right-neighbor's lo ghost
    lo_ghost = lax.ppermute(hi_edge, axis_name, fwd)
    hi_ghost = lax.ppermute(lo_edge, axis_name, bwd)
    return lo_ghost, hi_ghost


def halo_pad(
    x: jnp.ndarray,
    axis_name: str,
    array_axis: int,
    *,
    width: int = 1,
    periodic: bool = True,
) -> jnp.ndarray:
    """Concatenate ghost layers onto both ends of ``array_axis``:
    returns an array ``2*width`` cells longer, ready for an interior
    stencil sweep (the shard + halo = the reference's "locally
    relevant" index set)."""
    lo_ghost, hi_ghost = exchange_ghosts(
        x, axis_name, array_axis, width=width, periodic=periodic)
    return jnp.concatenate([lo_ghost, x, hi_ghost], axis=array_axis)


def shard_interior_then_halo(
    x: jnp.ndarray,
    axis_name: str,
    array_axis: int,
    interior_fn,
    boundary_fn,
    *,
    width: int = 1,
    periodic: bool = True,
) -> jnp.ndarray:
    """Overlap pattern: issue the ghost ppermutes FIRST, run
    ``interior_fn(x)`` (no halo dependence) while the permutes are in
    flight, then run ``boundary_fn(padded)`` which consumes the halo.
    XLA schedules the independent interior work concurrently with the
    collective-permute, hiding halo latency behind interior compute
    (SURVEY.md section 5: overlap ppermute with interior stencils)."""
    lo_ghost, hi_ghost = exchange_ghosts(
        x, axis_name, array_axis, width=width, periodic=periodic)
    interior = interior_fn(x)
    padded = jnp.concatenate([lo_ghost, x, hi_ghost], axis=array_axis)
    return interior + boundary_fn(padded)
