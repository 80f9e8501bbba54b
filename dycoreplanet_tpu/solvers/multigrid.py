"""Geometric multigrid V-cycle for the weak-form Poisson operator.

TPU-native replacement for the reference's algebraic preconditioners
(ILU inner Schur preconditioner, preconditioner.h:36-42; AMG declared
for FEEC, boussineq_model_FEEC.h:299): incomplete factorizations do not
map to TPU at all (sequential triangular solves), but the structured
grid gives us *geometric* multigrid for free — each level is just the
same analytic geometry at half resolution with exact metrics, and every
smoother sweep is a fused dense stencil.

Used as a preconditioner inside CG (solvers/cg.py): one V(nu1,nu2)
cycle per iteration drops the pressure-solve iteration count by an
order of magnitude and, critically, keeps f32 CG far away from its
finite-precision divergence regime.

Components:
  * hierarchy  — cell-count halving per axis while even and > minimum,
                 rebuilt through grid.factory (exact coarse metrics);
  * smoother   — weighted Jacobi (omega=0.8) on the volume-integrated
                 (weak) residual;
  * restriction — summation over child cells (conservative aggregation,
                 the Galerkin-consistent transfer for the weak form);
  * prolongation — piecewise-constant injection (its transpose);
  * coarse solve — fixed Jacobi sweeps (grid is tiny by then).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from dycoreplanet_tpu.grid import factory
from dycoreplanet_tpu.grid.geometry import Geometry
from dycoreplanet_tpu.ops.bc import BCSpec
from dycoreplanet_tpu.ops import stencil as st
from dycoreplanet_tpu.ops.diagonal import weak_laplacian_diagonal


def _coarsen_shape(shape: Tuple[int, ...], min_cells: int = 4) -> Optional[Tuple[int, ...]]:
    """Halve every axis; None when any axis would drop below minimum or
    is odd (we only coarsen uniformly — power-of-two grids)."""
    if any(n % 2 != 0 or n // 2 < min_cells for n in shape):
        return None
    return tuple(n // 2 for n in shape)


def _rebuild(geo: Geometry, shape: Tuple[int, ...]) -> Geometry:
    lo = float(geo.axes[0].faces[0])
    hi = float(geo.axes[0].faces[-1])
    if geo.kind == "cuboid":
        L = float(geo.axes[0].faces[-1])  # domain edge (scaled)
        g = factory.make_cuboid(*shape, length_ref=1.0)
        if abs(L - 1.0) > 1e-12:
            g = factory.make_cuboid(*shape, length_ref=1.0 / L)
        return g
    if geo.kind == "annulus":
        return factory.make_annulus(shape[0], shape[1], lo, hi)
    return factory.make_shell(shape[0], shape[1], shape[2], lo, hi)


class PoissonMultigrid:
    """V-cycle preconditioner for  A x = b  with A = -weak_laplacian.

    ``specs`` must be resolution-agnostic BC rules (Neumann / pole /
    periodic — exactly the pressure BCs), so the same spec list applies
    on every level.
    """

    def __init__(
        self,
        geo: Geometry,
        specs: Sequence[Optional[BCSpec]],
        *,
        n_smooth: int = 2,
        omega: float = 0.8,
        coarse_iters: int = 40,
        min_cells: int = 4,
        dtype=jnp.float32,
    ):
        self.specs = list(specs)
        self.n_smooth = n_smooth
        self.omega = omega
        self.coarse_iters = coarse_iters
        self.geos: List[Geometry] = [geo]
        shape = geo.cell_shape
        while True:
            nxt = _coarsen_shape(shape, min_cells)
            if nxt is None:
                break
            shape = nxt
            self.geos.append(_rebuild(geo, shape))
        # host numpy: jit-closure device constants cost a device->host
        # pull each at lowering time (seconds on tunneled TPU platforms)
        self.diags = [
            (-weak_laplacian_diagonal(g, self.specs)).astype(dtype)
            for g in self.geos
        ]

    # -----------------------------------------------------------------
    def _apply(self, level: int, x: jnp.ndarray) -> jnp.ndarray:
        return -st.weak_laplacian(self.geos[level], x, self.specs)

    def _smooth(self, level: int, x: jnp.ndarray, b: jnp.ndarray, n: int) -> jnp.ndarray:
        d = self.diags[level]
        for _ in range(n):
            x = x + self.omega * (b - self._apply(level, x)) / d
        return x

    @staticmethod
    def _restrict(r: jnp.ndarray) -> jnp.ndarray:
        """Sum over 2^dim children (conservative for the weak form)."""
        dim = r.ndim
        shape = []
        for n in r.shape:
            shape += [n // 2, 2]
        rr = r.reshape(shape)
        axes = tuple(2 * d + 1 for d in range(dim))
        return rr.sum(axis=axes)

    @staticmethod
    def _prolong(x: jnp.ndarray) -> jnp.ndarray:
        """Piecewise-constant injection."""
        for d in range(x.ndim):
            x = jnp.repeat(x, 2, axis=d)
        return x

    def _vcycle(self, level: int, b: jnp.ndarray) -> jnp.ndarray:
        if level == len(self.geos) - 1:
            return self._smooth(level, jnp.zeros_like(b), b, self.coarse_iters)
        x = self._smooth(level, jnp.zeros_like(b), b, self.n_smooth)
        r = b - self._apply(level, x)
        rc = self._restrict(r)
        xc = self._vcycle(level + 1, rc)
        x = x + self._prolong(xc)
        x = self._smooth(level, x, b, self.n_smooth)
        return x

    # -----------------------------------------------------------------
    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        """Preconditioner application M^{-1} r (one V-cycle)."""
        return self._vcycle(0, r)
