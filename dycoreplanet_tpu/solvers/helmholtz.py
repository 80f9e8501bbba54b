"""Direct (non-iterative) Helmholtz solvers: (M + c K) x = b.

Completes the step's "all solves direct" design: with the pressure
Poisson already exact (solvers/spectral.py), the remaining Krylov loops
in the time step are the momentum and temperature Helmholtz solves
  vol * x - c * weak_laplacian(x, specs) = b        (c = dt/Re, dt/Pe)
(reference analogue: the implicit mass+diffusion blocks solved by
preconditioned Krylov methods each step — inner CG of InverseMatrix,
inverse_matrix.hpp:93-120, and the temperature CG,
boussinesq_model.tpp:1426-1440). These operators share the pressure
operator's separable structure:

  shell   vol_ij = v_i cos_j and radial conductance a_ij = alpha_i cos_j
          (exact: sin(lat_f+dlat)-sin(lat_f) = 2 sin(dlat/2) cos(lat_c)),
          so per longitude mode the lat generalized eigentransform of
          the PRESSURE operator (identical: pole faces have zero area
          for every field, so all fields share T_lat) reduces H to
          independent radial tridiagonals  diag(v) + c (T_r^bc + lam I)
          -> batched Thomas.
  annulus per phi mode: tridiag  diag(v) + c (T_r^bc - mu_k diag(c_phi)).
  cuboid  vol is constant -> full fast diagonalization; denominators
          vol + c (D_z^bc + shift_{ky,kx}) are computed on device so a
          TRACED c (adaptive dt) never forces recompilation.

The only thing distinguishing velocity components / temperature from
pressure is the 1D radial (z) wall rule: NEUMANN walls contribute
nothing, ANTISYM/DIRICHLET walls add 2*alpha_wall to the boundary
diagonal (ghost = -interior => wall-face gradient 2 f0 / dist).
Inhomogeneous Dirichlet values are handled by the caller's affine
offset, exactly as in the CG path (models/boussinesq.py T_lap_offset).

All solvers accept component-stacked fields b: (C, *cells) with
per-component wall rules, and a scalar ``c`` that may be a traced JAX
value: every c-dependent quantity is assembled on device from
host-precomputed pieces (cheap elementwise work), so adaptive time
steps re-use the compiled program.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dycoreplanet_tpu.grid.geometry import Geometry
from dycoreplanet_tpu.ops.bc import BC, BCSpec
from dycoreplanet_tpu.ops.pallas_kernels import tridiag_solve
from dycoreplanet_tpu.solvers.spectral import (
    _conductance,
    _mu,
    _real_dft_pair,
    _uniform_radial,
    shell_lat_eigensystem,
)

# wall-rule weight on the boundary diagonal of the 1D operator
_WALL_W = {BC.NEUMANN: 0.0, BC.ANTISYM: 2.0, BC.DIRICHLET: 2.0}


def _rules_of(spec: Optional[BCSpec]) -> Tuple[float, float]:
    if spec is None:
        raise ValueError("wall axis needs a BCSpec")
    try:
        return _WALL_W[spec.lo], _WALL_W[spec.hi]
    except KeyError as e:  # pole rules etc. are not wall rules
        raise ValueError(f"unsupported radial wall rule {e}") from None


def _conductance_full(geo: Geometry, d: int) -> np.ndarray:
    """face_area/dist WITHOUT wall zeroing (walls couple to ghosts)."""
    return np.asarray(
        np.broadcast_to(
            np.asarray(geo.face_area[d], np.float64)
            / np.asarray(geo.face_dist[d], np.float64),
            geo.face_shape(d),
        )
    )


def _radial_tridiag(alpha: np.ndarray, w_lo: float, w_hi: float):
    """1D wall-aware operator pieces from face conductances alpha
    (n+1,): returns (diag (n,), lower (n,), upper (n,)) of T^bc with
    lower[0] = upper[-1] = 0 (ghost coupling folded into diag)."""
    n = alpha.shape[0] - 1
    diag = np.zeros(n)
    diag[:-1] += alpha[1:n]
    diag[1:] += alpha[1:n]
    diag[0] += w_lo * alpha[0]
    diag[-1] += w_hi * alpha[n]
    lower = np.concatenate([[0.0], -alpha[1:n]])
    upper = np.concatenate([-alpha[1:n], [0.0]])
    return diag, lower, upper


class ShellHelmholtzDirect:
    """Exact shell solve of (vol - c*weak_laplacian) x_f = b_f for a
    stack of fields with per-field radial wall rules."""

    def __init__(self, geo: Geometry, radial_specs: Sequence[BCSpec],
                 dtype=jnp.float32, use_pallas: Optional[bool] = None):
        assert geo.kind == "shell" and _uniform_radial(geo)
        self.geo = geo
        self.use_pallas = use_pallas
        nr, nlat, nlon = geo.cell_shape
        self.nm = nlon // 2 + 1
        nc = len(radial_specs)

        cosl = np.cos(np.asarray(geo.axes[1].centers, np.float64))
        j0 = int(np.argmax(cosl))
        a = _conductance_full(geo, 0)[:, :, 0]
        alpha = a[:, j0] / cosl[j0]                    # (nr+1,)
        volf = np.broadcast_to(np.asarray(geo.vol, np.float64),
                               geo.cell_shape)[:, :, 0]
        v = volf[:, j0] / cosl[j0]                     # (nr,)

        V, lam = shell_lat_eigensystem(geo)
        F, G = _real_dft_pair(nlon, np.float64)

        trd = np.zeros((nc, nr))
        low = up = None
        for cidx, spec in enumerate(radial_specs):
            w_lo, w_hi = _rules_of(spec)
            d_, l_, u_ = _radial_tridiag(alpha, w_lo, w_hi)
            trd[cidx] = d_
            low, up = l_, u_                           # field-independent

        f = lambda x: np.asarray(x, dtype=dtype)       # host constants
        self._F, self._G = f(F), f(G)
        self._V = f(V)
        # Thomas layout: (nr, C, m, s, k); see solve()
        self._v = f(v[:, None, None, None, None])
        self._trd = f(np.transpose(trd)[:, :, None, None, None])
        self._lam = f(np.transpose(lam)[None, None, :, None, :])
        self._low = f(low[:, None, None, None, None])
        self._up = f(up[:, None, None, None, None])

    def solve(self, b: jnp.ndarray, c) -> jnp.ndarray:
        """b: (C, nr, nlat, nlon); c: scalar (may be traced)."""
        nm = self.nm
        acc = jnp.promote_types(b.dtype, jnp.float32)
        hi = jax.lax.Precision.HIGHEST
        bw = b.astype(acc)
        cc = jnp.asarray(c, acc)
        bh = jnp.einsum("kl,cijl->cijk", self._F, bw, precision=hi)
        bs = jnp.stack([bh[..., :nm], bh[..., nm:]], axis=3)  # (C,i,j,s,k)
        yh = jnp.einsum("kjm,cijsk->cimsk", self._V, bs, precision=hi)
        yt = jnp.moveaxis(yh, 1, 0)                    # (nr, C, m, s, k)
        diag = self._v + cc * (self._trd + self._lam)
        xt = tridiag_solve(cc * self._low, diag, cc * self._up, yt,
                           use_pallas=self.use_pallas)
        xh = jnp.moveaxis(xt, 0, 1)                    # (C, nr, m, s, k)
        xs = jnp.einsum("kjm,cimsk->cijsk", self._V, xh, precision=hi)
        xk = jnp.concatenate([xs[:, :, :, 0, :], xs[:, :, :, 1, :]], axis=3)
        x = jnp.einsum("lk,cijk->cijl", self._G, xk, precision=hi)
        return x.astype(b.dtype)


class AnnulusHelmholtzDirect:
    """Exact annulus solve: rfft(phi) as a matmul pair + per-mode
    radial tridiagonals  diag(v) + c (T_r^bc - mu_k diag(c_phi))."""

    def __init__(self, geo: Geometry, radial_specs: Sequence[BCSpec],
                 dtype=jnp.float32, use_pallas: Optional[bool] = None):
        assert geo.kind == "annulus"
        self.geo = geo
        self.use_pallas = use_pallas
        nr, nphi = geo.cell_shape
        self.nm = nphi // 2 + 1
        nc = len(radial_specs)

        alpha = _conductance_full(geo, 0)[:, 0]        # (nr+1,)
        cphi = _conductance(geo, 1)[:, 0].astype(np.float64)  # (nr,)
        v = np.broadcast_to(np.asarray(geo.vol, np.float64),
                            geo.cell_shape)[:, 0]      # (nr,)
        mu2 = np.concatenate([_mu(nphi, rfft=True)] * 2)  # (2nm,)

        trd = np.zeros((nc, nr))
        low = up = None
        for cidx, spec in enumerate(radial_specs):
            w_lo, w_hi = _rules_of(spec)
            d_, l_, u_ = _radial_tridiag(alpha, w_lo, w_hi)
            trd[cidx] = d_
            low, up = l_, u_

        F, G = _real_dft_pair(nphi, np.float64)
        f = lambda x: np.asarray(x, dtype=dtype)
        self._F, self._G = f(F), f(G)
        # Thomas layout: (nr, C, 2nm)
        self._v = f(v[:, None, None])
        self._trd = f(np.transpose(trd)[:, :, None])
        self._shift = f(-cphi[:, None, None] * mu2[None, None, :])
        self._low = f(low[:, None, None])
        self._up = f(up[:, None, None])

    def solve(self, b: jnp.ndarray, c) -> jnp.ndarray:
        """b: (C, nr, nphi); c: scalar (may be traced)."""
        acc = jnp.promote_types(b.dtype, jnp.float32)
        hi = jax.lax.Precision.HIGHEST
        bw = b.astype(acc)
        cc = jnp.asarray(c, acc)
        bh = jnp.einsum("kp,crp->crk", self._F, bw, precision=hi)
        yt = jnp.moveaxis(bh, 1, 0)                    # (nr, C, 2nm)
        diag = self._v + cc * (self._trd + self._shift)
        xt = tridiag_solve(cc * self._low, diag, cc * self._up, yt,
                           use_pallas=self.use_pallas)
        xh = jnp.moveaxis(xt, 0, 1)
        x = jnp.einsum("pk,crk->crp", self._G, xh, precision=hi)
        return x.astype(b.dtype)


class CuboidHelmholtzDirect:
    """Exact cuboid solve by full fast diagonalization (vol constant):
    x/y real-DFT pairs + per-field z eigentransforms, denominators
    vol + c (D_z^bc + shift) built on device (c may be traced)."""

    def __init__(self, geo: Geometry, z_specs: Sequence[BCSpec],
                 dtype=jnp.float32, use_pallas: Optional[bool] = None):
        assert geo.kind == "cuboid"
        self.geo = geo
        nz, ny, nx = geo.cell_shape
        vol = np.broadcast_to(np.asarray(geo.vol, np.float64), geo.cell_shape)
        if not np.allclose(vol, vol.flat[0]):
            # non-constant cell volume breaks the fast diagonalization;
            # ValueError (not assert) so the factory can report it cleanly
            raise ValueError(
                "cuboid direct Helmholtz requires uniform cell volume")
        self._vol = float(vol.flat[0])

        alpha = _conductance_full(geo, 0)[:, 0, 0]     # (nz+1,)
        cy = float(_conductance(geo, 1)[0, 0, 0])
        cx = float(_conductance(geo, 2)[0, 0, 0])
        mu_y2 = np.concatenate([_mu(ny, rfft=True)] * 2)
        mu_x2 = np.concatenate([_mu(nx, rfft=True)] * 2)
        shift = -(cy * mu_y2[:, None] + cx * mu_x2[None, :])  # (2nmy,2nmx)

        nc = len(z_specs)
        Q = np.zeros((nc, nz, nz))
        D = np.zeros((nc, nz))
        for cidx, spec in enumerate(z_specs):
            w_lo, w_hi = _rules_of(spec)
            d_, l_, u_ = _radial_tridiag(alpha, w_lo, w_hi)
            Tz = np.diag(d_) + np.diag(l_[1:], -1) + np.diag(u_[:-1], 1)
            w, W = np.linalg.eigh(0.5 * (Tz + Tz.T))
            Q[cidx] = W
            D[cidx] = np.maximum(w, 0.0)

        Fy, Gy = _real_dft_pair(ny, np.float64)
        Fx, Gx = _real_dft_pair(nx, np.float64)
        f = lambda x: np.asarray(x, dtype=dtype)
        self._Fy, self._Gy = f(Fy), f(Gy)
        self._Fx, self._Gx = f(Fx), f(Gx)
        self._Q = f(Q)
        self._denomK = f(D[:, :, None, None] + shift[None, None])

    def solve(self, b: jnp.ndarray, c) -> jnp.ndarray:
        """b: (C, nz, ny, nx); c: scalar (may be traced)."""
        acc = jnp.promote_types(b.dtype, jnp.float32)
        hi = jax.lax.Precision.HIGHEST
        bw = b.astype(acc)
        cc = jnp.asarray(c, acc)
        h = jnp.einsum("ky,czyx->czkx", self._Fy, bw, precision=hi)
        h = jnp.einsum("kx,czyx->czyk", self._Fx, h, precision=hi)
        h = jnp.einsum("cza,czyx->cayx", self._Q, h, precision=hi)
        h = h / (self._vol + cc * self._denomK)
        h = jnp.einsum("cza,cayx->czyx", self._Q, h, precision=hi)
        h = jnp.einsum("xk,czyk->czyx", self._Gx, h, precision=hi)
        x = jnp.einsum("yk,czkx->czyx", self._Gy, h, precision=hi)
        return x.astype(b.dtype)


def make_helmholtz_solver(geo: Geometry, wall_specs: Sequence[BCSpec],
                          dtype=jnp.float32,
                          use_pallas: Optional[bool] = None):
    """Direct Helmholtz solver for a stack of fields whose axis-0
    (radial/z) wall BCSpecs are ``wall_specs``; None only when the
    geometry does not admit one (non-uniform radial shell spacing).
    Unsupported wall rules / non-uniform cell volumes raise ValueError
    with their own message rather than silently degrading to None."""
    if geo.kind == "cuboid":
        if geo.dim != 3:
            return None  # 2D slab: CG path (no direct solver yet)
        return CuboidHelmholtzDirect(geo, wall_specs, dtype=dtype)
    if geo.kind == "annulus":
        return AnnulusHelmholtzDirect(geo, wall_specs, dtype=dtype,
                                      use_pallas=use_pallas)
    if geo.kind == "shell" and _uniform_radial(geo):
        return ShellHelmholtzDirect(geo, wall_specs, dtype=dtype,
                                    use_pallas=use_pallas)
    return None
