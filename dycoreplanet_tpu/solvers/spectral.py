"""Spectral-direct and spectral-preconditioned Poisson solvers.

The TPU speed-of-light replacement for the reference's Schur-complement
pressure onion (reference: solve_NSE_Schur_complement,
boussinesq_model.tpp:1248-1414 — nested GMRES/CG/ILU per time step):
every geometry here has at least one translation-invariant periodic
axis along whose modes the weak Laplacian block-diagonalizes EXACTLY
(the metric coefficients never depend on the periodic coordinates):

  cuboid  (z, y, x):  rfft2 over (y, x) -> independent tridiagonal
                      systems in z  -> DIRECT solve (batched Thomas)
  annulus (r, phi):   rfft over phi -> independent tridiagonal systems
                      in r          -> DIRECT solve
  shell   (r, lat, lon): rfft over lon -> independent 2D (r, lat)
                      systems per mode; the pole-adjacent longitude
                      stiffness (the 1/cos(lat) blowup that defeats
                      point-smoothers) becomes a harmless DIAGONAL
                      shift. Solved by batched CG over all modes with
                      an exact radial line preconditioner (batched
                      Thomas) — iterations are set by the benign 2D
                      (r, lat) conditioning, not the 3D polar one.

All solvers operate on the volume-integrated ("weak") form:
    solve  -weak_laplacian(x) = b,   sum(b) = 0 (compatibility).
The constant nullspace of the pure-Neumann problem is pinned by a
rank-one modification of the zero mode (adds the particular solution
with x[0] = 0 — exact, see _pin note), callers re-normalize the mean.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dycoreplanet_tpu.grid.geometry import Geometry
from dycoreplanet_tpu.ops.pallas_kernels import tridiag_solve
from dycoreplanet_tpu.solvers.cg import cg


def _conductance(geo: Geometry, d: int) -> np.ndarray:
    """A/dist at the full faces of axis d (wall faces zeroed — Neumann:
    no flux through walls enters the pressure operator)."""
    c = np.broadcast_to(
        np.asarray(geo.face_area[d]) / np.asarray(geo.face_dist[d]),
        geo.face_shape(d),
    ).copy()
    if not geo.axes[d].periodic:
        first = [slice(None)] * geo.dim
        first[d] = slice(0, 1)
        last = [slice(None)] * geo.dim
        last[d] = slice(-1, None)
        c[tuple(first)] = 0.0
        c[tuple(last)] = 0.0
    return c


def _mu(n: int, rfft: bool) -> np.ndarray:
    """Eigenvalues of the periodic [1, -2, 1] stencil: -4 sin^2(pi k/n)."""
    k = np.arange(n // 2 + 1 if rfft else n)
    return -4.0 * np.sin(np.pi * k / n) ** 2


class CuboidPoissonDirect:
    """Exact solve via rfft2 over (y, x) + batched Thomas in z."""

    def __init__(self, geo: Geometry, dtype=jnp.float32,
                 use_pallas: Optional[bool] = None):
        assert geo.kind == "cuboid"
        self.geo = geo
        self.use_pallas = use_pallas
        nz, ny, nx = geo.cell_shape
        az = _conductance(geo, 0)[:, 0, 0]          # (nz+1,)
        cy = float(_conductance(geo, 1)[0, 0, 0])
        cx = float(_conductance(geo, 2)[0, 0, 0])
        mu_y = _mu(ny, rfft=False)                   # (ny,)
        mu_x = _mu(nx, rfft=True)                    # (nx//2+1,)
        shift = -(cy * mu_y[:, None] + cx * mu_x[None, :])  # (ny, nxh) >= 0
        diag = (az[:-1] + az[1:])[:, None, None] + shift[None]  # (nz, ny, nxh)
        # pin the (0,0) mode's first cell (nullspace ground, see module doc)
        diag = diag.copy()
        diag[0, 0, 0] += az[1] if nz > 1 else 1.0
        lower = np.broadcast_to(-az[:-1, None, None], diag.shape).copy()
        upper = np.broadcast_to(-az[1:, None, None], diag.shape).copy()
        # constants stay host-side numpy: closure device arrays would
        # need a device->host pull at jit-lowering time (seconds on
        # tunneled TPU platforms); numpy embeds free
        f = lambda a: np.asarray(a, dtype=dtype)
        self._lower, self._diag, self._upper = f(lower), f(diag), f(upper)

    def __call__(self, b: jnp.ndarray) -> jnp.ndarray:
        return self.solve(b)[0]

    def solve(self, b: jnp.ndarray):
        # FFTs require >= f32; under bfloat16 state the pressure solve
        # runs in f32 and casts back (standard mixed precision)
        bw = b.astype(jnp.promote_types(b.dtype, jnp.float32))
        bh = jnp.fft.rfft2(bw, axes=(1, 2))
        xr = tridiag_solve(self._lower, self._diag, self._upper, bh.real,
                           use_pallas=self.use_pallas)
        xi = tridiag_solve(self._lower, self._diag, self._upper, bh.imag,
                           use_pallas=self.use_pallas)
        xh = xr + 1j * xi
        x = jnp.fft.irfft2(xh, s=b.shape[1:], axes=(1, 2))
        return x.astype(b.dtype), jnp.asarray(0, jnp.int32)


def shell_lat_eigensystem(geo: Geometry):
    """(V, lam): per-lon-mode generalized lat eigentransforms
    S_k V = diag(cos) V Lambda, V^T diag(cos) V = I — shared by EVERY
    field's weak Laplacian on the shell (pole faces have zero area, so
    the lat/lon part is field-independent). Cached on the geometry
    object so the pressure and Helmholtz solvers pay for one host
    eigendecomposition. f64 numpy, shapes (nm, nlat, nlat), (nm, nlat)."""
    cached = geo.extras.get("_lat_eigensystem")
    if cached is not None:
        return cached
    nr, nlat, nlon = geo.cell_shape
    nm = nlon // 2 + 1
    b = _conductance(geo, 1)[:, :, 0].astype(np.float64)
    c = _conductance(geo, 2)[:, :, 0].astype(np.float64)
    cosl = np.cos(np.asarray(geo.axes[1].centers, np.float64))
    bl = b[0]                                   # (nlat+1,) pole-zeroed
    gl = c[0]                                   # (nlat,)
    mu = _mu(nlon, rfft=True)

    T = np.zeros((nlat, nlat))
    for j in range(nlat):
        T[j, j] = bl[j] + bl[j + 1]
        if j > 0:
            T[j, j - 1] = -bl[j]
        if j < nlat - 1:
            T[j, j + 1] = -bl[j + 1]
    Ms = 1.0 / np.sqrt(cosl)
    lam = np.zeros((nm, nlat))
    V = np.zeros((nm, nlat, nlat))
    for k in range(nm):
        Sh = Ms[:, None] * (T + np.diag(-gl * mu[k])) * Ms[None, :]
        w, W = np.linalg.eigh(0.5 * (Sh + Sh.T))
        lam[k] = w
        V[k] = Ms[:, None] * W                 # V^T diag(cos) V = I
    lam = np.maximum(lam, 0.0)
    geo.extras["_lat_eigensystem"] = (V, lam)
    return V, lam


def _real_dft_pair(n: int, dtype) -> Tuple[np.ndarray, np.ndarray]:
    """(F, G): forward real-DFT matmul matrix (rows = Re then -Im of the
    rfft) and its f64 pseudo-inverse — an exact roundtrip pair."""
    nm = n // 2 + 1
    ll = np.arange(n)
    kk = np.arange(nm)
    ang = 2.0 * np.pi * kk[:, None] * ll[None, :] / n
    F = np.concatenate([np.cos(ang), -np.sin(ang)], axis=0)
    G = np.linalg.pinv(F, rcond=1e-12)
    return F.astype(dtype), G.astype(dtype)


class CuboidPoissonFastDiag:
    """EXACT cuboid solve by full fast diagonalization — pure MXU work.

    Supersedes CuboidPoissonDirect's rfft2 + batched-Thomas pipeline
    with dense transforms (see ShellPoissonFastDiag for the rationale —
    FFTs and sequential tridiagonal recurrences are the two things the
    TPU is worst at; (n x n) matmuls at n <= a few hundred are free):

      x:   real DFT matmul pair (exact pseudo-inverse roundtrip)
      y:   full DFT handled as TWO real transforms — since the operator
           depends on the y mode only through mu_k = -4 sin^2(pi k/n),
           which is identical for modes k and n-k, the y transform can
           use the same real cos/sin row basis as an rfft: the basis
           diagonalizes the periodic [1,-2,1] stencil and the pair
           (F_y, pinv(F_y)) is an exact roundtrip
      z:   the symmetric wall tridiagonal T_z = Q D Q^T (host eig)

    leaving a pointwise multiply by the host-precomputed pseudo-inverse
    of (D_a + shift_{ky,kx}) — the global Neumann nullspace's zero
    denominator is zeroed, callers re-normalize the mean.
    """

    def __init__(self, geo: Geometry, dtype=jnp.float32,
                 use_pallas: Optional[bool] = None):
        assert geo.kind == "cuboid"
        self.geo = geo
        nz, ny, nx = geo.cell_shape
        cy = float(_conductance(geo, 1)[0, 0, 0])
        cx = float(_conductance(geo, 2)[0, 0, 0])
        mu_y = _mu(ny, rfft=True)                    # (ny//2+1,)
        mu_x = _mu(nx, rfft=True)                    # (nx//2+1,)
        self.nmy = ny // 2 + 1
        self.nmx = nx // 2 + 1

        if geo.axes[0].periodic:
            # fully periodic validation domain: z diagonalizes in the
            # same real-DFT basis as y/x (eigenvalues cz * mu)
            cz = float(_conductance(geo, 0)[0, 0, 0])
            mu_z2 = np.concatenate([_mu(nz, rfft=True)] * 2)
            D = -cz * mu_z2                          # (2nmz,)
            Fz, Gz = _real_dft_pair(nz, np.float64)
            Q = None
        else:
            az = _conductance(geo, 0)[:, 0, 0].astype(np.float64)  # (nz+1,)
            Tz = (np.diag(az[:-1] + az[1:])
                  - np.diag(az[1:-1], 1) - np.diag(az[1:-1], -1))
            D, Q = np.linalg.eigh(0.5 * (Tz + Tz.T))
            Fz = Gz = None

        # mode shifts: stack re/im per axis (weights repeat)
        mu_y2 = np.concatenate([mu_y, mu_y])         # (2nmy,)
        mu_x2 = np.concatenate([mu_x, mu_x])         # (2nmx,)
        shift = -(cy * mu_y2[:, None] + cx * mu_x2[None, :])
        denom = D[:, None, None] + shift[None]       # (nz, 2nmy, 2nmx)
        tiny = 1e-10 * float(denom.max())
        inv_denom = np.where(denom > tiny, 1.0 / np.maximum(denom, tiny), 0.0)

        Fy, Gy = _real_dft_pair(ny, np.float64)
        Fx, Gx = _real_dft_pair(nx, np.float64)
        f = lambda a: np.asarray(a, dtype=dtype)     # host constants
        self._Fy, self._Gy = f(Fy), f(Gy)
        self._Fx, self._Gx = f(Fx), f(Gx)
        self._Q = f(Q) if Q is not None else None
        self._Fz = f(Fz) if Fz is not None else None
        self._Gz = f(Gz) if Gz is not None else None
        self._inv_denom = f(inv_denom)

    def __call__(self, b: jnp.ndarray) -> jnp.ndarray:
        return self.solve(b)[0]

    def solve(self, b: jnp.ndarray):
        acc = jnp.promote_types(b.dtype, jnp.float32)
        hi = jax.lax.Precision.HIGHEST
        bw = b.astype(acc)
        # NOTE: treating y and x as independent REAL transforms is exact
        # here because the operator's mode dependence (mu) is even in k:
        # the cos/sin rows are eigenvectors of the periodic [1,-2,1]
        # stencil, so the mixed-axis cross terms stay diagonal.
        h = jnp.einsum("ky,zyx->zkx", self._Fy, bw, precision=hi)
        h = jnp.einsum("kx,zyx->zyk", self._Fx, h, precision=hi)
        if self._Q is not None:
            h = jnp.einsum("za,zyx->ayx", self._Q, h, precision=hi)
            h = h * self._inv_denom
            h = jnp.einsum("za,ayx->zyx", self._Q, h, precision=hi)
        else:  # fully periodic z: real-DFT pair instead of eigenbasis
            h = jnp.einsum("az,zyx->ayx", self._Fz, h, precision=hi)
            h = h * self._inv_denom
            h = jnp.einsum("za,ayx->zyx", self._Gz, h, precision=hi)
        h = jnp.einsum("xk,zyk->zyx", self._Gx, h, precision=hi)
        x = jnp.einsum("yk,zkx->zyx", self._Gy, h, precision=hi)
        return x.astype(b.dtype), jnp.asarray(0, jnp.int32)


class AnnulusPoissonDirect:
    """Exact solve via rfft over phi + batched Thomas in r."""

    def __init__(self, geo: Geometry, dtype=jnp.float32,
                 use_pallas: Optional[bool] = None):
        assert geo.kind == "annulus"
        self.geo = geo
        self.use_pallas = use_pallas
        nr, nphi = geo.cell_shape
        ar = _conductance(geo, 0)[:, 0]              # (nr+1,)
        cphi = _conductance(geo, 1)[:, 0]            # (nr,) = dr/(r dphi)
        mu = _mu(nphi, rfft=True)                    # (nphi//2+1,)
        diag = (ar[:-1] + ar[1:])[:, None] - cphi[:, None] * mu[None, :]
        diag = diag.copy()
        diag[0, 0] += ar[1] if nr > 1 else 1.0       # pin k=0 mode
        lower = np.broadcast_to(-ar[:-1, None], diag.shape).copy()
        upper = np.broadcast_to(-ar[1:, None], diag.shape).copy()
        # constants stay host-side numpy: closure device arrays would
        # need a device->host pull at jit-lowering time (seconds on
        # tunneled TPU platforms); numpy embeds free
        f = lambda a: np.asarray(a, dtype=dtype)
        self._lower, self._diag, self._upper = f(lower), f(diag), f(upper)

    def __call__(self, b: jnp.ndarray) -> jnp.ndarray:
        return self.solve(b)[0]

    def solve(self, b: jnp.ndarray):
        bw = b.astype(jnp.promote_types(b.dtype, jnp.float32))
        bh = jnp.fft.rfft(bw, axis=1)
        xr = tridiag_solve(self._lower, self._diag, self._upper, bh.real,
                           use_pallas=self.use_pallas)
        xi = tridiag_solve(self._lower, self._diag, self._upper, bh.imag,
                           use_pallas=self.use_pallas)
        x = jnp.fft.irfft(xr + 1j * xi, n=b.shape[1], axis=1)
        return x.astype(b.dtype), jnp.asarray(0, jnp.int32)


class AnnulusPoissonFastDiag:
    """EXACT annulus solve by fast diagonalization — pure MXU work.

    Unlike the cuboid/shell, the annulus radial operator depends on the
    phi mode: A_k = T_r - mu_k diag(c_phi) with c_phi(r) = dr/(r dphi).
    The generalized symmetric eigenproblem T_r W = diag(c_phi) W Lambda
    (W^T diag(c_phi) W = I, computed once on the host in f64 via the
    C^{-1/2} similarity) gives A_k^{-1} = W (Lambda - mu_k)^{-1} W^T for
    EVERY mode simultaneously — one (nr x nr) matmul pair around a
    pointwise multiply by the precomputed pseudo-inverse of
    (Lambda_a - mu_k), replacing the rfft + batched Thomas.
    """

    def __init__(self, geo: Geometry, dtype=jnp.float32,
                 use_pallas: Optional[bool] = None):
        assert geo.kind == "annulus"
        self.geo = geo
        nr, nphi = geo.cell_shape
        ar = _conductance(geo, 0)[:, 0].astype(np.float64)    # (nr+1,)
        cphi = _conductance(geo, 1)[:, 0].astype(np.float64)  # (nr,)
        mu = _mu(nphi, rfft=True)                             # (nm,) <= 0
        mu2 = np.concatenate([mu, mu])                        # re+im stack

        Tr = (np.diag(ar[:-1] + ar[1:])
              - np.diag(ar[1:-1], 1) - np.diag(ar[1:-1], -1))
        Ms = 1.0 / np.sqrt(cphi)
        S = Ms[:, None] * Tr * Ms[None, :]
        lam, U = np.linalg.eigh(0.5 * (S + S.T))
        W = Ms[:, None] * U                                   # W^T C W = I
        lam = np.maximum(lam, 0.0)

        denom = lam[:, None] - mu2[None, :]                   # (nr, 2nm)
        tiny = 1e-10 * float(denom.max())
        inv_denom = np.where(denom > tiny, 1.0 / np.maximum(denom, tiny), 0.0)

        F, G = _real_dft_pair(nphi, np.float64)
        f = lambda a: np.asarray(a, dtype=dtype)              # host constants
        self._F, self._G = f(F), f(G)
        self._W = f(W)
        self._inv_denom = f(inv_denom)
        # residual amplification bound for the model's Poisson spot-
        # check (models/boussinesq._project_velocity): the generalized
        # eigentransforms at production annulus aspect (64 x 2048)
        # leave a measured ~4e-4 relative residual in f32 on random
        # rhs (~3.5e3 eps — working-precision conditioning, not a
        # solver defect) and up to ~2e-2 on violent low-mode
        # transients; 1e6 eps (0.12 in f32, 2e-10 in f64) is the
        # tripwire level that stays an order below an actually
        # corrupted solve (relative residual O(0.3-1)).
        self.check_amp = 1e6

    def __call__(self, b: jnp.ndarray) -> jnp.ndarray:
        return self.solve(b)[0]

    def solve(self, b: jnp.ndarray):
        acc = jnp.promote_types(b.dtype, jnp.float32)
        hi = jax.lax.Precision.HIGHEST
        bw = b.astype(acc)
        h = jnp.einsum("kp,rp->rk", self._F, bw, precision=hi)
        h = jnp.einsum("ra,rk->ak", self._W, h, precision=hi)
        h = h * self._inv_denom
        h = jnp.einsum("ra,ak->rk", self._W, h, precision=hi)
        x = jnp.einsum("pk,rk->rp", self._G, h, precision=hi)
        return x.astype(b.dtype), jnp.asarray(0, jnp.int32)


class ShellPoissonSpectral:
    """rfft over lon + batched-mode CG with exact radial line
    preconditioning.

    Spectral-space operator for mode k (real coefficients, applied
    identically to Re and Im parts, stacked along the last axis):
      (A_k x)_{ij} = (a_i + a_{i+1} + b_j + b_{j+1} - c_{ij} mu_k) x_{ij}
                     - a_i x_{i-1,j} - a_{i+1} x_{i+1,j}
                     - b_j x_{i,j-1} - b_{j+1} x_{i,j+1}
    with a = A_r/dist_r (radial), b = A_lat/dist_lat (zero at poles),
    c = A_lon/dist_lon (the 1/cos(lat) polar stiffness, diagonal here).
    """

    def __init__(self, geo: Geometry, dtype=jnp.float32,
                 rtol: float = 1e-7, maxiter: int = 120,
                 use_pallas: Optional[bool] = None):
        assert geo.kind == "shell"
        self.geo = geo
        self.rtol = rtol
        self.maxiter = maxiter
        self.use_pallas = use_pallas
        nr, nlat, nlon = geo.cell_shape
        self.nm = nlon // 2 + 1
        a = _conductance(geo, 0)[:, :, 0]            # (nr+1, nlat)
        bb = _conductance(geo, 1)[:, :, 0]           # (nr, nlat+1)
        c = _conductance(geo, 2)[:, :, 0]            # (nr, nlat)
        mu = _mu(nlon, rfft=True)                    # (nm,)
        mu2 = np.concatenate([mu, mu])               # re + im stacking

        f = lambda x: np.asarray(x, dtype=dtype)   # host constants
        self._a_lo = f(a[:-1, :, None])              # (nr, nlat, 1)
        self._a_hi = f(a[1:, :, None])
        self._b_lo = f(bb[:, :-1, None])
        self._b_hi = f(bb[:, 1:, None])
        self._c = f(c[:, :, None])
        self._mu2 = f(mu2[None, None, :])            # (1, 1, 2nm)

        diag = (a[:-1] + a[1:] + bb[:, :-1] + bb[:, 1:])[:, :, None] \
            - c[:, :, None] * mu2[None, None, :]
        self._diag = f(diag)
        # nullspace deflation for the k=0 (real) mode: add
        # sigma * (1 1^T)/N on that slice — shifts the constant
        # nullvector's eigenvalue to sigma (well-scaled, unlike a
        # single-cell pin whose tiny support near the pole leaves a
        # near-singular system); the solution changes only in its
        # constant component, which callers re-normalize anyway.
        self._sigma = float(diag.mean())
        n2d = nr * nlat
        self._defl_scale = self._sigma / n2d
        # radial line preconditioner factors (tridiag in r per (lat,mode))
        self._p_lower = np.ascontiguousarray(np.broadcast_to(-self._a_lo, diag.shape))
        self._p_upper = np.ascontiguousarray(np.broadcast_to(-self._a_hi, diag.shape))

    def _apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """A x in spectral space; x: (nr, nlat, 2nm)."""
        ax = self._diag * x
        # radial neighbors (wall conductances already zero)
        ax = ax - self._a_lo * jnp.concatenate(
            [jnp.zeros_like(x[:1]), x[:-1]], axis=0)
        ax = ax - self._a_hi * jnp.concatenate(
            [x[1:], jnp.zeros_like(x[:1])], axis=0)
        # latitude neighbors (pole conductances zero)
        ax = ax - self._b_lo * jnp.concatenate(
            [jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)
        ax = ax - self._b_hi * jnp.concatenate(
            [x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)
        # k=0 real-mode deflation (see __init__)
        defl = self._defl_scale * jnp.sum(x[:, :, 0])
        ax = ax.at[:, :, 0].add(defl)
        return ax

    def _line_precond(self, r: jnp.ndarray) -> jnp.ndarray:
        return tridiag_solve(self._p_lower, self._diag, self._p_upper, r,
                             use_pallas=self.use_pallas)

    def __call__(self, b: jnp.ndarray) -> jnp.ndarray:
        return self.solve(b)[0]

    def solve(self, b: jnp.ndarray):
        nlon = self.geo.cell_shape[2]
        acc = jnp.promote_types(b.dtype, jnp.float32)
        bh = jnp.fft.rfft(b.astype(acc), axis=2)
        bs = jnp.concatenate([bh.real, bh.imag], axis=2).astype(acc)
        res = cg(self._apply, bs, rtol=self.rtol, maxiter=self.maxiter,
                 preconditioner=self._line_precond)
        xs = res.x
        nm = self.nm
        xh = xs[:, :, :nm] + 1j * xs[:, :, nm:]
        x = jnp.fft.irfft(xh, n=nlon, axis=2)
        return x.astype(b.dtype), res.iterations


class ShellPoissonDirect:
    """EXACT shell solve: rfft(lon) -> generalized lat eigentransform ->
    batched Thomas(r) -> inverse transforms.

    With uniform radial spacing the shell conductances separate:
      a_ij = alpha_i cos_j   (radial),
      b, c independent of the radial index,
    so per longitude mode k the (r, lat) operator is
      cos_j * T_r  +  S_k(lat only),   S_k = T_lat + diag(-g_j mu_k).
    Solving the generalized symmetric eigenproblem S_k V = M V Lambda
    (M = diag(cos_j), V^T M V = I) decouples latitude exactly: the
    per-mode transform is ONE (nlat x nlat) matmul pair per k (MXU
    work), leaving independent radial tridiagonal systems. Replaces the
    line-preconditioned CG (~O(nlat) iterations on developed flow) by
    a direct solve — the pressure projection stops being the step's
    bottleneck. Eigendecompositions are a one-time f64 host setup.
    """

    def __init__(self, geo: Geometry, dtype=jnp.float32,
                 use_pallas: Optional[bool] = None):
        assert geo.kind == "shell"
        self.geo = geo
        self.use_pallas = use_pallas
        nr, nlat, nlon = geo.cell_shape
        self.nm = nlon // 2 + 1
        a = _conductance(geo, 0)[:, :, 0].astype(np.float64)
        cosl = np.cos(np.asarray(geo.axes[1].centers, np.float64))
        alpha = a[:, 0] / cosl[0]                  # (nr+1,)
        V, lam = shell_lat_eigensystem(geo)

        lower = np.broadcast_to(-alpha[:-1, None, None, None],
                                (nr, 1, 1, 1)).copy()
        upper = np.broadcast_to(-alpha[1:, None, None, None],
                                (nr, 1, 1, 1)).copy()
        diag = ((alpha[:-1] + alpha[1:])[:, None, None]
                + np.transpose(lam)[None, :, :])   # (nr, nlat_m, nm)
        # nullspace pin (k=0 constant mode): ground the first radial cell
        m0 = int(np.argmin(lam[0]))
        diag = diag.copy()
        diag[0, m0, 0] += alpha[1] if nr > 1 else 1.0
        f = lambda x: np.asarray(x, dtype=dtype)   # host constants
        self._V = f(V)
        self._lower, self._upper = f(lower), f(upper)
        self._diag = f(diag[:, :, None, :])        # (nr, m, 1, nm)

    def __call__(self, b: jnp.ndarray) -> jnp.ndarray:
        return self.solve(b)[0]

    def solve(self, b: jnp.ndarray):
        nlon = self.geo.cell_shape[2]
        acc = jnp.promote_types(b.dtype, jnp.float32)
        bh = jnp.fft.rfft(b.astype(acc), axis=2)
        bs = jnp.stack([bh.real, bh.imag], axis=2).astype(acc)  # (nr,j,2,k)
        yh = jnp.einsum("kjm,ijsk->imsk", self._V, bs)
        from dycoreplanet_tpu.ops.pallas_kernels import tridiag_solve

        xh = tridiag_solve(self._lower, self._diag, self._upper, yh,
                           use_pallas=self.use_pallas)
        xs = jnp.einsum("kjm,imsk->ijsk", self._V, xh)
        x = jnp.fft.irfft(xs[:, :, 0, :] + 1j * xs[:, :, 1, :],
                          n=nlon, axis=2)
        return x.astype(b.dtype), jnp.asarray(0, jnp.int32)


class ShellPoissonFastDiag:
    """EXACT shell solve by full fast diagonalization — pure MXU work.

    Supersedes ShellPoissonDirect's FFT + batched-Thomas pipeline: on
    TPU the rfft/irfft pair costs ~115 us and the length-32 tridiagonal
    sweep is sequential (a 2*nr-step recurrence the MXU can't help
    with), while dense (n x n) transforms at n <= 256 are matmuls the
    systolic array eats for free. All three axes are diagonalized:

      lon:  real DFT as a matmul pair (F fwd, its f64 pseudo-inverse bwd
            — exact roundtrip, unlike pairing F with F^T when the
            sin rows of k=0/Nyquist vanish)
      lat:  per-mode generalized eigentransform V_k (as in
            ShellPoissonDirect; V_k^T M V_k = I)
      r:    the shared symmetric radial tridiagonal T_r = Q D Q^T
            (uniform radial spacing makes T_r mode-independent)

    leaving a pointwise division by (D_a + lam_{m,k}). The global
    Neumann nullspace (the single zero of that denominator) is handled
    by a host-precomputed pseudo-inverse: its reciprocal is zeroed, so
    the returned solution is the exact minimum-norm one and callers
    re-normalize the mean as usual. No pinning, no deflation, no
    sequential recurrences — one step of the pressure projection is
    six dense transforms and one elementwise multiply.
    """

    def __init__(self, geo: Geometry, dtype=jnp.float32,
                 use_pallas: Optional[bool] = None,
                 precision: str = "highest", refine_op=None):
        """``precision`` selects the MXU pass mode of the six dense
        transforms (TPU-only distinction; on CPU every mode is plain
        f32/f64 math):
          * "highest"     — f32-accurate bf16x6 passes (exact to ~5e-7);
          * "high"        — bf16x3 passes, ~3x faster MXU time; solve
                            rel err 2.3e-5 measured at 32x128x256 f32
                            (the canonical figure — full table in
                            PERF.md);
          * "high-refine" — one bf16x3 solve + ONE iterative-refinement
                            pass (residual from ``refine_op``, the exact
                            f32 stencil A = -weak_laplacian): measured
                            rel err ~1.6e-7 at ~2/3 the HIGHEST cost —
                            tighter than the reference's 1e-6 pressure
                            tolerance (boussinesq_model.tpp:1248-1266).
        ``refine_op`` (required for "high-refine"): callable x -> A x.
        """
        assert geo.kind == "shell"
        assert precision in ("highest", "high", "high-refine")
        if precision == "high-refine" and refine_op is None:
            raise ValueError("high-refine needs refine_op (the exact "
                             "stencil A = -weak_laplacian)")
        self.precision = precision
        self.refine_op = refine_op
        self.geo = geo
        nr, nlat, nlon = geo.cell_shape
        self.nm = nlon // 2 + 1
        nm = self.nm
        a = _conductance(geo, 0)[:, :, 0].astype(np.float64)
        cosl = np.cos(np.asarray(geo.axes[1].centers, np.float64))
        alpha = a[:, 0] / cosl[0]                  # (nr+1,)

        # --- latitude generalized eigentransforms (per lon mode) ------
        V, lam = shell_lat_eigensystem(geo)

        # --- radial eigentransform (shared by every mode) --------------
        Tr = (np.diag(alpha[:-1] + alpha[1:])
              - np.diag(alpha[1:-1], 1) - np.diag(alpha[1:-1], -1))
        D, Q = np.linalg.eigh(0.5 * (Tr + Tr.T))    # Q orthogonal

        # denominators D_a + lam_{m,k}; pseudo-invert the nullspace zero
        denom = D[:, None, None] + lam.T[None, :, :]   # (nr, nlat, nm)
        tiny = 1e-10 * float(denom.max())
        inv_denom = np.where(denom > tiny, 1.0 / np.maximum(denom, tiny), 0.0)

        # --- real-DFT matmul pair for longitude ------------------------
        # rows: Re (cos) then -Im (sin) of the rfft, at cell centers
        ll = np.arange(nlon)
        kk = np.arange(nm)
        ang = 2.0 * np.pi * kk[:, None] * ll[None, :] / nlon
        F = np.concatenate([np.cos(ang), -np.sin(ang)], axis=0)  # (2nm, nlon)
        G = np.linalg.pinv(F, rcond=1e-12)                       # (nlon, 2nm)

        f = lambda x: np.asarray(x, dtype=dtype)   # host constants
        self._F = f(F)
        self._G = f(G)
        self._V = f(V)
        self._Q = f(Q)
        self._inv_denom = f(inv_denom[:, :, None, :])  # (nr, nlat, 1, nm)

    def __call__(self, b: jnp.ndarray) -> jnp.ndarray:
        return self.solve(b)[0]

    def _transform_solve(self, bw: jnp.ndarray, prec) -> jnp.ndarray:
        nm = self.nm
        # lon forward: (nr, nlat, 2nm) -> split re/im into axis 2
        bh = jnp.einsum("kl,ijl->ijk", self._F, bw, precision=prec)
        bs = jnp.stack([bh[..., :nm], bh[..., nm:]], axis=2)  # (nr,j,2,k)
        # lat forward (per-mode batched matmul)
        yh = jnp.einsum("kjm,ijsk->imsk", self._V, bs, precision=prec)
        # r forward, divide, r backward
        zh = jnp.einsum("ia,imsk->amsk", self._Q, yh, precision=prec)
        wh = zh * self._inv_denom
        xh = jnp.einsum("ia,amsk->imsk", self._Q, wh, precision=prec)
        # lat backward
        xs = jnp.einsum("kjm,imsk->ijsk", self._V, xh, precision=prec)
        # lon backward (exact pseudo-inverse pair)
        xk = jnp.concatenate([xs[:, :, 0, :], xs[:, :, 1, :]], axis=2)
        return jnp.einsum("lk,ijk->ijl", self._G, xk, precision=prec)

    def solve(self, b: jnp.ndarray):
        acc = jnp.promote_types(b.dtype, jnp.float32)
        bw = b.astype(acc)
        if self.precision == "highest" or acc == jnp.float64:
            x = self._transform_solve(bw, jax.lax.Precision.HIGHEST)
        else:
            hp = jax.lax.Precision.HIGH
            x = self._transform_solve(bw, hp)
            if self.precision == "high-refine":
                # one Newton/refinement pass: the residual is evaluated
                # with the EXACT f32 stencil, so the correction solve
                # only needs to reduce an already-small error
                r = bw - self.refine_op(x).astype(acc)
                x = x + self._transform_solve(r, hp)
        return x.astype(b.dtype), jnp.asarray(0, jnp.int32)


class Cuboid2DPoissonFastDiag:
    """Exact 2D-cuboid (z, x) solve: x real-DFT pair + z wall
    eigentransform (the dim=2 reduction of CuboidPoissonFastDiag,
    covering the reference's planet_geometry.tpp:29-57 dim=2 branch)."""

    def __init__(self, geo: Geometry, dtype=jnp.float32,
                 use_pallas: Optional[bool] = None):
        assert geo.kind == "cuboid" and geo.dim == 2
        self.geo = geo
        nz, nx = geo.cell_shape
        cx = float(_conductance(geo, 1)[0, 0])
        mu_x2 = np.concatenate([_mu(nx, rfft=True)] * 2)
        az = _conductance(geo, 0)[:, 0].astype(np.float64)     # (nz+1,)
        Tz = (np.diag(az[:-1] + az[1:])
              - np.diag(az[1:-1], 1) - np.diag(az[1:-1], -1))
        D, Q = np.linalg.eigh(0.5 * (Tz + Tz.T))
        denom = D[:, None] - cx * mu_x2[None, :]               # (nz, 2nmx)
        tiny = 1e-10 * float(denom.max())
        inv = np.where(denom > tiny, 1.0 / np.maximum(denom, tiny), 0.0)
        Fx, Gx = _real_dft_pair(nx, np.float64)
        f = lambda a: np.asarray(a, dtype=dtype)
        self._Fx, self._Gx = f(Fx), f(Gx)
        self._Q, self._inv = f(Q), f(inv)

    def __call__(self, b: jnp.ndarray) -> jnp.ndarray:
        return self.solve(b)[0]

    def solve(self, b: jnp.ndarray):
        acc = jnp.promote_types(b.dtype, jnp.float32)
        hi = jax.lax.Precision.HIGHEST
        bw = b.astype(acc)
        h = jnp.einsum("kx,zx->zk", self._Fx, bw, precision=hi)
        h = jnp.einsum("za,zk->ak", self._Q, h, precision=hi)
        h = h * self._inv
        h = jnp.einsum("za,ak->zk", self._Q, h, precision=hi)
        x = jnp.einsum("xk,zk->zx", self._Gx, h, precision=hi)
        return x.astype(b.dtype), jnp.asarray(0, jnp.int32)


def _uniform_radial(geo: Geometry) -> bool:
    dr = np.diff(np.asarray(geo.axes[0].faces))
    return bool(np.allclose(dr, dr[0], rtol=1e-12, atol=0.0))


def make_poisson_solver(geo: Geometry, dtype=jnp.float32,
                        use_pallas: Optional[bool] = None,
                        precision: str = "highest", refine_op=None, **kw):
    if geo.kind == "cuboid":
        if geo.dim == 2:
            return Cuboid2DPoissonFastDiag(geo, dtype=dtype)
        return CuboidPoissonFastDiag(geo, dtype=dtype)
    if geo.kind == "annulus":
        return AnnulusPoissonFastDiag(geo, dtype=dtype)
    if _uniform_radial(geo):
        return ShellPoissonFastDiag(geo, dtype=dtype, precision=precision,
                                    refine_op=refine_op)
    return ShellPoissonSpectral(geo, dtype=dtype, use_pallas=use_pallas, **kw)


class ShardedShellPoissonFastDiag:
    """ShellPoissonFastDiag on a ('lat'[, 'lon']) device mesh with the
    north-star communication contract: the ONLY collective is one
    field-sized `psum` per solve direction.

    GSPMD left to itself reshards the solver's lat/lon contractions
    with pencil-transpose all-to-alls (measured 105-161 all-to-all ops
    per step, ~85% of step communication — SCALING.md round 2, VERDICT
    item 4). Under shard_map the contraction over the sharded axes is
    written as it should execute: each shard contracts its local slice
    of the DFT/eigentransform operators (F columns, V latitude rows),
    then ONE `lax.psum` over the mesh completes the forward transforms
    — "the pressure-solve allreduces are the only global collectives"
    (BASELINE north star; reference analogue: the Allreduce inside each
    Krylov dot, SURVEY §5). The eigen-space work (radial transforms +
    pointwise divide) is replicated — redundant compute on an
    (nr, nlat, nlon+2)-sized array is far cheaper than transposing it.
    The backward transforms are fully local: each shard applies its own
    rows of V^T and G.
    """

    def __init__(self, base: ShellPoissonFastDiag, mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        self.geo = base.geo
        self.nm = base.nm
        self.mesh = mesh
        self._axes = tuple(n for n in ("lat", "lon")
                           if n in mesh.axis_names)
        if not self._axes:
            raise ValueError("mesh has neither 'lat' nor 'lon' axis")
        # host numpy copies so the model's const-hoisting registry can
        # pick them up from THIS object (vars() walk)
        self._F = np.asarray(base._F)
        self._G = np.asarray(base._G)
        self._V = np.asarray(base._V)
        self._Q = np.asarray(base._Q)
        self._inv_denom = np.asarray(base._inv_denom)

        lat = "lat" if "lat" in mesh.axis_names else None
        lon = "lon" if "lon" in mesh.axis_names else None
        axes = self._axes

        def local_solve(b, F, G, V, Q, inv_denom):
            nm = self.nm
            acc = jnp.promote_types(b.dtype, jnp.float32)
            hi = jax.lax.Precision.HIGHEST
            bw = b.astype(acc)
            # forward transforms: contract the LOCAL lon columns and
            # lat rows, then one psum completes both contractions
            bh = jnp.einsum("kl,ijl->ijk", F, bw, precision=hi)
            bs = jnp.stack([bh[..., :nm], bh[..., nm:]], axis=2)
            yh_part = jnp.einsum("kjm,ijsk->imsk", V, bs, precision=hi)
            yh = jax.lax.psum(yh_part, axes)     # THE solver all-reduce
            # replicated eigen-space work (radial transform + divide)
            zh = jnp.einsum("ia,imsk->amsk", Q, yh, precision=hi)
            wh = zh * inv_denom
            xh = jnp.einsum("ia,amsk->imsk", Q, wh, precision=hi)
            # backward transforms: fully local rows of V / G
            xs = jnp.einsum("kjm,imsk->ijsk", V, xh, precision=hi)
            xk = jnp.concatenate([xs[:, :, 0, :], xs[:, :, 1, :]], axis=2)
            x = jnp.einsum("lk,ijk->ijl", G, xk, precision=hi)
            return x.astype(b.dtype)

        cell = P(None, lat, lon)
        self._mapped = shard_map(
            local_solve, mesh=mesh,
            in_specs=(cell, P(None, lon), P(lon, None),
                      P(None, lat, None), P(), P()),
            out_specs=cell, check_vma=False)

    def __call__(self, b: jnp.ndarray) -> jnp.ndarray:
        return self.solve(b)[0]

    def solve(self, b: jnp.ndarray):
        dt = b.dtype
        x = self._mapped(b, jnp.asarray(self._F, dt),
                         jnp.asarray(self._G, dt),
                         jnp.asarray(self._V, dt),
                         jnp.asarray(self._Q, dt),
                         jnp.asarray(self._inv_denom, dt))
        return x, jnp.asarray(0, jnp.int32)
