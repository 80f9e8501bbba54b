"""Staggered C-grid (mimetic) operators for the FEEC personality.

The TPU-native counterpart of the reference's exterior-calculus
discretization (FE_Nedelec vorticity / FE_RaviartThomas velocity /
FE_DGQ pressure, reference: boussineq_model_FEEC.tpp:21-30): velocity
lives as FACE-NORMAL components on a MAC lattice (the structured-grid
H(div) space), vorticity as EDGE circulations (the H(curl) space), and
pressure/temperature at cell centers (L2).  The chain identities of the
discrete de Rham complex (ops/mimetic.py) then hold in the *dynamics*:

  * div after projection is exact:  div(grad phi) is ALGEBRAICALLY the
    weak Laplacian the pressure solver inverts, so the corrected face
    field is divergence-free to solver tolerance (roundoff for the
    direct solvers) — the discrete analogue of the RT velocity space
    property div V_h subset Q_h;
  * the projection never creates vorticity:  curl(grad phi) telescopes
    to zero around every edge loop, so the pressure correction is
    discretely irrotational — the identity the reference buys with
    curl-conforming elements;
  * advection is the vector-invariant (rotational) form
    omega x u + grad |u|^2/2 evaluated from the EDGE vorticity with
    Sadourny-style double averaging: on the uniform periodic cuboid the
    discrete kinetic-energy input of advection + Coriolis is exactly
    zero (energy-conserving transport; tests/test_mimetic_model.py);
  * viscosity is the mimetic  -curl(curl u)  (exactly the FEEC weak
    form's  dt/Re (phi_u, curl w)  term, reference: FEEC.tpp:753-769),
    assembled as the symmetric positive-semidefinite Galerkin product
    C^T M C so the implicit solve is CG-clean.

Conventions
-----------
Two face layouts appear:
  * "cell-shaped" (the model-state layout, ops/stencil.py docstring):
    n entries per axis, entry i = LEFT face of cell i; hi-wall face
    implicit zero.
  * "full faces" (internal to this module): wall axes carry n+1 entries
    (both wall faces explicit), periodic axes n.  All staggered algebra
    happens on full faces; `expand`/`contract` convert at the module
    boundary.

Edge fields along axis c are face-staggered in the other two axes
(full-face extents there) and cell-centered along c.  All differences
and averages are the compact 2-point ones, so the whole layer lowers to
dense XLA slice/roll stencils exactly like ops/stencil.py.

Orientation: the cyclic index convention (curl_c = d_a X_b - d_b X_a
for (c,a,b) cyclic in ARRAY axes) is used for both curls.  Our 3D array
orderings (z,y,x) and (r,lat,lon) are LEFT-handed, so the cyclic curl
is minus the physical curl; the double sign cancels in curl(curl) and
in the assembled advection term  cross(q, u)  with
q = -zeta_cyc - 2*sigma*Omega_arr (sigma = orientation; see
MimeticBoussinesqModel), so no orientation bookkeeping leaks out of
this module.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from dycoreplanet_tpu.grid.geometry import Geometry
from dycoreplanet_tpu.ops.bc import BC, BCSpec, pad_axis


def _sl(f, d, idx):
    sl = [slice(None)] * f.ndim
    sl[d] = idx
    return f[tuple(sl)]


class StaggeredMetrics:
    """Length elements of the orthogonal structured grids at arbitrary
    staggered positions (numpy, computed once).

    ``lam(d, stag, ext_axis)`` = physical length per cell step along
    axis ``d`` evaluated at the staggering combo ``stag`` ('c' = cell
    centers, 'f' = full faces per axis), optionally with one mirror
    ghost appended at each end of ``ext_axis`` (for metric-correct
    ghost products).  Scale factors: cuboid s_d = 1; annulus s_phi = r;
    shell s_lat = r, s_lon = r cos(lat).
    """

    def __init__(self, geo: Geometry):
        self.geo = geo
        self.dim = geo.dim
        # uniform coordinate spacing per axis (factory invariant)
        self.dxi = []
        for a in geo.axes:
            if a.periodic:
                self.dxi.append(float(a.faces[1] - a.faces[0])
                                if a.n > 1 else float(2 * (a.centers[0] - a.faces[0])))
            else:
                self.dxi.append(float(a.faces[1] - a.faces[0]))

    def coords(self, d: int, stag: str, ext: bool = False) -> np.ndarray:
        a = self.geo.axes[d]
        c = a.centers if stag == "c" else a.faces
        if a.periodic and stag == "f":
            c = a.faces  # n left faces
        if ext:
            c = np.concatenate([[c[0] - self.dxi[d]], c, [c[-1] + self.dxi[d]]])
        return np.asarray(c, dtype=np.float64)

    def _bshape(self, arr1d: np.ndarray, d: int) -> np.ndarray:
        shape = [1] * self.dim
        shape[d] = arr1d.shape[0]
        return arr1d.reshape(shape)

    def lam(self, d: int, stag: Sequence[str],
            ext_axis: Optional[int] = None) -> np.ndarray:
        """Length element along axis d at staggering ``stag`` (one
        'c'/'f' per axis), broadcast-shaped.  Only the axes the scale
        factor actually depends on appear with extent > 1."""
        kind = self.geo.kind
        dxi = self.dxi[d]
        if kind == "cuboid":
            out = np.full((1,) * self.dim, dxi)
            # ext ghosts don't change a constant metric, but the shape
            # must match the padded array along ext_axis
            if ext_axis is not None:
                return out  # broadcasts fine (extent 1)
            return out
        if kind == "annulus":
            if d == 0:
                return np.full((1,) * self.dim, dxi)
            r = self.coords(0, stag[0], ext=(ext_axis == 0))
            return self._bshape(r * dxi, 0)
        if kind == "shell":
            if d == 0:
                return np.full((1,) * self.dim, dxi)
            r = self._bshape(self.coords(0, stag[0], ext=(ext_axis == 0)), 0)
            if d == 1:
                return r * dxi
            lat = self._bshape(self.coords(1, stag[1], ext=(ext_axis == 1)), 1)
            # |cos|: ghost positions beyond the poles (|lat| > pi/2)
            # represent the ANTIPODAL interior cell across the pole,
            # whose scale factor is cos of the mirrored latitude —
            # cos(pi/2 + x) = -cos(pi/2 - x), so abs() is exactly the
            # mirrored metric (interior values are unchanged)
            return r * np.abs(np.cos(lat)) * dxi
        raise ValueError(kind)


class StaggeredOps:
    """Mimetic operator bundle for one geometry + velocity BC set.

    ``u_specs[c][d]`` is the ghost rule of velocity component c along
    axis d (the model's u_specs); ``scalar_specs[d]`` the pressure-like
    rule.  Cuboid (2D/3D) and annulus geometries are supported — the
    shell's pole closure for edge-staggered quantities is future work
    (the shell FEEC personality runs the coupled 3x3 solve instead,
    models/boussinesq.py)."""

    def __init__(self, geo: Geometry, u_specs, scalar_specs):
        if geo.kind not in ("cuboid", "annulus", "shell"):
            raise NotImplementedError(geo.kind)
        self.geo = geo
        self.dim = geo.dim
        self.u_specs = u_specs
        self.scalar_specs = scalar_specs
        self.m = StaggeredMetrics(geo)
        self._build_static()

    # ------------------------------------------------------------------
    # static metric arrays (numpy)
    # ------------------------------------------------------------------
    def _full_stag(self, d: int) -> List[str]:
        s = ["c"] * self.dim
        s[d] = "f"
        return s

    def _edge_stag(self, c: int) -> List[str]:
        s = ["f"] * self.dim
        s[c] = "c"
        return s

    def _build_static(self) -> None:
        geo, m, dim = self.geo, self.m, self.dim
        # dual length across d-faces (full): lam_d at d='f'
        self.h_face = [m.lam(d, self._full_stag(d)) for d in range(dim)]
        # full-face areas (exact FV integrals from the geometry)
        self.area_face = []
        for d in range(dim):
            a = np.asarray(geo.face_area[d], dtype=np.float64)
            # broadcast arrays are already full-shaped along wall axes
            self.area_face.append(a)
        # face "volume" weight w = A * h (the H(div) mass weight)
        self.w_face = [self.area_face[d] * self.h_face[d] for d in range(dim)]
        if dim == 2:
            stag = ["f", "f"]
            la = m.lam(0, stag)
            lb = m.lam(1, stag)
            self.A_edge = la * lb           # dual-loop area at nodes
            self.l_edge = np.ones_like(self.A_edge)  # out-of-plane unit
            self.inv_A_edge = 1.0 / self.A_edge
            self.edge_w = self.l_edge / self.A_edge
        else:
            self.A_edge = []
            self.l_edge = []
            self.inv_A_edge = []
            self.edge_w = []
            for c in range(3):
                a, b = (c + 1) % 3, (c + 2) % 3
                stag = self._edge_stag(c)
                A = m.lam(a, stag) * m.lam(b, stag)
                L = m.lam(c, stag)
                self.A_edge.append(A)
                self.l_edge.append(L)
                # pole closure: the shell's radial edges AT the pole
                # faces have zero dual-loop area (cos(+-pi/2) = 0) —
                # those degenerate loops carry zero vorticity and zero
                # viscous weight (dropping nonnegative terms keeps the
                # curl-curl form symmetric PSD; the pole faces already
                # carry zero normal flux through their zero areas)
                tol = 1e-12 * float(np.max(A))
                self.inv_A_edge.append(np.where(A > tol, 1.0 / np.maximum(A, tol), 0.0))
                self.edge_w.append(np.where(A > tol, L / np.maximum(A, tol), 0.0))

    # ------------------------------------------------------------------
    # layout conversion
    # ------------------------------------------------------------------
    def expand(self, uf_cell: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        """Cell-shaped faces -> full faces (wall axes gain the hi-wall
        entry = 0; the lo-wall entry is forced to 0)."""
        out = []
        for d in range(self.dim):
            x = uf_cell[d]
            if self.geo.axes[d].periodic:
                out.append(x)
                continue
            x = x.at[tuple([slice(None)] * d + [0])].set(0.0)
            zero = jnp.zeros_like(_sl(x, d, slice(0, 1)))
            out.append(jnp.concatenate([x, zero], axis=d))
        return out

    def contract(self, uf_full: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        """Full faces -> cell-shaped (drop the hi-wall entry; zero the
        lo-wall entry so pinned walls stay exact)."""
        out = []
        for d in range(self.dim):
            x = uf_full[d]
            if self.geo.axes[d].periodic:
                out.append(x)
                continue
            x = _sl(x, d, slice(0, -1))
            x = x.at[tuple([slice(None)] * d + [0])].set(0.0)
            out.append(x)
        return out

    # ------------------------------------------------------------------
    # staggered primitives (full-face convention)
    # ------------------------------------------------------------------
    def _c2f(self, x, d, spec, op, weight_ext=None):
        """Cell-staggered along d -> face-staggered (full) via a 2-point
        ``op`` on the ghost-padded array; optional metric weight with
        ghost entries multiplied BEFORE the stencil (metric-correct
        ghost products)."""
        per = self.geo.axes[d].periodic
        p = pad_axis(x, d, spec, per)
        if weight_ext is not None:
            p = p * jnp.asarray(weight_ext, dtype=x.dtype)
        n = self.geo.axes[d].n
        nf = n if per else n + 1
        return op(_sl(p, d, slice(0, nf)), _sl(p, d, slice(1, nf + 1)))

    def avg_c2f(self, x, d, spec, weight_ext=None):
        return self._c2f(x, d, spec, lambda a, b: 0.5 * (a + b), weight_ext)

    def dcf(self, x, d, spec, weight_ext=None):
        """Backward difference cells -> full faces."""
        return self._c2f(x, d, spec, lambda a, b: b - a, weight_ext)

    def avg_f2c(self, x, d):
        if self.geo.axes[d].periodic:
            return 0.5 * (x + jnp.roll(x, -1, axis=d))
        return 0.5 * (_sl(x, d, slice(0, -1)) + _sl(x, d, slice(1, None)))

    def dfc(self, x, d):
        """Forward difference full faces -> cells."""
        if self.geo.axes[d].periodic:
            return jnp.roll(x, -1, axis=d) - x
        return _sl(x, d, slice(1, None)) - _sl(x, d, slice(0, -1))

    # ------------------------------------------------------------------
    # mimetic operators
    # ------------------------------------------------------------------
    def circulation(self, U: Sequence[jnp.ndarray]):
        """Dual-loop circulations around edges (cyclic convention):
        3D: circ_c = d_a(lam_b u_b) - d_b(lam_a u_a);  2D: scalar at
        nodes.  Ghost values use the velocity wall rules, with the
        metric evaluated at the true ghost positions."""
        dt = U[0].dtype
        if self.dim == 2:
            # weights at the positions of the padded operand: u_phi sits
            # at (r-centers incl ghosts, phi-faces) and vice versa
            l1 = self.m.lam(1, self._full_stag(1), ext_axis=0)
            l0 = self.m.lam(0, self._full_stag(0), ext_axis=1)
            t1 = self.dcf(U[1], 0, self.u_specs[1][0],
                          weight_ext=l1.astype(dt))
            t2 = self.dcf(U[0], 1, self.u_specs[0][1],
                          weight_ext=l0.astype(dt))
            return t1 - t2
        out = []
        for c in range(3):
            a, b = (c + 1) % 3, (c + 2) % 3
            lam_b = self.m.lam(b, self._full_stag(b), ext_axis=a)
            lam_a = self.m.lam(a, self._full_stag(a), ext_axis=b)
            t1 = self.dcf(U[b], a, self.u_specs[b][a],
                          weight_ext=lam_b.astype(dt))
            t2 = self.dcf(U[a], b, self.u_specs[a][b],
                          weight_ext=lam_a.astype(dt))
            out.append(t1 - t2)
        return out

    def vorticity(self, U: Sequence[jnp.ndarray]):
        """Physical edge vorticity in the cyclic convention:
        zeta_cyc = circulation / dual-loop area."""
        circ = self.circulation(U)
        if self.dim == 2:
            return circ * jnp.asarray(self.inv_A_edge, dtype=circ.dtype)
        return [circ[c] * jnp.asarray(self.inv_A_edge[c],
                                      dtype=circ[c].dtype)
                for c in range(3)]

    def cross(self, q, U: Sequence[jnp.ndarray]):
        """Sadourny double-averaged cross product  cross(q, u)  at faces
        (cyclic convention): out_d = avg_b(q_a * avg_d(u_b))
                                   - avg_a(q_b * avg_d(u_a)).
        2D: out = (avg_phi(q * avg_r(u_phi)), -avg_r(q * avg_phi(u_r)))
        with scalar q at nodes."""
        if self.dim == 2:
            ub = self.avg_c2f(U[1], 0, self.u_specs[1][0])
            ua = self.avg_c2f(U[0], 1, self.u_specs[0][1])
            t0 = self.avg_f2c(q * ub, 1)
            t1 = -self.avg_f2c(q * ua, 0)
            return [t0, t1]
        out = []
        for d in range(3):
            a, b = (d + 1) % 3, (d + 2) % 3
            ub = self.avg_c2f(U[b], d, self.u_specs[b][d])   # at a-edges
            ua = self.avg_c2f(U[a], d, self.u_specs[a][d])   # at b-edges
            out.append(self.avg_f2c(q[a] * ub, b)
                       - self.avg_f2c(q[b] * ua, a))
        return out

    def kinetic_energy(self, U: Sequence[jnp.ndarray]) -> jnp.ndarray:
        """C-grid KE at cell centers: 0.5 sum_d avg_d(u_d^2)."""
        out = None
        for d in range(self.dim):
            t = self.avg_f2c(U[d] * U[d], d)
            out = t if out is None else out + t
        return 0.5 * out

    def grad_faces(self, f: jnp.ndarray, specs) -> List[jnp.ndarray]:
        """Scalar gradient at full faces: delta(f)/h."""
        out = []
        for d in range(self.dim):
            g = self.dcf(f, d, specs[d])
            out.append(g / jnp.asarray(self.h_face[d], dtype=f.dtype))
        return out

    # -------------------- symmetric viscous operator -------------------
    def _gapply(self, rule, x):
        """Apply the (self-adjoint) linear ghost operator of a wall rule
        to an edge slice: ghost = G(interior_edge). ANTISYM/NEUMANN are
        -+identity; POLE/POLE_FLIP are the (sign-flipped) half-turn
        longitude roll — its own transpose for even nlon, so the same
        operator serves the forward pad and the transpose foldback."""
        if rule == BC.ANTISYM:
            return -x
        if rule == BC.NEUMANN:
            return x
        if rule in (BC.POLE, BC.POLE_FLIP):
            half = self.geo.cell_shape[-1] // 2
            r = jnp.roll(x, half, axis=-1)
            return -r if rule == BC.POLE_FLIP else r
        raise ValueError(f"unsupported wall rule for staggered ops: {rule}")

    def _dcf_transpose(self, x, d, spec):
        """Exact transpose of ``dcf`` (with its ghost extension) along a
        wall axis; periodic axes transpose to the wrapped backward
        difference.  Maps full faces -> cells."""
        per = self.geo.axes[d].periodic
        if per:
            return x - jnp.roll(x, -1, axis=d)
        out = _sl(x, d, slice(0, -1)) - _sl(x, d, slice(1, None))
        # ghost foldback: dcf's lo face used ghost = G_lo(interior0),
        # hi face used ghost = G_hi(interior(n-1)); G self-adjoint
        first = tuple([slice(None)] * d + [slice(0, 1)])
        last = tuple([slice(None)] * d + [slice(-1, None)])
        out = out.at[first].add(
            -self._gapply(spec.lo, _sl(x, d, slice(0, 1))))
        out = out.at[last].add(
            self._gapply(spec.hi, _sl(x, d, slice(-1, None))))
        return out

    def curlcurl_weighted(self, U: Sequence[jnp.ndarray]):
        """The W-weighted symmetric viscous operator
        CC = (C E)^T diag(l/A) (C E):  full-face input/output.
        <v, CC u> = sum_edges (l_e/A_e) circ_e(u) circ_e(v)  >= 0, so
        W + nu*CC is SPD for the implicit momentum CG.  At interior
        faces CC u = w_f * (curl curl u)_f; at walls it is the
        variationally-consistent (transpose) boundary closure."""
        dt = U[0].dtype
        circ = self.circulation(U)
        if self.dim == 2:
            mu = circ * jnp.asarray(self.edge_w, dtype=dt)
            l1 = self.m.lam(1, self._full_stag(1), ext_axis=0)
            l0 = self.m.lam(0, self._full_stag(0), ext_axis=1)
            # circ = +dcf_0(lam1 u1) - dcf_1(lam0 u0)
            out1 = self._wtrans(mu, 0, self.u_specs[1][0], l1)
            out0 = -self._wtrans(mu, 1, self.u_specs[0][1], l0)
            return [out0, out1]
        out = [None] * 3
        for c in range(3):
            a, b = (c + 1) % 3, (c + 2) % 3
            mu = circ[c] * jnp.asarray(self.edge_w[c], dtype=dt)
            lam_b = self.m.lam(b, self._full_stag(b), ext_axis=a)
            lam_a = self.m.lam(a, self._full_stag(a), ext_axis=b)
            tb = self._wtrans(mu, a, self.u_specs[b][a], lam_b)
            ta = -self._wtrans(mu, b, self.u_specs[a][b], lam_a)
            out[b] = tb if out[b] is None else out[b] + tb
            out[a] = ta if out[a] is None else out[a] + ta
        return out

    def _wtrans(self, mu, d, spec, lam_ext):
        """Transpose of  x -> dcf(x, d, spec, weight_ext=lam_ext):
        distributes an edge field back to the faces of the weighted
        component.  lam_ext carries ghost entries at both ends of d."""
        per = self.geo.axes[d].periodic
        if per:
            base = mu - jnp.roll(mu, -1, axis=d)
            return base * _interior_lam(lam_ext, d, per, mu.dtype)
        core = _sl(mu, d, slice(0, -1)) - _sl(mu, d, slice(1, None))
        lam_core = _interior_lam(lam_ext, d, per, mu.dtype)
        out = core * lam_core
        lg_lo = _sl_np(lam_ext, d, slice(0, 1))
        lg_hi = _sl_np(lam_ext, d, slice(-1, None))
        first = tuple([slice(None)] * d + [slice(0, 1)])
        last = tuple([slice(None)] * d + [slice(-1, None)])
        # transpose of the weighted ghost contribution: the ghost-
        # position metric is longitude-invariant, so it commutes with
        # the (self-adjoint) ghost operator G
        out = out.at[first].add(-self._gapply(
            spec.lo,
            jnp.asarray(lg_lo, mu.dtype) * _sl(mu, d, slice(0, 1))))
        out = out.at[last].add(self._gapply(
            spec.hi,
            jnp.asarray(lg_hi, mu.dtype) * _sl(mu, d, slice(-1, None))))
        return out

    # ------------------------------------------------------------------
    def curlcurl_diag(self) -> List[np.ndarray]:
        """Jacobi diagonal of ``curlcurl_weighted`` in the CELL-SHAPED
        face layout (interior stencil; wall ghost foldbacks ignored —
        preconditioner only).  Broadcast-shaped numpy arrays."""
        dim = self.dim

        def pair_sum_f2c(x: np.ndarray, d: int) -> np.ndarray:
            """Sum of the two edge values adjacent to a face across
            axis d (full-face extent -> cell extent)."""
            if x.shape[d] == 1:
                return 2.0 * x
            if self.geo.axes[d].periodic:
                return x + np.roll(x, -1, axis=d)
            return _sl_np(x, d, slice(0, -1)) + _sl_np(x, d, slice(1, None))

        def to_cell(x: np.ndarray, d: int) -> np.ndarray:
            """Drop the hi-wall entry along the face axis d."""
            if x.shape[d] == 1 or self.geo.axes[d].periodic:
                return x
            return _sl_np(x, d, slice(0, -1))

        if dim == 2:
            mw = self.edge_w
            l1 = self.m.lam(1, self._full_stag(1))
            l0 = self.m.lam(0, self._full_stag(0))
            d1 = (l1 ** 2) * pair_sum_f2c(mw, 0)
            d0 = (l0 ** 2) * pair_sum_f2c(mw, 1)
            return [to_cell(d0, 0), to_cell(d1, 1)]
        out = [np.zeros((1,) * dim) for _ in range(3)]
        for c in range(3):
            a, b = (c + 1) % 3, (c + 2) % 3
            mw = self.edge_w[c]
            lam_b = self.m.lam(b, self._full_stag(b))
            lam_a = self.m.lam(a, self._full_stag(a))
            out[b] = out[b] + (lam_b ** 2) * pair_sum_f2c(mw, a)
            out[a] = out[a] + (lam_a ** 2) * pair_sum_f2c(mw, b)
        return [to_cell(out[d], d) for d in range(3)]


def _interior_lam(lam_ext: np.ndarray, d: int, periodic: bool, dtype):
    """Strip the ghost entries of a ghost-extended metric array (no-op
    for broadcast extent-1 arrays)."""
    lam_ext = np.asarray(lam_ext)
    if lam_ext.shape[d] == 1:
        return jnp.asarray(lam_ext, dtype=dtype)
    return jnp.asarray(_sl_np(lam_ext, d, slice(1, -1)), dtype=dtype)


def _sl_np(x: np.ndarray, d: int, idx):
    sl = [slice(None)] * x.ndim
    sl[d] = idx
    return np.asarray(x)[tuple(sl)]
