"""Fused Pallas TPU kernel for the shell explicit-forcing hot path.

The reference's hot loop is the per-quadrature-point assembly of the
explicit momentum RHS (advection + buoyancy + Coriolis, reference:
boussinesq_model.tpp:550-673). Our jnp stencil path expresses the same
physics as ~15 separate XLA fusions (each pad/concat materializes a
full-field copy; measured 0.31 ms of the 0.89 ms step at 32x128x256 on
TPU v5e). This kernel fuses the ENTIRE explicit stage —

    rhs_u = u + dt * ( -(advect(u) + curvature(u)) + coriolis(u)
                       + buoyancy(T) + visc_curvature(u)/Re - grad p )

— into one pass: each grid step streams a radial block of all fields
HBM->VMEM, reconstructs every ghost value on-chip (longitude rolls for
the periodic axis, half-turn rolls of the boundary rings for the lat
pole closure, precomputed halo rows for the radial block seams and
walls), and writes the three RHS components once.

Design notes (why this shape):
  * grid over RADIAL BLOCKS — lat/lon stay whole inside a block, so the
    pole rule (ghost = value at lon + pi, sign-flipped for tangential
    vector components) and the periodic lon stencils are block-local
    rolls with no inter-block communication;
  * radial halos (2 rows each side, MUSCL needs 2 ghosts) are gathered
    by cheap XLA row-slices into a (n_blocks, C, 4, nlat, nlon) array
    consumed with a standard BlockSpec — no manual DMA, so Mosaic
    double-buffers and overlaps the halo loads with compute;
  * wall BC ghosts (antisym velocity / Neumann pressure) are folded
    into the same halo array, making the kernel branch-free;
  * metric terms enter as a (K, nr, nlat) channel stack (r- and
    lat-dependent only — the shell metric is lon-invariant) blocked
    along r, plus tiny lat-only closure constants.

The jnp ops in ops/stencil.py / ops/vector.py remain the correctness
oracle; tests/test_pallas_stencil.py pins equivalence in interpret mode.
The sharded (multi-chip) path keeps the jnp ops — GSPMD cannot see
through a pallas_call, so the fused kernel engages on single-device
runs only (the bench configuration).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dycoreplanet_tpu.grid.geometry import Geometry

# VMEM budget hint passed to Mosaic for every fused kernel in this module.
# 100 MB leaves headroom below the ~128 MB physical VMEM of v5e/v5p cores
# while letting Mosaic double-buffer the radial-block streams.
VMEM_LIMIT_MB = 100


def supports_pallas() -> bool:
    """True on platforms whose Mosaic path works (real TPU and the
    axon tunnel — verified to run Pallas kernels correctly)."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False


def _van_leer(a, b):
    ab = a * b
    return jnp.where(ab > 0, 2.0 * ab / (a + b), jnp.zeros_like(a))


def _muscl_faces(p2, uf, axis, n_faces, scheme):
    """L/R-limited upwind face values from a 2-ghost padded array along
    ``axis``; identical indexing to ops.stencil._muscl_LR."""
    sl = lambda a, s: a[tuple([slice(None)] * axis + [s])]
    if scheme == "muscl":
        diff = sl(p2, slice(1, None)) - sl(p2, slice(0, -1))
        slope = _van_leer(sl(diff, slice(0, n_faces + 1)),
                          sl(diff, slice(1, n_faces + 2)))
        L = sl(p2, slice(1, n_faces + 1)) + 0.5 * sl(slope, slice(0, n_faces))
        R = sl(p2, slice(2, n_faces + 2)) - 0.5 * sl(slope, slice(1, n_faces + 1))
    elif scheme == "upwind":
        L = sl(p2, slice(1, n_faces + 1))
        R = sl(p2, slice(2, n_faces + 2))
    elif scheme == "centered":
        lo = sl(p2, slice(1, n_faces + 1))
        hi = sl(p2, slice(2, n_faces + 2))
        return 0.5 * (lo + hi)
    else:  # pragma: no cover
        raise ValueError(scheme)
    return jnp.where(uf > 0, L, R)


class ShellForcingPallas:
    """Callable (u, u_faces, T, p, dt) -> rhs_u for the shell standard
    (advective-form) personality."""

    # radial wall ghost signs per channel [u_r, u_lat, u_lon, p]
    # (ANTISYM = -1, NEUMANN = +1; reference BC set
    #  boussinesq_model.tpp:308-330 -> ghost rules in ops/bc.py)
    _LO_SIGN = np.array([-1.0, -1.0, -1.0, 1.0])
    _HI_SIGN = np.array([-1.0, 1.0, 1.0, 1.0])
    # pole ghost signs per channel (POLE = +1, POLE_FLIP = -1)
    _POLE_SIGN = np.array([1.0, -1.0, -1.0, 1.0])

    def __init__(self, geo: Geometry, *, dtype=np.float32,
                 beta: float, T_ref: float, rho_background: float,
                 gravity_r: np.ndarray, one_over_Re: float,
                 omega_hat: float, coriolis_mode: str,
                 buoyancy: str, scheme: str, include_gradp: bool,
                 advect_T: bool = False, T_wall=None,
                 dt_T_factor: float = 1.0,
                 block_rows: Optional[int] = None,
                 interpret: bool = False):
        assert geo.kind == "shell"
        self.geo = geo
        nr, nlat, nlon = geo.cell_shape
        self.shape = (nr, nlat, nlon)
        if block_rows is None:
            # Mosaic block constraint: the metric stack's second-to-last
            # block dim (blk) must be a multiple of 8 or the full extent
            block_rows = next((b for b in (8, 16) if nr % b == 0), nr)
        assert nr % block_rows == 0
        self.blk = block_rows
        self.nb = nr // block_rows
        self.interpret = interpret
        self.scheme = scheme
        self.coriolis_mode = coriolis_mode
        self.buoyancy = buoyancy
        self.include_gradp = include_gradp
        f = lambda a: np.asarray(a, dtype=dtype)

        # ---- static scalars -----------------------------------------
        self.s_beta = float(beta)
        self.s_Tref = float(T_ref)
        self.s_rho_bg = float(rho_background)
        self.s_iRe = float(one_over_Re)
        self.s_omega = float(omega_hat)
        self.dr = float(np.asarray(geo.face_dist[0]).flat[0])
        self.dlat = float(np.pi / nlat)

        # ---- metric channel stack (K, nr, nlat) ----------------------
        # Divides dominate the kernel's VPU time (measured ~3x above the
        # HBM traffic bound with plain x/metric divides), so every
        # metric that only ever appears in a denominator is stored as
        # its host-precomputed RECIPROCAL and applied by multiply. The
        # only remaining divides are the data-dependent van Leer slopes.
        b2 = lambda a: np.broadcast_to(np.asarray(a, np.float64)[..., 0],
                                       (nr, nlat))
        area_r = np.broadcast_to(np.asarray(geo.face_area[0], np.float64),
                                 (nr + 1, nlat, 1))[..., 0]
        area_lat = np.broadcast_to(np.asarray(geo.face_area[1], np.float64),
                                   (nr, nlat + 1, 1))[..., 0]
        rc = np.broadcast_to(geo.extras["r_centers"], (nr, nlat, 1))[..., 0]
        # radial gravity profile: the shell metric (and the reference's
        # radial gravity, core_model_data.tpp:97-106) is lon-invariant
        gfull = np.broadcast_to(np.asarray(gravity_r, np.float64),
                                (nr, nlat, nlon))
        if not np.allclose(gfull, gfull[..., :1]):
            raise ValueError("fused kernel needs lon-invariant gravity")
        gr2 = gfull[..., 0]
        cosl = np.cos(np.asarray(geo.axes[1].centers, np.float64))
        dlon = 2.0 * np.pi / nlon
        dist_lon = rc * cosl[None, :] * dlon
        self.M = f(np.stack([
            1.0 / b2(geo.vol),                 # 0 1/vol
            area_r[:nr],                       # 1 ar_lo
            area_r[1:],                        # 2 ar_hi
            area_lat[:, :nlat],                # 3 alat_lo
            1.0 / (2.0 * dist_lon),            # 4 1/(2 dist_lon)
            b2(geo.face_area[2]),              # 5 alon
            1.0 / rc,                          # 6 1/r_c
            1.0 / (2.0 * rc * self.dlat),      # 7 1/(2 r_c dlat)
            gr2,                               # 8 g_r
            1.0 / (rc * cosl[None, :]) ** 2,   # 9 1/(r_c cos)^2
        ]))
        self.K = self.M.shape[0]

        # ---- lat-only closure constants ------------------------------
        latc = np.asarray(geo.axes[1].centers, np.float64)
        self.c_cos = f(cosl.reshape(1, nlat, 1))
        self.c_tan = f(np.tan(latc).reshape(1, nlat, 1))
        self.c_sin = f(np.sin(latc).reshape(1, nlat, 1))
        # ---- fused temperature transport ------------------------------
        # T is already streamed through the kernel for buoyancy; with
        # advect_T the same pass also produces the explicit transport
        # substep T - dt_T * (u . grad T) (the jnp oracle:
        # ops/stencil.py advect_scalar, form="advective"), sharing the
        # face velocities, metric channels and div(u) already in VMEM.
        self.advect_T = bool(advect_T)
        self.dt_T_factor = float(dt_T_factor)
        if self.advect_T:
            # Dirichlet wall value at the inner boundary (reference:
            # temperature constraints boussinesq_model.tpp:338-387)
            self.T_wall = np.ascontiguousarray(
                np.broadcast_to(np.asarray(T_wall, dtype),
                                (nlat, nlon))).astype(dtype)
        self._kernel_cache = {}

    # ------------------------------------------------------------------
    def _radial_halos(self, ch: jnp.ndarray, lo_sign, hi_sign) -> jnp.ndarray:
        """(nb, C, 4, nlat, nlon) halo rows for a (C, nr, ...) channel
        stack: rows 0:2 = the two cells (or wall ghosts) below the
        block, rows 2:4 = the two above. Matches the global pad_axis +
        _widen_to_2ghosts layout (outermost ghost replicated) exactly."""
        blk, nb = self.blk, self.nb
        lo_s = jnp.asarray(lo_sign, ch.dtype).reshape(-1, 1, 1, 1)
        hi_s = jnp.asarray(hi_sign, ch.dtype).reshape(-1, 1, 1, 1)
        g_lo = lo_s * ch[:, 0:1]          # (C, 1, nlat, nlon)
        g_hi = hi_s * ch[:, -1:]
        halos = []
        for i in range(nb):
            top = (jnp.concatenate([g_lo, g_lo], axis=1) if i == 0
                   else ch[:, i * blk - 2:i * blk])
            bot = (jnp.concatenate([g_hi, g_hi], axis=1) if i == nb - 1
                   else ch[:, (i + 1) * blk:(i + 1) * blk + 2])
            halos.append(jnp.concatenate([top, bot], axis=1))
        return jnp.stack(halos)

    def _T_halos(self, T: jnp.ndarray) -> jnp.ndarray:
        """(nb, 4, nlat, nlon) radial halo rows for the temperature:
        lo = Dirichlet mirror 2*T_wall - T[0] (outermost replicated, as
        _widen_to_2ghosts), hi = Neumann copy of T[-1]."""
        blk, nb = self.blk, self.nb
        g_lo = 2.0 * jnp.asarray(self.T_wall, T.dtype)[None] - T[0:1]
        g_hi = T[-1:]
        halos = []
        for i in range(nb):
            top = (jnp.concatenate([g_lo, g_lo], axis=0) if i == 0
                   else T[i * blk - 2:i * blk])
            bot = (jnp.concatenate([g_hi, g_hi], axis=0) if i == nb - 1
                   else T[(i + 1) * blk:(i + 1) * blk + 2])
            halos.append(jnp.concatenate([top, bot], axis=0))
        return jnp.stack(halos)

    def _f0_halo(self, f0: jnp.ndarray) -> jnp.ndarray:
        """(nb, 1, nlat, nlon): the radial face value at each block's
        upper seam (zero past the outer wall — the implicit hi-wall
        face of the cell-shaped staggered layout)."""
        blk, nb = self.blk, self.nb
        rows = [f0[(i + 1) * blk:(i + 1) * blk + 1] for i in range(nb - 1)]
        rows.append(jnp.zeros_like(f0[:1]))
        return jnp.stack(rows)

    # ------------------------------------------------------------------
    def __call__(self, u, u_faces, T, pres, dt):
        nr, nlat, nlon = self.shape
        blk, nb = self.blk, self.nb
        dtype = u.dtype
        # u and p stay SEPARATE kernel operands: a concatenated channel
        # stack would materialize a fresh 16 MB copy every step
        Hu = self._radial_halos(u, self._LO_SIGN[:3], self._HI_SIGN[:3])
        Hp = self._radial_halos(pres[None], self._LO_SIGN[3:],
                                self._HI_SIGN[3:])
        f0h = self._f0_halo(u_faces[0])
        dt_arr = jnp.asarray(dt, dtype).reshape(1, 1)

        key = (dtype.name,)
        call = self._kernel_cache.get(key)
        if call is None:
            call = self._build_call(dtype)
            self._kernel_cache[key] = call
        lat_c = jnp.asarray(np.stack([
            self.c_cos[0, :, 0], self.c_tan[0, :, 0], self.c_sin[0, :, 0],
        ]), dtype)
        if self.advect_T:
            HT = self._T_halos(T)
            return call(dt_arr, u, pres, Hu, Hp, HT, u_faces[0], f0h,
                        u_faces[1], u_faces[2], T,
                        jnp.asarray(self.M, dtype), lat_c)
        return call(dt_arr, u, pres, Hu, Hp, u_faces[0], f0h, u_faces[1],
                    u_faces[2], T, jnp.asarray(self.M, dtype), lat_c)

    # ------------------------------------------------------------------
    def _build_call(self, dtype):
        nr, nlat, nlon = self.shape
        blk, nb = self.blk, self.nb
        K = self.K
        scheme = self.scheme
        dr, dlat = self.dr, self.dlat
        beta, T_ref, rho_bg = self.s_beta, self.s_Tref, self.s_rho_bg
        iRe, omega = self.s_iRe, self.s_omega
        coriolis_mode, buoyancy = self.coriolis_mode, self.buoyancy
        include_gradp = self.include_gradp
        half = nlon // 2

        def flip_vec(g):
            """Pole sign pattern of the stacked velocity (leading axis
            [u_r, u_lat, u_lon]): POLE for u_r, POLE_FLIP for
            tangential components (the local basis flips across it)."""
            return jnp.concatenate([g[0:1], -g[1:3]], axis=0)

        def lat_shift(x, k, ghost):
            """Value at lat index j+k with pole-ghost fill, computed as
            an ALIGNED sublane roll + elementwise masked select instead
            of a concat+slice chain. pole_pad-style concats produce
            (nlat+4)-row misaligned layouts whose every slice costs a
            cross-sublane-tile relayout — measured as the structural
            floor of this kernel (PERF.md round-2). ``ghost`` is a
            broadcastable lat-ghost row (or 0.0); matches the
            _widen_to_2ghosts outermost-replicated convention because
            both ghost rows on a side carry the same value."""
            ax = x.ndim - 2
            r = jnp.roll(x, -k, axis=ax)
            idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, ax)
            cond = (idx >= nlat - k) if k > 0 else (idx < -k)
            return jnp.where(cond, ghost, r)

        def lat_ghosts(x, vec):
            """The two pole ghost rows: value at the antipodal meridian
            (half-turn lon roll), tangential components sign-flipped."""
            g_lo = jnp.roll(x[..., 0:1, :], half, axis=-1)
            g_hi = jnp.roll(x[..., -1:, :], half, axis=-1)
            if vec:
                g_lo, g_hi = flip_vec(g_lo), flip_vec(g_hi)
            return g_lo, g_hi

        def lat_face_values(x, uf, vec):
            """L/R-limited upwind values on the nlat lower faces along
            the lat axis — the roll-based equivalent of
            _muscl_faces(pole_pad2(x), ...). The ghost-cell slope is 0
            because both ghosts on a side are replicated (diff across
            the outer pole pair vanishes), so only +-1 shifts are
            needed. Returns (face_values, s_m1, s_p1) so the central
            d/dlat reuses the shifted copies."""
            g_lo, g_hi = lat_ghosts(x, vec)
            s_m1 = lat_shift(x, -1, g_lo)
            s_p1 = lat_shift(x, 1, g_hi)
            if scheme == "muscl":
                slope = _van_leer(x - s_m1, s_p1 - x)
                slope_m1 = lat_shift(slope, -1, 0.0)
                L = s_m1 + 0.5 * slope_m1
                R = x - 0.5 * slope
                fv = jnp.where(uf > 0, L, R)
            elif scheme == "upwind":
                fv = jnp.where(uf > 0, s_m1, x)
            else:
                fv = 0.5 * (s_m1 + x)
            return fv, s_m1, s_p1

        advect_T = self.advect_T
        dt_T_factor = self.dt_T_factor

        def kernel(dt_ref, u_ref, p_ref, Hu_ref, Hp_ref, *rest):
            if advect_T:
                (HT_ref, f0_ref, f0h_ref, f1_ref, f2_ref, T_ref_, M_ref,
                 lat_ref, out_ref, Tout_ref) = rest
            else:
                (f0_ref, f0h_ref, f1_ref, f2_ref, T_ref_, M_ref,
                 lat_ref, out_ref) = rest
            cosl = lat_ref[0].reshape(1, nlat, 1)
            tanl = lat_ref[1].reshape(1, nlat, 1)
            sinl = lat_ref[2].reshape(1, nlat, 1)
            dt = dt_ref[0, 0]
            u3 = u_ref[:]                        # (3, blk, nlat, nlon)
            pp = p_ref[:]                        # (blk, nlat, nlon)
            Hu = Hu_ref[0]                       # (3, 4, nlat, nlon)
            Hp = Hp_ref[0]                       # (1, 4, nlat, nlon)
            f0, f1, f2 = f0_ref[:], f1_ref[:], f2_ref[:]
            Tb = T_ref_[:]
            M = M_ref[:]                         # (K, blk, nlat)
            m = lambda k: M[k][:, :, None]       # (blk, nlat, 1)
            inv_vol, ar_lo, ar_hi = m(0), m(1), m(2)
            alat_lo = m(3)
            alon, inv_2dlon, inv_rc = m(5), m(4), m(6)
            inv_2rcdlat, g_r, inv_rcos2 = m(7), m(8), m(9)

            # ---------- radial (axis 0 of block) ----------------------
            p2r = jnp.concatenate([Hu[:, :2], u3, Hu[:, 2:]], axis=1)
            # MUSCL face values for blk+1 radial faces (incl. the upper
            # seam face, consumed by the shifted flux)
            f0_ext = jnp.concatenate([f0, f0h_ref[0]], axis=0)
            fv_r = _muscl_faces(p2r, f0_ext[None], 1, blk + 1, scheme)
            ar_ext = jnp.concatenate([ar_lo, ar_hi[-1:]], axis=0)
            aq_r = ar_ext * f0_ext[None] * fv_r
            adv_r = aq_r[:, 1:] - aq_r[:, :-1]
            dq_r = ar_ext * f0_ext
            div_r = dq_r[1:] - dq_r[:-1]

            # ---------- latitude (aligned rolls, no pad/concat) ---------
            fv_l, u_lm1, u_lp1 = lat_face_values(u3, f1[None], True)
            aq_l = alat_lo * f1[None] * fv_l
            # flux difference: value at face j+1 minus face j; the flux
            # through the upper pole face (j = nlat) is zero
            adv_l = lat_shift(aq_l, 1, 0.0) - aq_l
            dq_l = alat_lo * f1
            div_l = lat_shift(dq_l, 1, 0.0) - dq_l

            # ---------- longitude (periodic rolls) ---------------------
            if scheme == "muscl":
                d_m = u3 - jnp.roll(u3, 1, axis=3)
                d_p = jnp.roll(u3, -1, axis=3) - u3
                slope = _van_leer(d_m, d_p)
                L = jnp.roll(u3, 1, axis=3) + 0.5 * jnp.roll(slope, 1, axis=3)
                R = u3 - 0.5 * slope
                fv_o = jnp.where(f2[None] > 0, L, R)
            elif scheme == "upwind":
                fv_o = jnp.where(f2[None] > 0, jnp.roll(u3, 1, axis=3), u3)
            else:
                fv_o = 0.5 * (jnp.roll(u3, 1, axis=3) + u3)
            aq_o = alon * f2[None] * fv_o
            adv_o = jnp.roll(aq_o, -1, axis=3) - aq_o
            dq_o = alon * f2                      # rank 3: lon axis = 2
            div_o = jnp.roll(dq_o, -1, axis=2) - dq_o

            div_u = (div_r + div_l + div_o) * inv_vol
            adv = (adv_r + adv_l + adv_o) * inv_vol - u3 * div_u[None]

            # ---------- curvature of (u.grad)u -------------------------
            ur, ul, up = u3[0], u3[1], u3[2]
            adv = adv + inv_rc * jnp.stack([
                -(ul * ul + up * up),
                ur * ul + up * up * tanl,
                ur * up - ul * up * tanl,
            ])

            # ---------- Coriolis ---------------------------------------
            if coriolis_mode == "physical":
                om_r = omega * sinl
                om_l = omega * cosl
                cor = jnp.stack([
                    2.0 * om_l * up,
                    -2.0 * om_r * up,
                    2.0 * (om_r * ul - om_l * ur),
                ])
            else:  # reference: no Coriolis in the 3D shell standard path
                cor = jnp.zeros_like(u3)

            # ---------- buoyancy ---------------------------------------
            rho = 1.0 - beta * (Tb - T_ref)
            if buoyancy == "perturbation":
                buoy_r = (rho - rho_bg) * g_r
            else:
                buoy_r = rho * g_r
            zero = jnp.zeros_like(buoy_r)
            buoy = jnp.stack([buoy_r, zero, zero])

            # ---------- viscous curvature corrections ------------------
            # physical angular derivatives via the +-1 lat shifts
            # already computed for the face values
            d_lat = lambda c: (u_lp1[c] - u_lm1[c]) * inv_2rcdlat
            d_lon = lambda c: ((jnp.roll(u3[c], -1, axis=2)
                                - jnp.roll(u3[c], 1, axis=2))
                               * inv_2dlon)
            dlat_ur, dlat_ul = d_lat(0), d_lat(1)
            dlon_ur, dlon_ul, dlon_up = d_lon(0), d_lon(1), d_lon(2)
            tl_rc = tanl * inv_rc
            visc = iRe * jnp.stack([
                -2.0 * ur * inv_rc * inv_rc
                - 2.0 * inv_rc * (dlat_ul + dlon_up) + 2.0 * ul * tl_rc * inv_rc,
                2.0 * inv_rc * dlat_ur - ul * inv_rcos2
                + 2.0 * tl_rc * dlon_up,
                2.0 * inv_rc * dlon_ur - 2.0 * tl_rc * dlon_ul
                - up * inv_rcos2,
            ])

            forcing = -adv + cor + buoy + visc

            # ---------- pressure gradient ------------------------------
            if include_gradp:
                # p with +-1 radial ghosts (halo rows 1 and 2 are the
                # nearest below/above-block cells or wall ghosts)
                ppr = jnp.concatenate([Hp[0, 1:2], pp, Hp[0, 2:3]], axis=0)
                gp_r = (ppr[2:] - ppr[:-2]) * (1.0 / (2.0 * dr))
                gp_lo, gp_hi = lat_ghosts(pp, False)
                gp_l = (lat_shift(pp, 1, gp_hi)
                        - lat_shift(pp, -1, gp_lo)) * inv_2rcdlat
                gp_o = (jnp.roll(pp, -1, axis=2)
                        - jnp.roll(pp, 1, axis=2)) * inv_2dlon
                forcing = forcing - jnp.stack([gp_r, gp_l, gp_o])

            out_ref[:] = u3 + dt * forcing

            # ---------- fused temperature transport --------------------
            # T - dt_T * (u . grad T) in the SAME pass: T, the face
            # velocities, the metric channels and div_u are already in
            # VMEM (jnp oracle: advect_scalar form="advective")
            if advect_T:
                HT = HT_ref[0]                   # (4, nlat, nlon)
                p2rT = jnp.concatenate([HT[:2], Tb, HT[2:]], axis=0)
                fv_rT = _muscl_faces(p2rT, f0_ext, 0, blk + 1, scheme)
                aq_rT = ar_ext * f0_ext * fv_rT
                adv_rT = aq_rT[1:] - aq_rT[:-1]

                fv_lT, _, _ = lat_face_values(Tb, f1, False)
                aq_lT = alat_lo * f1 * fv_lT
                adv_lT = lat_shift(aq_lT, 1, 0.0) - aq_lT

                if scheme == "muscl":
                    d_mT = Tb - jnp.roll(Tb, 1, axis=2)
                    d_pT = jnp.roll(Tb, -1, axis=2) - Tb
                    slopeT = _van_leer(d_mT, d_pT)
                    LT = (jnp.roll(Tb, 1, axis=2)
                          + 0.5 * jnp.roll(slopeT, 1, axis=2))
                    RT = Tb - 0.5 * slopeT
                    fv_oT = jnp.where(f2 > 0, LT, RT)
                elif scheme == "upwind":
                    fv_oT = jnp.where(f2 > 0, jnp.roll(Tb, 1, axis=2), Tb)
                else:
                    fv_oT = 0.5 * (jnp.roll(Tb, 1, axis=2) + Tb)
                aq_oT = alon * f2 * fv_oT
                adv_oT = jnp.roll(aq_oT, -1, axis=2) - aq_oT

                adv_T_ = ((adv_rT + adv_lT + adv_oT) * inv_vol
                          - Tb * div_u)
                Tout_ref[:] = Tb - (dt * dt_T_factor) * adv_T_

        bspec = lambda shape, imap: pl.BlockSpec(shape, imap,
                                                 memory_space=pltpu.VMEM)
        fld = lambda: bspec((blk, nlat, nlon), lambda i: (i, 0, 0))
        in_specs = [
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),          # dt
            bspec((3, blk, nlat, nlon), lambda i: (0, i, 0, 0)),   # u
            fld(),                                           # p
            bspec((1, 3, 4, nlat, nlon),
                  lambda i: (i, 0, 0, 0, 0)),                # u halos
            bspec((1, 1, 4, nlat, nlon),
                  lambda i: (i, 0, 0, 0, 0)),                # p halos
        ]
        if advect_T:
            in_specs.append(
                bspec((1, 4, nlat, nlon), lambda i: (i, 0, 0, 0)))  # T halos
        in_specs += [
            fld(),                                           # f0
            bspec((1, 1, nlat, nlon), lambda i: (i, 0, 0, 0)),  # f0 halo
            fld(),                                           # f1
            fld(),                                           # f2
            fld(),                                           # T
            bspec((K, blk, nlat), lambda i: (0, i, 0)),      # metrics
            bspec((3, nlat), lambda i: (0, 0)),              # lat consts
        ]
        u_out = bspec((3, blk, nlat, nlon), lambda i: (0, i, 0, 0))
        if advect_T:
            out_specs = [u_out, fld()]
            out_shape = [jax.ShapeDtypeStruct((3, nr, nlat, nlon), dtype),
                         jax.ShapeDtypeStruct((nr, nlat, nlon), dtype)]
        else:
            out_specs = u_out
            out_shape = jax.ShapeDtypeStruct((3, nr, nlat, nlon), dtype)
        grid_spec = pl.GridSpec(grid=(nb,), in_specs=in_specs,
                                out_specs=out_specs)

        def call(dt_arr, *ops):
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=out_shape,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=VMEM_LIMIT_MB * 1024 * 1024),
                interpret=self.interpret,
            )(dt_arr, *ops)

        return call


class ShellProjectionPallas:
    """Fused pre/post-Poisson projection stages for the shell:

      faces_div: u* -> staggered face velocities (Rhie-Chow interp +
                 wall zeros) and the raw Poisson RHS -vol*div(u*)/dt
                 with per-block partial sums (the caller finishes the
                 compatibility mean-subtraction);
      correct:   (u*, faces, phi, p) -> divergence-free corrected
                 faces, cell-centered velocity and updated pressure.

    Measured on TPU v5e at 32x128x256 (slope timing through the axon
    tunnel): faces_div 0.028 ms vs 0.033 ms for the jnp chain (small
    win — the model uses it); correct 0.102 ms vs 0.020 ms for the jnp
    chain (XLA fuses that elementwise/slice chain into ~2 passes, so
    the model keeps the jnp path and `correct` stays as an
    equivalence-tested alternative for platforms where XLA fuses
    worse). jnp oracle: the corresponding blocks of
    models/boussinesq.py _solve_momentum_projection."""

    def __init__(self, geo: Geometry, *, dtype=np.float32,
                 incremental: bool, block_rows: Optional[int] = None,
                 interpret: bool = False):
        assert geo.kind == "shell"
        self.geo = geo
        nr, nlat, nlon = geo.cell_shape
        self.shape = (nr, nlat, nlon)
        if block_rows is None:
            block_rows = next((b for b in (8, 16) if nr % b == 0), nr)
        self.blk = block_rows
        self.nb = nr // block_rows
        self.interpret = interpret
        self.incremental = incremental
        self.dr = float(np.asarray(geo.face_dist[0]).flat[0])
        self.dlat = float(np.pi / nlat)
        f = lambda a: np.asarray(a, dtype=dtype)
        b2 = lambda a: np.broadcast_to(np.asarray(a, np.float64)[..., 0],
                                       (nr, nlat))
        area_r = np.broadcast_to(np.asarray(geo.face_area[0], np.float64),
                                 (nr + 1, nlat, 1))[..., 0]
        area_lat = np.broadcast_to(np.asarray(geo.face_area[1], np.float64),
                                   (nr, nlat + 1, 1))[..., 0]
        rc = np.broadcast_to(geo.extras["r_centers"], (nr, nlat, 1))[..., 0]
        cosl = np.cos(np.asarray(geo.axes[1].centers, np.float64))
        dlon = 2.0 * np.pi / nlon
        self.M = f(np.stack([
            b2(geo.vol),                 # 0 vol
            area_r[:nr],                 # 1 ar_lo
            area_r[1:],                  # 2 ar_hi
            area_lat[:, :nlat],          # 3 alat_lo
            b2(geo.face_area[2]),        # 4 alon
            rc * cosl[None, :] * dlon,   # 5 dist_lon
            rc,                          # 6 r_c
        ]))
        self._cache = {}

    # -- XLA-side halo builders ----------------------------------------
    def _row_halo(self, x, lo_sign, hi_sign):
        """(nb, 2, nlat, nlon): the single row below / above each block
        (wall BC ghost rows at the domain ends)."""
        blk, nb = self.blk, self.nb
        rows = []
        for i in range(nb):
            below = (lo_sign * x[0:1] if i == 0 else x[i * blk - 1:i * blk])
            above = (hi_sign * x[-1:] if i == nb - 1
                     else x[(i + 1) * blk:(i + 1) * blk + 1])
            rows.append(jnp.concatenate([below, above], axis=0))
        return jnp.stack(rows)

    # ------------------------------------------------------------------
    def faces_div(self, u_star, dt):
        nr, nlat, nlon = self.shape
        dtype = u_star.dtype
        u0h = self._row_halo(u_star[0], -1.0, -1.0)   # ANTISYM both walls
        dt_arr = jnp.asarray(dt, dtype).reshape(1, 1)
        call = self._get(dtype, "faces_div")
        return call(dt_arr, u_star, u0h, jnp.asarray(self.M, dtype))

    def correct(self, u_star, uf, phi, pres, dt, phi_mean):
        nr, nlat, nlon = self.shape
        dtype = u_star.dtype
        phih = self._row_halo(phi, 1.0, 1.0)          # NEUMANN both walls
        dt_arr = jnp.asarray(dt, dtype).reshape(1, 1)
        pm = jnp.asarray(phi_mean, dtype).reshape(1, 1)
        call = self._get(dtype, "correct")
        return call(dt_arr, pm, u_star, phi, phih, uf[0], uf[1], uf[2],
                    pres, jnp.asarray(self.M, dtype))

    def _get(self, dtype, which):
        key = (dtype.name, which)
        if key not in self._cache:
            self._cache[key] = (self._build_faces_div(dtype)
                                if which == "faces_div"
                                else self._build_correct(dtype))
        return self._cache[key]

    # ------------------------------------------------------------------
    def _build_faces_div(self, dtype):
        nr, nlat, nlon = self.shape
        blk, nb = self.blk, self.nb
        half = nlon // 2

        def kernel(dt_ref, u_ref, u0h_ref, M_ref,
                   uf0_ref, uf1_ref, uf2_ref, rhs_ref, psum_ref):
            i = pl.program_id(0)
            dt = dt_ref[0, 0]
            u0, u1, u2 = u_ref[0], u_ref[1], u_ref[2]
            M = M_ref[:]
            m = lambda k: M[k][:, :, None]
            vol, ar_lo, ar_hi, alat_lo, alon = (m(0), m(1), m(2), m(3), m(4))

            # radial faces incl. the upper seam (blk+1 rows); the
            # antisym wall ghosts make the global wall faces exactly 0
            u0e = jnp.concatenate(
                [u0h_ref[0, 0:1], u0, u0h_ref[0, 1:2]], axis=0)
            uf0e = 0.5 * (u0e[:-1] + u0e[1:])
            ridx = (jax.lax.broadcasted_iota(jnp.int32, (blk + 1, 1, 1), 0)
                    + i * blk)
            uf0e = jnp.where(ridx == 0, jnp.zeros_like(uf0e), uf0e)

            # latitude faces (left): POLE_FLIP ghost for u_lat
            g_lo = -jnp.roll(u1[:, 0:1, :], half, axis=-1)
            p1 = jnp.concatenate([g_lo, u1], axis=1)
            uf1 = 0.5 * (p1[:, :nlat, :] + p1[:, 1:nlat + 1, :])
            uf1 = jnp.concatenate(
                [jnp.zeros_like(uf1[:, :1, :]), uf1[:, 1:, :]], axis=1)

            # longitude faces (periodic)
            uf2 = 0.5 * (jnp.roll(u2, 1, axis=2) + u2)

            ar_e = jnp.concatenate([ar_lo, ar_hi[-1:]], axis=0)
            aq_r = ar_e * uf0e
            aq_l = alat_lo * uf1
            aq_o = alon * uf2
            zrow = jnp.zeros_like(aq_l[:, :1, :])
            div = (aq_r[1:] - aq_r[:-1]
                   + jnp.concatenate([aq_l[:, 1:, :], zrow], axis=1) - aq_l
                   + jnp.roll(aq_o, -1, axis=2) - aq_o) / vol
            rhs = -vol * div / dt
            uf0_ref[:] = uf0e[:blk]
            uf1_ref[:] = uf1
            uf2_ref[:] = uf2
            rhs_ref[:] = rhs
            psum_ref[:] = jnp.sum(rhs).reshape(1, 1, 1)

        bspec = lambda shape, imap: pl.BlockSpec(shape, imap,
                                                 memory_space=pltpu.VMEM)
        fld = bspec((blk, nlat, nlon), lambda i: (i, 0, 0))
        grid_spec = pl.GridSpec(
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                bspec((3, blk, nlat, nlon), lambda i: (0, i, 0, 0)),
                bspec((1, 2, nlat, nlon), lambda i: (i, 0, 0, 0)),
                bspec((7, blk, nlat), lambda i: (0, i, 0)),
            ],
            out_specs=[fld, fld, fld, fld,
                       bspec((1, 1, 1), lambda i: (i, 0, 0))],
        )

        def call(dt_arr, u_star, u0h, M):
            shp = jax.ShapeDtypeStruct((nr, nlat, nlon), dtype)
            return pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=[shp, shp, shp, shp,
                           jax.ShapeDtypeStruct((nb, 1, 1), dtype)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=VMEM_LIMIT_MB * 1024 * 1024),
                interpret=self.interpret,
            )(dt_arr, u_star, u0h, M)

        return call

    # ------------------------------------------------------------------
    def _build_correct(self, dtype):
        nr, nlat, nlon = self.shape
        blk, nb = self.blk, self.nb
        half = nlon // 2
        dr, dlat = self.dr, self.dlat
        incremental = self.incremental

        def kernel(dt_ref, pm_ref, u_ref, phi_ref, phih_ref,
                   uf0_ref, uf1_ref, uf2_ref, pres_ref, M_ref,
                   un_ref, f0_ref, f1_ref, f2_ref, pn_ref):
            i = pl.program_id(0)
            dt = dt_ref[0, 0]
            pm = pm_ref[0, 0]
            M = M_ref[:]
            m = lambda k: M[k][:, :, None]
            dist_lon, r_c = m(5), m(6)
            phi = phi_ref[:] - pm
            phie = jnp.concatenate(
                [phih_ref[0, 0:1] - pm, phi, phih_ref[0, 1:2] - pm], axis=0)

            # left-face gradients of phi
            gl_r = (phie[1:blk + 1] - phie[:blk]) / dr
            g_lo = jnp.roll(phi[:, 0:1, :], half, axis=-1)   # POLE
            g_hi = jnp.roll(phi[:, -1:, :], half, axis=-1)
            pl1 = jnp.concatenate([g_lo, phi], axis=1)
            gl_l = (pl1[:, 1:nlat + 1, :] - pl1[:, :nlat, :]) / (r_c * dlat)
            gl_o = (phi - jnp.roll(phi, 1, axis=2)) / dist_lon

            ridx = (jax.lax.broadcasted_iota(jnp.int32, (blk, 1, 1), 0)
                    + i * blk)
            f0n = uf0_ref[:] - dt * gl_r
            f0n = jnp.where(ridx == 0, jnp.zeros_like(f0n), f0n)
            f1n = uf1_ref[:] - dt * gl_l
            f1n = jnp.concatenate(
                [jnp.zeros_like(f1n[:, :1, :]), f1n[:, 1:, :]], axis=1)
            f2n = uf2_ref[:] - dt * gl_o

            # centered gradients -> cell velocity correction
            gc_r = (phie[2:] - phie[:-2]) / (2.0 * dr)
            pl2 = jnp.concatenate([g_lo, phi, g_hi], axis=1)
            gc_l = (pl2[:, 2:, :] - pl2[:, :-2, :]) / (2.0 * r_c * dlat)
            gc_o = (jnp.roll(phi, -1, axis=2)
                    - jnp.roll(phi, 1, axis=2)) / (2.0 * dist_lon)
            un_ref[:] = u_ref[:] - dt * jnp.stack([gc_r, gc_l, gc_o])
            f0_ref[:] = f0n
            f1_ref[:] = f1n
            f2_ref[:] = f2n
            if incremental:
                pn_ref[:] = pres_ref[:] + phi
            else:
                pn_ref[:] = jnp.broadcast_to(phi, pn_ref.shape)

        bspec = lambda shape, imap: pl.BlockSpec(shape, imap,
                                                 memory_space=pltpu.VMEM)
        fld = bspec((blk, nlat, nlon), lambda i: (i, 0, 0))
        smem = pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
        grid_spec = pl.GridSpec(
            grid=(nb,),
            in_specs=[
                smem, smem,
                bspec((3, blk, nlat, nlon), lambda i: (0, i, 0, 0)),
                fld,
                bspec((1, 2, nlat, nlon), lambda i: (i, 0, 0, 0)),
                fld, fld, fld, fld,
                bspec((7, blk, nlat), lambda i: (0, i, 0)),
            ],
            out_specs=[bspec((3, blk, nlat, nlon), lambda i: (0, i, 0, 0)),
                       fld, fld, fld, fld],
        )

        def call(dt_arr, pm, u_star, phi, phih, uf0, uf1, uf2, pres, M):
            shp = jax.ShapeDtypeStruct((nr, nlat, nlon), dtype)
            return pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=[jax.ShapeDtypeStruct((3, nr, nlat, nlon), dtype),
                           shp, shp, shp, shp],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=VMEM_LIMIT_MB * 1024 * 1024),
                interpret=self.interpret,
            )(dt_arr, pm, u_star, phi, phih, uf0, uf1, uf2, pres, M)

        return call


def make_shell_projection(geo: Geometry, model, *, interpret: bool = False,
                          use_pallas: Optional[bool] = None):
    """Gate the fused projection kernels; None -> jnp path."""
    if geo.kind != "shell":
        return None
    nr, nlat, nlon = geo.cell_shape
    if use_pallas is None:
        from dycoreplanet_tpu.ops import pallas_kernels

        ov = pallas_kernels._use_pallas_override
        use_pallas = ov if ov is not None else supports_pallas()
    if not use_pallas and not interpret:
        return None
    if not interpret and (nlon % 128 != 0 or nlat % 8 != 0):
        return None
    return ShellProjectionPallas(
        geo, dtype=model.dtype,
        incremental=model.params.numerics.projection == "incremental",
        interpret=interpret)


def make_shell_forcing(geo: Geometry, model, *, interpret: bool = False,
                       use_pallas: Optional[bool] = None):
    """Factory gating the fused kernel to supported configurations;
    returns None when the jnp path should be used."""
    if geo.kind != "shell":
        return None
    if model.advection_form != "advective":
        return None  # FEEC rotational form keeps the jnp path (for now)
    nr, nlat, nlon = geo.cell_shape
    if use_pallas is None:
        from dycoreplanet_tpu.ops import pallas_kernels

        ov = pallas_kernels._use_pallas_override
        use_pallas = ov if ov is not None else supports_pallas()
    if not use_pallas and not interpret:
        return None
    if not interpret and (nlon % 128 != 0 or nlat % 8 != 0):
        return None  # sub-tile shapes: not worth engaging Mosaic
    # uniform radial spacing is a factory invariant for the shell; the
    # kernel additionally assumes the gravity field is radial-only
    include_gradp = model.params.numerics.projection == "incremental"
    # fuse the explicit temperature transport when it shares the
    # kernel's scheme (Eulerian MUSCL/upwind/centered with the standard
    # shell Dirichlet-inner/Neumann-outer walls)
    from dycoreplanet_tpu.ops.bc import BC

    t_spec = model.T_specs[0]
    advect_T = (model.params.numerics.temperature_advection == "eulerian"
                and t_spec is not None
                and t_spec.lo == BC.DIRICHLET and t_spec.hi == BC.NEUMANN)
    return ShellForcingPallas(
        geo, dtype=model.dtype,
        beta=model.beta, T_ref=model.T_ref,
        rho_background=model.rho_background,
        gravity_r=np.asarray(model.gravity[0]),
        one_over_Re=model.one_over_Re,
        omega_hat=model.omega_hat,
        coriolis_mode=model.coriolis_mode,
        buoyancy=model.params.numerics.buoyancy,
        scheme=model.advection_scheme,
        include_gradp=include_gradp,
        advect_T=advect_T,
        T_wall=(t_spec.lo_value if advect_T else None),
        dt_T_factor=1.0 / model.params.NSE_solver_interval,
        interpret=interpret,
    )
