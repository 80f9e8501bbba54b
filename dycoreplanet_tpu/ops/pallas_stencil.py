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
                 interpret: bool = False,
                 halo_mode: str = "local",
                 local_shape: Optional[tuple] = None):
        """``halo_mode``:
          * "local"     — single-device kernel: lat pole closure and lon
            periodic wrap are computed in-kernel (roll-based);
          * "operands"  — the lat/lon ghost layers arrive as explicit
            kernel operands (built by the caller — either locally for
            testing, or from `parallel.halo.exchange_ghosts` ppermutes
            under shard_map for the multi-chip path; VERDICT r2 item 3).
        ``local_shape``: the per-shard cell shape (operands mode on a
        sharded mesh — the caller passes per-shard metric slices to
        __call__ via the ``M``/``lat_c`` overrides)."""
        assert geo.kind == "shell"
        assert halo_mode in ("local", "operands")
        self.halo_mode = halo_mode
        self.geo = geo
        nr, nlat, nlon = local_shape or geo.cell_shape
        self.shape = (nr, nlat, nlon)
        if block_rows is None:
            # Mosaic block constraint: the metric stack's second-to-last
            # block dim (blk) must be a multiple of 8 or the full extent.
            # blk=8 stays the default: blk=16 measured FASTER standalone
            # (0.175 vs 0.211 ms at 32x128x256 muscl) but 15% SLOWER
            # inside the scanned full step (0.643 vs 0.545 end-to-end,
            # r4 A/B) — its 113.8 MB scoped-VMEM footprint starves the
            # scheduler once the step's other buffers are live.
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
        # metric channels are built at GLOBAL extents; in operands mode
        # on a sharded mesh the caller passes per-shard slices to
        # __call__ (self.shape is the per-shard extent)
        nr_g, nlat_g, nlon_g = geo.cell_shape
        assert nr == nr_g, "the radial axis is never sharded"

        # ---- static scalars -----------------------------------------
        self.s_beta = float(beta)
        self.s_Tref = float(T_ref)
        self.s_rho_bg = float(rho_background)
        self.s_iRe = float(one_over_Re)
        self.s_omega = float(omega_hat)
        self.dr = float(np.asarray(geo.face_dist[0]).flat[0])
        self.dlat = float(np.pi / nlat_g)

        # ---- metric channel stack (K, nr, nlat) ----------------------
        # Divides dominate the kernel's VPU time (measured ~3x above the
        # HBM traffic bound with plain x/metric divides), so every
        # metric that only ever appears in a denominator is stored as
        # its host-precomputed RECIPROCAL and applied by multiply. The
        # only remaining divides are the data-dependent van Leer slopes.
        b2 = lambda a: np.broadcast_to(np.asarray(a, np.float64)[..., 0],
                                       (nr, nlat_g))
        area_r = np.broadcast_to(np.asarray(geo.face_area[0], np.float64),
                                 (nr + 1, nlat_g, 1))[..., 0]
        area_lat = np.broadcast_to(np.asarray(geo.face_area[1], np.float64),
                                   (nr, nlat_g + 1, 1))[..., 0]
        rc = np.broadcast_to(geo.extras["r_centers"],
                             (nr, nlat_g, 1))[..., 0]
        # radial gravity profile: the shell metric (and the reference's
        # radial gravity, core_model_data.tpp:97-106) is lon-invariant
        gfull = np.broadcast_to(np.asarray(gravity_r, np.float64),
                                (nr, nlat_g, nlon_g))
        if not np.allclose(gfull, gfull[..., :1]):
            raise ValueError("fused kernel needs lon-invariant gravity")
        gr2 = gfull[..., 0]
        cosl = np.cos(np.asarray(geo.axes[1].centers, np.float64))
        dlon = 2.0 * np.pi / nlon_g
        dist_lon = rc * cosl[None, :] * dlon
        self.M = f(np.stack([
            1.0 / b2(geo.vol),                 # 0 1/vol
            area_r[:nr],                       # 1 ar_lo
            area_r[1:],                        # 2 ar_hi
            area_lat[:, :nlat_g],              # 3 alat_lo
            1.0 / (2.0 * dist_lon),            # 4 1/(2 dist_lon)
            b2(geo.face_area[2]),              # 5 alon
            1.0 / rc,                          # 6 1/r_c
            1.0 / (2.0 * rc * self.dlat),      # 7 1/(2 r_c dlat)
            gr2,                               # 8 g_r
            1.0 / (rc * cosl[None, :]) ** 2,   # 9 1/(r_c cos)^2
            area_lat[:, 1:],                   # 10 alat_hi (seam fluxes)
        ]))
        self.K = self.M.shape[0]

        # ---- lat-only closure constants ------------------------------
        latc = np.asarray(geo.axes[1].centers, np.float64)
        self.c_cos = f(cosl.reshape(1, nlat_g, 1))
        self.c_tan = f(np.tan(latc).reshape(1, nlat_g, 1))
        self.c_sin = f(np.sin(latc).reshape(1, nlat_g, 1))
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
                                (nlat_g, nlon_g))).astype(dtype)
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

    def _T_halos(self, T: jnp.ndarray, T_wall=None) -> jnp.ndarray:
        """(nb, 4, nlat, nlon) radial halo rows for the temperature:
        lo = Dirichlet mirror 2*T_wall - T[0] (outermost replicated, as
        _widen_to_2ghosts), hi = Neumann copy of T[-1]."""
        blk, nb = self.blk, self.nb
        if T_wall is None:
            T_wall = self.T_wall
        g_lo = 2.0 * jnp.asarray(T_wall, T.dtype)[None] - T[0:1]
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
    def __call__(self, u, u_faces, T, pres, dt, *,
                 halos=None, M=None, lat_c=None, T_wall=None):
        """Fused explicit stage.

        ``halos`` (operands mode only) is the dict produced by
        ``build_local_halos`` or the shard_map wrapper
        (parallel/sharded_pallas.py): keys HLu, HLp, HLf1 [, HLT] for
        the 4/2/1-row latitude ghosts and HOu, HOp, HOf2 [, HOT] for
        the longitude ghost columns. ``M``/``lat_c``/``T_wall`` override
        the global metric stacks with per-shard slices."""
        nr, nlat, nlon = self.shape
        blk, nb = self.blk, self.nb
        dtype = u.dtype
        assert (halos is not None) == (self.halo_mode == "operands")
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
        if M is None:
            M = jnp.asarray(self.M, dtype)
        if lat_c is None:
            lat_c = jnp.asarray(np.stack([
                self.c_cos[0, :, 0], self.c_tan[0, :, 0],
                self.c_sin[0, :, 0],
            ]), dtype)
        ops = [dt_arr, u, pres, Hu, Hp]
        if self.advect_T:
            ops.append(self._T_halos(T, T_wall))
        ops += [u_faces[0], f0h, u_faces[1], u_faces[2], T, M, lat_c]
        if self.halo_mode == "operands":
            ops += [halos["HLu"], halos["HLp"], halos["HLf1"],
                    halos["HOu"], halos["HOp"], halos["HOf2"]]
            if self.advect_T:
                ops += [halos["HLT"], halos["HOT"]]
        return call(*ops)

    # ------------------------------------------------------------------
    def build_local_halos(self, u, u_faces, T, pres):
        """Operands-mode ghost layers for a SINGLE-device (whole-grid)
        field set: latitude ghosts from the pole closure (half-turn lon
        roll, tangential sign flip), longitude ghosts from the periodic
        wrap. The shard_map wrapper builds the same layout from
        ppermutes; this local builder makes the operands-mode kernel
        testable 1-device vs the in-kernel ("local") closure."""
        nr, nlat, nlon = self.shape
        half = nlon // 2

        def pole_rows(x, vec):
            lo = jnp.roll(x[..., 0:1, :], half, axis=-1)
            hi = jnp.roll(x[..., -1:, :], half, axis=-1)
            if vec:
                lo = jnp.concatenate([lo[0:1], -lo[1:3]], axis=0)
                hi = jnp.concatenate([hi[0:1], -hi[1:3]], axis=0)
            return lo, hi

        ax = lambda x: x.ndim - 2  # lat axis

        def lat4(x, vec):
            lo, hi = pole_rows(x, vec)
            # rows [g_m2, g_m1, g_p1, g_p2]; the pole ghosts replicate
            # the outermost value (matching _widen_to_2ghosts)
            return jnp.concatenate([lo, lo, hi, hi], axis=ax(x))

        def lon4(x):
            a = x.ndim - 1
            sl = lambda s: jax.lax.slice_in_dim(x, *s, axis=a)
            return jnp.concatenate(
                [sl((nlon - 2, nlon - 1)), sl((nlon - 1, nlon)),
                 sl((0, 1)), sl((1, 2))], axis=a)

        u1, u2 = u_faces[1], u_faces[2]
        halos = {
            "HLu": lat4(u, True),
            "HLp": jnp.concatenate(pole_rows(pres, False),
                                   axis=pres.ndim - 2),
            # the flux through the pole face is zero: zero f1 seam row
            "HLf1": jnp.zeros_like(u1[..., :1, :]),
            "HOu": lon4(u),
            "HOp": jnp.concatenate(
                [jax.lax.slice_in_dim(pres, nlon - 1, nlon, axis=2),
                 jax.lax.slice_in_dim(pres, 0, 1, axis=2)], axis=2),
            "HOf2": jax.lax.slice_in_dim(u2, 0, 1, axis=2),
        }
        if self.advect_T:
            halos["HLT"] = lat4(T, False)
            halos["HOT"] = lon4(T)
        return halos

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

        operands = self.halo_mode == "operands"

        def lat_ghosts(x, vec):
            """Local-mode pole ghost rows: value at the antipodal
            meridian (half-turn lon roll), tangential sign-flipped."""
            g_lo = jnp.roll(x[..., 0:1, :], half, axis=-1)
            g_hi = jnp.roll(x[..., -1:, :], half, axis=-1)
            if vec:
                g_lo, g_hi = flip_vec(g_lo), flip_vec(g_hi)
            return g_lo, g_hi

        def lon_shift(x, k, ghost):
            """Value at lon index i+k. Local mode: the periodic wrap IS
            the correct closure, so this is a plain lane roll (ghost
            ignored). Operands mode: roll + masked edge fill from the
            ghost column, mirroring lat_shift."""
            a = x.ndim - 1
            r = jnp.roll(x, -k, axis=a)
            if not operands:
                return r
            idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, a)
            cond = (idx >= nlon - k) if k > 0 else (idx < -k)
            return jnp.where(cond, ghost, r)

        def row(x, j):
            a = x.ndim - 2
            return jax.lax.slice_in_dim(x, j % nlat, j % nlat + 1, axis=a)

        def col(x, i):
            a = x.ndim - 1
            return jax.lax.slice_in_dim(x, i % nlon, i % nlon + 1, axis=a)

        def upwind_face(vL, vR, sL, sR, uf):
            """Face value from left/right cell values + slopes."""
            if scheme == "muscl":
                return jnp.where(uf > 0, vL + 0.5 * sL, vR - 0.5 * sR)
            if scheme == "upwind":
                return jnp.where(uf > 0, vL, vR)
            return 0.5 * (vL + vR)

        def transverse_advect(x, uf, axis, g_m2, g_m1, g_p1, g_p2,
                              uf_seam, a_lo, a_hi):
            """Flux-difference advection along a sharded transverse axis
            (lat or lon) with explicit ghost layers:

                adv_j = a(face j+1) uf(face j+1) fv(face j+1)
                      - a(face j)   uf(face j)   fv(face j)

            ``uf`` holds the nlat/nlon LOWER-face velocities of this
            shard; ``uf_seam`` the first face of the next shard (the
            pole-face flux is killed by uf_seam = 0 / a_hi = 0 in local
            mode). Returns (adv, div_contrib, s_m1, s_p1)."""
            shift = lat_shift if axis == "lat" else lon_shift
            edge_lo = row if axis == "lat" else col
            # ghosts participate unless this is the local-mode periodic
            # lon axis, where the lane roll IS the exact closure
            ghosted = operands or axis == "lat"
            s_m1 = shift(x, -1, g_m1)
            s_p1 = shift(x, 1, g_p1)
            if scheme == "muscl":
                slope = _van_leer(x - s_m1, s_p1 - x)
                if ghosted:
                    # ghost-cell slopes from the ghost pairs (local lat:
                    # both pole ghosts are equal so this is exactly 0)
                    slope_gm1 = _van_leer(g_m1 - g_m2,
                                          edge_lo(x, 0) - g_m1)
                    slope_gp1 = _van_leer(g_p1 - edge_lo(x, -1),
                                          g_p2 - g_p1)
                else:
                    slope_gm1 = slope_gp1 = None
                slope_m1 = shift(slope, -1, slope_gm1)
                s_last = edge_lo(slope, -1)
            else:
                slope = slope_m1 = slope_gp1 = s_last = None
            fv = upwind_face(s_m1, x, slope_m1, slope, uf)
            aq = a_lo * uf * fv
            dq = a_lo * uf
            if ghosted:
                # seam face: left cell = our last row/col, right = g_p1
                fv_seam = upwind_face(edge_lo(x, -1), g_p1, s_last,
                                      slope_gp1, uf_seam)
                flux_hi = a_hi * uf_seam * fv_seam
                adv = shift(aq, 1, flux_hi) - aq
                div = shift(dq, 1, a_hi * uf_seam) - dq
            else:
                adv = shift(aq, 1, None) - aq
                div = shift(dq, 1, None) - dq
            return adv, div, s_m1, s_p1

        advect_T = self.advect_T
        dt_T_factor = self.dt_T_factor

        def kernel(dt_ref, u_ref, p_ref, Hu_ref, Hp_ref, *rest):
            rest = list(rest)
            HT_ref = rest.pop(0) if advect_T else None
            (f0_ref, f0h_ref, f1_ref, f2_ref, T_ref_, M_ref,
             lat_ref) = rest[:7]
            rest = rest[7:]
            if operands:
                (HLu_ref, HLp_ref, HLf1_ref, HOu_ref, HOp_ref,
                 HOf2_ref) = rest[:6]
                rest = rest[6:]
                if advect_T:
                    HLT_ref, HOT_ref = rest[:2]
                    rest = rest[2:]
            if advect_T:
                out_ref, Tout_ref = rest
            else:
                (out_ref,) = rest
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

            # ---------- ghost layers for the transverse axes -----------
            alat_hi_last = M[10][:, -1:][:, :, None]   # seam-face area
            if operands:
                HLu = HLu_ref[:]                 # (3, blk, 4, nlon)
                ug_m2, ug_m1 = HLu[:, :, 0:1, :], HLu[:, :, 1:2, :]
                ug_p1, ug_p2 = HLu[:, :, 2:3, :], HLu[:, :, 3:4, :]
                f1_seam = HLf1_ref[:][None]      # (1, blk, 1, nlon)
                HOu = HOu_ref[:]                 # (3, blk, nlat, 4)
                og_m2, og_m1 = HOu[..., 0:1], HOu[..., 1:2]
                og_p1, og_p2 = HOu[..., 2:3], HOu[..., 3:4]
                f2_seam = HOf2_ref[:][None]      # (1, blk, nlat, 1)
            else:
                g_lo, g_hi = lat_ghosts(u3, True)
                ug_m2 = ug_m1 = g_lo
                ug_p1 = ug_p2 = g_hi
                f1_seam = jnp.zeros_like(
                    jax.lax.slice_in_dim(f1, 0, 1, axis=1))[None]
                og_m2 = og_m1 = og_p1 = og_p2 = None  # lon wraps
                f2_seam = None

            # ---------- latitude (aligned rolls, no pad/concat) ---------
            adv_l, div_l4, u_lm1, u_lp1 = transverse_advect(
                u3, f1[None], "lat", ug_m2, ug_m1, ug_p1, ug_p2,
                f1_seam, alat_lo, alat_hi_last)
            div_l = div_l4[0]

            # ---------- longitude (periodic rolls / ghost columns) ------
            adv_o, div_o4, u_om1, u_op1 = transverse_advect(
                u3, f2[None], "lon", og_m2, og_m1, og_p1, og_p2,
                f2_seam, alon, alon)
            div_o = div_o4[0]

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
            # physical angular derivatives via the +-1 shifts already
            # computed for the face values
            d_lat = lambda c: (u_lp1[c] - u_lm1[c]) * inv_2rcdlat
            d_lon = lambda c: (u_op1[c] - u_om1[c]) * inv_2dlon
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
                if operands:
                    HLp = HLp_ref[:]
                    gp_lo, gp_hi = HLp[:, 0:1, :], HLp[:, 1:2, :]
                    HOp = HOp_ref[:]
                    po_lo, po_hi = HOp[..., 0:1], HOp[..., 1:2]
                else:
                    gp_lo, gp_hi = lat_ghosts(pp, False)
                    po_lo = po_hi = None
                gp_l = (lat_shift(pp, 1, gp_hi)
                        - lat_shift(pp, -1, gp_lo)) * inv_2rcdlat
                gp_o = (lon_shift(pp, 1, po_hi)
                        - lon_shift(pp, -1, po_lo)) * inv_2dlon
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

                if operands:
                    HLT = HLT_ref[:]             # (blk, 4, nlon)
                    Tg = (HLT[:, 0:1, :], HLT[:, 1:2, :],
                          HLT[:, 2:3, :], HLT[:, 3:4, :])
                    HOT = HOT_ref[:]             # (blk, nlat, 4)
                    To = (HOT[..., 0:1], HOT[..., 1:2],
                          HOT[..., 2:3], HOT[..., 3:4])
                    f1_sT, f2_sT = f1_seam[0], f2_seam[0]
                else:
                    Tlo, Thi = lat_ghosts(Tb, False)
                    Tg = (Tlo, Tlo, Thi, Thi)
                    To = (None, None, None, None)
                    f1_sT, f2_sT = f1_seam[0], None
                adv_lT, _, _, _ = transverse_advect(
                    Tb, f1, "lat", *Tg, f1_sT, alat_lo, alat_hi_last)
                adv_oT, _, _, _ = transverse_advect(
                    Tb, f2, "lon", *To, f2_sT, alon, alon)

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
        if self.halo_mode == "operands":
            in_specs += [
                bspec((3, blk, 4, nlon), lambda i: (0, i, 0, 0)),  # HLu
                bspec((blk, 2, nlon), lambda i: (i, 0, 0)),        # HLp
                bspec((blk, 1, nlon), lambda i: (i, 0, 0)),        # HLf1
                bspec((3, blk, nlat, 4), lambda i: (0, i, 0, 0)),  # HOu
                bspec((blk, nlat, 2), lambda i: (i, 0, 0)),        # HOp
                bspec((blk, nlat, 1), lambda i: (i, 0, 0)),        # HOf2
            ]
            if advect_T:
                in_specs += [
                    bspec((blk, 4, nlon), lambda i: (i, 0, 0)),    # HLT
                    bspec((blk, nlat, 4), lambda i: (i, 0, 0)),    # HOT
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
                          use_pallas: Optional[bool] = None,
                          n_devices: Optional[int] = None):
    """Gate the fused projection kernels; None -> jnp path.

    ``n_devices`` > 1 disables the kernels (VERDICT r2 item 3: GSPMD
    cannot see through a pallas_call, so a sharded jit would replicate
    the arrays — multi-chip runs take the jnp path, which GSPMD
    partitions correctly). Interpret mode is exempt (test-only)."""
    if geo.kind != "shell":
        return None
    if n_devices is None:
        n_devices = len(jax.devices())
    if n_devices > 1 and not interpret:
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
                       use_pallas: Optional[bool] = None,
                       n_devices: Optional[int] = None):
    """Factory gating the fused kernel to supported configurations;
    returns None when the jnp path should be used.

    ``n_devices`` > 1 returns None — the single-device kernel must not
    run under a sharded jit (GSPMD would replicate it). Multi-chip runs
    keep the fused path via BoussinesqModel.enable_sharded_pallas(mesh),
    which wraps this kernel's operands-mode twin in shard_map
    (parallel/sharded_pallas.py)."""
    if geo.kind != "shell":
        return None
    if model.advection_form != "advective":
        return None  # FEEC rotational form keeps the jnp path (for now)
    if n_devices is None:
        n_devices = len(jax.devices())
    if n_devices > 1 and not interpret:
        return None
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
