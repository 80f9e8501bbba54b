"""Fused Pallas TPU kernel: implicit Richardson solves + projection head.

The production step's implicit stage is the fixed-iteration
Jacobi-Richardson solve (solvers/fixed.py) of the mass-dominated
Helmholtz systems

    (V - coef * weak_lap) x = b      coef = dt/Re (momentum, 3 comps)
                                     coef = dt_T/Pe (temperature)

— the TPU-native replacement for the reference's preconditioned CG
momentum/temperature solves (boussinesq_model.tpp:1131-1245,
1417-1476). Expressed in jnp, the k=2 unrolled iteration is 3 operator
applies = 3 full HBM round trips over 4 fields plus the axpy traffic
(measured 0.20 + 0.04 ms of the 0.71 ms round-2 step at 32x128x256 f32).
This kernel fuses, in ONE pass over HBM:

  * BOTH solves — all 4 channels, per-system iteration counts
    (``iters_u``/``iters_T``: the momentum tolerance, 1e-8 per the
    reference tpp:1166, sits four orders looser than temperature's
    1e-12 per tpp:1431, so momentum typically needs one fewer
    Jacobi-Richardson iteration; the common iterations run jointly on
    the 4-channel stack and the surplus iterations run on the lagging
    system alone at 1/4 the cost), with the exactly tracked final
    residuals and the ||r||/||b|| partial sums;
  * the PRE-POISSON PROJECTION HEAD (faces_div): u* face
    interpolation + wall-face zeros + divergence + the raw Poisson RHS
    -vol*div(u*)/dt with per-block compatibility partial sums —
    previously a separate 0.11 ms kernel re-reading u* from HBM. The
    fusion is free in ghost depth: after k iterations the iterate is
    still valid on H-k >= 1 ghost rows, exactly what the face
    divergence needs (H = max(iters)+1).

Design (mirrors ops/pallas_stencil.py):
  * grid over RADIAL BLOCKS; lat/lon stay whole inside a block so the
    periodic lon wrap is a block-local roll. The stencil is SELECT-FREE:
    wall BCs are folded into the metric channels (zeroed wall-face
    conductances + per-channel diagonal adjustments — exact, x2 is a
    power-of-two scale), and the lat pole faces carry zero area natively
    so the lat rolls need no pole closure at all;
  * k Richardson iterations need depth-(k+1) radial ghosts (each
    operator apply consumes one ghost row; the final residual needs one
    more). Ghost rows arrive as XLA-sliced halo operands
    (nb, C, 2H, nlat, nlon) and the iterates are recomputed redundantly
    on the shrinking extended region — measured 0.004 ms of XLA-side
    assembly vs 0.34 ms the fused pass saves (scripts/
    probe_richardson_kernel.py);
  * wall BCs are applied in-kernel from the CURRENT iterate's edge rows
    (iota row masks), so the redundant region stays exact: the kernel
    result equals solvers/fixed.richardson_solve with the jnp
    weak_laplacian bit-for-bit up to float reassociation, and the face
    outputs equal ShellProjectionPallas.faces_div
    (tests/test_pallas_richardson.py pins both in interpret mode);
  * all metric/diagonal channels are lon-invariant on the shell and
    enter as an (nb, K, ext, nlat) pre-extended stack.

Single-device only in this module (GSPMD cannot partition a
pallas_call); parallel/sharded_richardson.py wraps the same kernel in
shard_map with ppermute halos for multi-chip runs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dycoreplanet_tpu.grid.geometry import Geometry
from dycoreplanet_tpu.ops.pallas_stencil import supports_pallas


class HelmholtzRichardsonPallas:
    """Callable (rhs_u, rhs_T, T0, dt) ->
        (u_star, T_new, (uf0, uf1, uf2, rhs_phi),
         (rnorm_u, bnorm_u, rnorm_T, bnorm_T)).

    Solves the stacked momentum system (x0 = rhs_u, b = vol*rhs_u —
    exactly BoussinesqModel._solve_momentum_projection's fast path) with
    ``iters_u`` unrolled Jacobi-Richardson steps and the temperature
    system (x0 = T0, b = rhs_T) with ``iters_T``, then emits the
    staggered face velocities of u* and the compatibility-corrected
    Poisson RHS (the faces_div stage of the incremental projection,
    BoussinesqModel._project_velocity). Shell standard personality only.
    """

    # channel order: [u_r, u_lat, u_lon, T]. BC sign patterns (ANTISYM
    # inner wall for all channels; hi wall ANTISYM for u_r / NEUMANN for
    # the rest; POLE_FLIP for the tangential components) are generated
    # from an in-kernel channel iota — pallas rejects captured
    # non-scalar constants — and pinned against the jnp oracle (which
    # embeds the model's BCSpec tables) in tests/test_pallas_richardson.
    # The convergence-tolerance test lives in the model's fused branch
    # (boussinesq.py), fed by the residual partials this kernel returns.

    def __init__(self, geo: Geometry, *, dtype=np.float32,
                 one_over_Re: float, one_over_Pe: float,
                 nse_interval: int,
                 helm_diags: np.ndarray, T_diag: np.ndarray,
                 iters_u: int = 2, iters_T: int = 2,
                 block_rows: Optional[int] = None,
                 halo_mode: str = "rolls",
                 local_shape: Optional[tuple] = None,
                 track_residual: bool = True,
                 interpret: bool = False):
        """``halo_mode``:
          * "rolls" (single device) — lat/lon are whole; the periodic
            lon wrap is an in-kernel roll; __call__ takes global arrays.
          * "operands" (per shard, inside shard_map) — lat/lon ghost
            layers of depth H arrive pre-concatenated on the inputs
            (redundant recompute in all three axes); ``local_shape``
            gives the shard's (nr, nlat_local, nlon_local); metrics come
            per-shard from build_shard_metrics; use call_operands.
        """
        assert geo.kind == "shell"
        assert halo_mode in ("rolls", "operands")
        self.geo = geo
        self.halo_mode = halo_mode
        nr, nlat, nlon = geo.cell_shape
        self.shape = (nr, nlat, nlon)          # global shape
        # center (owned) extents the kernel emits
        self.cshape = tuple(local_shape) if local_shape else self.shape
        assert self.cshape[0] == nr, "radial axis is never sharded"
        if block_rows is None:
            block_rows = next((b for b in (8, 16) if nr % b == 0), nr)
        assert nr % block_rows == 0
        self.blk = block_rows
        self.nb = nr // block_rows
        self.iters_u = int(iters_u)
        self.iters_T = int(iters_T)
        self.track_residual = bool(track_residual)
        # ghost depth per side: each operator apply consumes one ghost
        # row. With residual tracking every system pays iters+1 applies;
        # without it the last update of each system skips its r-update
        # (the iterate itself only needs iters applies), but the fused
        # faces head still reads u* on one ghost row -> iters_u + 1.
        if self.track_residual:
            self.H = max(self.iters_u, self.iters_T) + 1
        else:
            self.H = max(self.iters_u + 1, self.iters_T)
        self.GH = self.H if halo_mode == "operands" else 0
        assert self.H <= self.blk, "ghost depth must fit one block"
        self.interpret = interpret
        self.s_iRe = float(one_over_Re)
        self.s_iPe = float(one_over_Pe)
        self.s_itv = 1.0 / float(nse_interval)
        self.dtype = np.dtype(dtype)

        # ---- lon-invariant metric channels, pre-extended in r ---------
        # (matches st.weak_laplacian's _left_metric/_hi_metric slicing:
        # cr_lo/cl_lo are the LEFT-face area/dist ratios, cr_hi/cl_hi
        # the faces one step up incl. the hi wall)
        def b2(a, shape):
            a = np.asarray(a, np.float64)
            return np.broadcast_to(a, shape + (1,))[..., 0] \
                if a.shape[-1] == 1 else np.broadcast_to(a, shape)

        area_r = b2(geo.face_area[0], (nr + 1, nlat))
        dist_r = b2(geo.face_dist[0], (nr + 1, nlat))
        area_l = b2(geo.face_area[1], (nr, nlat + 1))
        dist_l = b2(geo.face_dist[1], (nr, nlat + 1))
        area_o = b2(geo.face_area[2], (nr, nlat))
        dist_o = b2(geo.face_dist[2], (nr, nlat))
        vol = b2(geo.vol, (nr, nlat))

        def loninv(a, name, lead):
            """Drop the (lon-invariant) lon axis of a cell-shaped array."""
            a = np.broadcast_to(np.asarray(a, np.float64),
                                lead + (nr, nlat, nlon))
            if not np.allclose(a, a[..., :1]):
                raise ValueError(f"{name} is not lon-invariant")
            return a[..., 0]

        hd = loninv(helm_diags, "helm_diags", (3,))  # (3, nr, nlat)
        td = loninv(T_diag, "T_diag", ())            # (nr, nlat)

        # the pole-free lat closure below requires exactly-zero pole
        # face areas (true for the lat-lon shell: the +-pi/2 faces are
        # points)
        assert float(np.abs(area_l[:, 0]).max()) == 0.0
        assert float(np.abs(area_l[:, -1]).max()) == 0.0

        cr_lo = area_r[:nr] / dist_r[:nr]
        cr_hi = area_r[1:] / dist_r[1:]
        # Wall BCs as METRIC algebra instead of in-kernel selects: zero
        # the wall-face conductances and fold the ANTISYM ghost term
        # (c*(-v - v) = (-2c)*v — exact: x2 is a power-of-two scale)
        # into per-channel-group diagonal adjustment channels. The lat
        # pole faces carry ZERO area natively, so the lat rolls need no
        # closure at all (wrapped rows multiply by 0); the radial rolls
        # wrap finite halo rows that the zeroed conductances kill.
        # Channel groups: u_r = ANTISYM/ANTISYM; u_lat/u_lon/T =
        # ANTISYM lo, NEUMANN hi (NEU ghost v makes c*(v-v)=0 — the
        # zeroed conductance alone is exact).
        cr_lo_z = cr_lo.copy()
        cr_lo_z[0] = 0.0
        cr_hi_z = cr_hi.copy()
        cr_hi_z[nr - 1] = 0.0
        Dl_oth = np.zeros_like(cr_lo)
        Dl_oth[0] = -2.0 * cr_lo[0]
        Dl_ur = Dl_oth.copy()
        Dl_ur[nr - 1] = -2.0 * cr_hi[nr - 1]

        chans = np.stack([
            vol,                         # 0
            cr_lo_z,                     # 1 cr_lo (wall face zeroed)
            cr_hi_z,                     # 2 cr_hi (wall face zeroed)
            area_l[:, :nlat] / dist_l[:, :nlat],   # 3 cl_lo (pole row 0 = 0)
            area_l[:, 1:] / dist_l[:, 1:],         # 4 cl_hi (pole row -1 = 0)
            area_o / dist_o,             # 5 co (periodic: same both faces)
            hd[0], hd[1], hd[2], td,     # 6..9 -weak_lap diagonals
            area_r[:nr],                 # 10 ar_lo (radial LEFT-face area)
            area_l[:, :nlat],            # 11 alat_lo (lat LEFT-face area)
            area_o,                      # 12 alon (lon face area)
            Dl_ur,                       # 13 wall diag adj, u_r channel
            Dl_oth,                      # 14 wall diag adj, other channels
        ])                               # (K, nr, nlat)
        self.K = chans.shape[0]
        self._chans64 = chans            # (K, nr, nlat) float64
        self._area_l64 = area_l          # (nr, nlat+1) face areas
        # per-block extension to (nb, K, ext, nlat): rows i*blk-H ..
        # i*blk+blk+H, edge rows replicated past the walls (inert: the
        # zeroed wall conductances kill their contributions)
        H, blk, nb = self.H, self.blk, self.nb
        if halo_mode == "rolls":
            idx = np.arange(-H, blk + H)
            self.M = np.stack([
                chans[:, np.clip(idx + i * blk, 0, nr - 1), :]
                for i in range(nb)
            ]).astype(self.dtype)        # (nb, K, ext, nlat)
        else:
            self.M = None                # per-shard: build_shard_metrics
        self._kernel_cache = {}

    # ------------------------------------------------------------------
    def build_shard_metrics(self, n_lat_shards: int) -> np.ndarray:
        """(A, nb, K, ext_r, ext_lat) pre-extended metric stacks, one per
        LAT shard (lon sharding needs no metric variation — every channel
        is lon-invariant). Lat extension clips at the poles like the
        radial walls (beyond-pole rows are inert: zero pole-face
        conductances), EXCEPT channel 11 (the lat face areas feeding the
        fused divergence) which is FACE-indexed and clips at face nlat so
        the beyond-pole flux area is exactly 0 — the operands-mode
        equivalent of the rolls-mode zero-row concat."""
        assert self.halo_mode == "operands"
        nr, nlat, _ = self.shape
        nlat_c = self.cshape[1]
        assert nlat_c * n_lat_shards == nlat
        H, blk, nb, GH = self.H, self.blk, self.nb, self.GH
        ridx = np.arange(-H, blk + H)
        out = []
        for a in range(n_lat_shards):
            cols = np.clip(np.arange(-GH, nlat_c + GH) + a * nlat_c,
                           0, nlat - 1)
            ch = self._chans64[:, :, cols].copy()   # (K, nr, ext_lat)
            fcols = np.clip(np.arange(-GH, nlat_c + GH) + a * nlat_c,
                            0, nlat)
            ch[11] = self._area_l64[:, fcols]
            out.append(np.stack([
                ch[:, np.clip(ridx + i * blk, 0, nr - 1), :]
                for i in range(nb)
            ]))
        return np.stack(out).astype(self.dtype)

    # ------------------------------------------------------------------
    def _deep_halos(self, x: jnp.ndarray) -> jnp.ndarray:
        """(nb, C, 2H, nlat, nlon) radial halo rows for a (C, nr, ...)
        stack: rows [:H] are the H cells below the block, rows [H:] the
        H above; wall-adjacent blocks replicate the edge row (in-kernel
        masks make those rows inert)."""
        H, blk, nb = self.H, self.blk, self.nb
        nr = self.shape[0]
        halos = []
        for i in range(nb):
            lo, hi = i * blk - H, i * blk
            if lo < 0:
                pad = jnp.repeat(x[:, 0:1], -lo, axis=1)
                top = jnp.concatenate([pad, x[:, 0:hi]], axis=1) \
                    if hi > 0 else pad
            else:
                top = x[:, lo:hi]
            lo2, hi2 = (i + 1) * blk, (i + 1) * blk + H
            if hi2 > nr:
                pad = jnp.repeat(x[:, -1:], hi2 - nr, axis=1)
                bot = jnp.concatenate([x[:, lo2:nr], pad], axis=1) \
                    if lo2 < nr else pad
            else:
                bot = x[:, lo2:hi2]
            halos.append(jnp.concatenate([top, bot], axis=1))
        return jnp.stack(halos)

    # ------------------------------------------------------------------
    def call_operands(self, rhs_u_e, rhs_T_e, T0_e, dt, M_sh):
        """Per-shard invocation (inside shard_map): the inputs carry
        depth-H lat/lon ghost layers pre-concatenated; ``M_sh`` is this
        shard's (nb, K, ext_r, ext_lat) metric slab. Returns
        (u_star, T_new, uf0, uf1, uf2, rhs_raw, parts) on the CENTER
        (owned) extents, ``parts`` the raw (nb, 1, 5) partial sums the
        caller psums across the mesh."""
        assert self.halo_mode == "operands"
        dtype = rhs_u_e.dtype
        st4 = jnp.concatenate([rhs_u_e, T0_e[None]], axis=0)
        Hx = self._deep_halos(st4)
        HbT = self._deep_halos(rhs_T_e[None])
        dt_arr = jnp.asarray(dt, dtype).reshape(1, 1)
        key = (dtype.name,)
        call = self._kernel_cache.get(key)
        if call is None:
            call = self._build_call(jnp.dtype(dtype))
            self._kernel_cache[key] = call
        return call(dt_arr, rhs_u_e, rhs_T_e, T0_e, Hx, HbT, M_sh)

    # ------------------------------------------------------------------
    def __call__(self, rhs_u, rhs_T, T0, dt):
        assert self.halo_mode == "rolls"
        nr, nlat, nlon = self.shape
        dtype = rhs_u.dtype
        st4 = jnp.concatenate([rhs_u, T0[None]], axis=0)
        Hx = self._deep_halos(st4)                 # (nb, 4, 2H, nlat, nlon)
        HbT = self._deep_halos(rhs_T[None])        # (nb, 1, 2H, nlat, nlon)
        dt_arr = jnp.asarray(dt, dtype).reshape(1, 1)
        key = (dtype.name,)
        call = self._kernel_cache.get(key)
        if call is None:
            call = self._build_call(jnp.dtype(dtype))
            self._kernel_cache[key] = call
        (u_star, T_new, uf0, uf1, uf2, rhs_raw, parts) = call(
            dt_arr, rhs_u, rhs_T, T0, Hx, HbT, jnp.asarray(self.M, dtype))
        sums = jnp.sum(parts, axis=(0, 1))         # (5,)
        if self.track_residual:
            rnorm_u = jnp.sqrt(sums[0])
            rnorm_T = jnp.sqrt(sums[2])
        else:  # sentinel: residual not checked on this call
            rnorm_u = jnp.asarray(-1.0, dtype)
            rnorm_T = jnp.asarray(-1.0, dtype)
        bnorm_u = jnp.sqrt(sums[1])
        bnorm_T = jnp.sqrt(sums[3])
        # compatibility: subtract the float drift of sum(rhs) (the
        # all-ones nullspace of the weak Laplacian; the caller's jnp
        # path does rhs - mean(rhs))
        rhs_phi = rhs_raw - sums[4] / float(self.geo.n_cells)
        return (u_star, T_new, (uf0, uf1, uf2, rhs_phi),
                (rnorm_u, bnorm_u, rnorm_T, bnorm_T))

    # ------------------------------------------------------------------
    def _build_call(self, dtype):
        nr, nlat, nlon = self.cshape          # CENTER (owned) extents
        blk, nb, H, K = self.blk, self.nb, self.H, self.K
        GH = self.GH                           # lat/lon ghost depth
        eL, eO = nlat + 2 * GH, nlon + 2 * GH  # extended lat/lon sizes
        ext = blk + 2 * H
        iters_u, iters_T = self.iters_u, self.iters_T
        k_common = min(iters_u, iters_T)
        iRe, iPe, itv = self.s_iRe, self.s_iPe, self.s_itv
        cl, cn = slice(GH, GH + nlat), slice(GH, GH + nlon)

        def kernel(dt_ref, ru_ref, rT_ref, T0_ref, Hx_ref, HbT_ref,
                   M_ref, u_ref, T_ref, f0_ref, f1_ref, f2_ref,
                   rhs_ref, p_ref):
            i = pl.program_id(0)
            dt = dt_ref[0, 0]
            M = M_ref[0]                           # (K, ext, nlat)
            m = lambda k: M[k][:, :, None]
            vol = m(0)
            cr_lo, cr_hi, cl_lo, cl_hi, co = (m(1), m(2), m(3), m(4), m(5))
            Ld = jnp.stack([M[6], M[7], M[8], M[9]])[:, :, :, None]
            coef_u = dt * iRe
            coef_T = dt * itv * iPe
            cidx4 = jax.lax.broadcasted_iota(jnp.int32, (4, 1, 1, 1), 0)
            coef4 = jnp.where(cidx4 < 3, coef_u, coef_T)
            # diagonal-explicit operator form: A v = diag4 * v -
            # sum_faces(cc_face * v_nbr), with diag4 = V + coef * Ld
            # exactly the Jacobi denominator (Ld = -weak_lap diagonal
            # INCLUDING the wall adjustments, so the Dl channels never
            # enter the apply — they are folded into Ld upstream).
            # Identical to the roll-form weak_laplacian up to f32
            # reassociation (pinned vs the jnp oracle in tests).
            diag4 = vol[None] + coef4 * Ld         # (4, ext, nlat, 1)
            inv_diag = 1.0 / diag4
            # pre-scaled NEGATED neighbor conductances (lon-invariant,
            # lane width 1 — a few KB each): wall/pole faces are ZERO
            # here, so lat-roll wraps and beyond-wall halo rows are
            # inert; the negation folds the final subtraction into the
            # fma-shaped accumulation chain
            ncoef4 = -coef4
            ccr_lo = ncoef4 * cr_lo[None]
            ccr_hi = ncoef4 * cr_hi[None]
            ccl_lo = ncoef4 * cl_lo[None]
            ccl_hi = ncoef4 * cl_hi[None]
            cco = ncoef4 * co[None]

            def shrink(v, d):
                """Drop d radial rows each side (free: leading axis)."""
                return v if d == 0 else v[:, d:v.shape[1] - d]

            def apply_sl(v, lv, c0, C):
                """A v for channels [c0, c0+C), SHRINKING-REGION form:
                v is valid at level lv (rows [lv, ext-lv) of the
                extended block); the result is valid at level lv+1 and
                is 2 radial rows smaller. Radial neighbors are static
                leading-axis slices (no roll copies, no recompute of
                rows whose validity is already spent); lat/lon stay
                rolls — lon is genuinely periodic, and the lat wrap is
                killed by the zero pole-face conductances."""
                lo = lv + 1
                n = ext - 2 * lo
                vc = v[:, 1:1 + n]
                vp = v[:, 2:2 + n]
                vm = v[:, 0:n]
                cs = lambda c: c[c0:c0 + C, lo:lo + n]
                # mul-add chain on NEGATED conductances: every line is
                # an a*b+c candidate for the vector unit's fused form,
                # and the diagonal term absorbs the final combine
                acc = cs(cco) * (jnp.roll(vc, -1, axis=3)
                                 + jnp.roll(vc, 1, axis=3))
                acc = cs(ccl_lo) * jnp.roll(vc, 1, axis=2) + acc
                acc = cs(ccl_hi) * jnp.roll(vc, -1, axis=2) + acc
                acc = cs(ccr_lo) * vm + acc
                acc = cs(ccr_hi) * vp + acc
                return cs(diag4) * vc + acc

            track = self.track_residual

            def solve_sys(x, b1, iters, c0, C):
                """Jacobi-Richardson with level-tracked shrinking
                regions: each apply runs only on the rows whose result
                is still consumable. b1 arrives at level 1. Returns
                (x, lx, r, lr) with the levels the arrays ended at."""
                r = b1 - apply_sl(x, 0, c0, C)     # level 1
                lx, lr = 0, 1
                for j in range(iters):
                    dx = r * inv_diag[c0:c0 + C, lr:ext - lr]
                    x = shrink(x, lr - lx) + dx
                    lx = lr
                    if track or (iters > j + 1):
                        r = shrink(r, 1) - apply_sl(dx, lr, c0, C)
                        lr += 1
                return x, lx, r, lr

            # extended iterates at level 0: [halo_lo | block | halo_hi]
            Hx = Hx_ref[0]                         # (4, 2H, nlat, nlon)
            x_u = jnp.concatenate(
                [Hx[:3, :H], ru_ref[:], Hx[:3, H:]], axis=1)
            x_T = jnp.concatenate(
                [Hx[3:, :H], T0_ref[:][None], Hx[3:, H:]], axis=1)
            # b at level 1: momentum b = vol * rhs_u (rhs_u IS x0);
            # temperature b arrives precomputed with its own halos
            HbT = HbT_ref[0]
            n1 = ext - 2
            b1_u = vol[None][:, 1:1 + n1] * x_u[:, 1:1 + n1]
            b0_T = jnp.concatenate(
                [HbT[:, :H], rT_ref[:][None], HbT[:, H:]], axis=1)
            b1_T = b0_T[:, 1:1 + n1]

            xu, lxu, ru_res, lru = solve_sys(x_u, b1_u, iters_u, 0, 3)
            xT, lxT, rT_res, lrT = solve_sys(x_T, b1_T, iters_T, 3, 1)

            u_ref[:] = xu[:, H - lxu:H - lxu + blk, cl, cn]
            T_ref[:] = xT[0, H - lxT:H - lxT + blk, cl, cn]

            # ---- fused projection head: faces + div + Poisson RHS ----
            # (exactly ShellProjectionPallas.faces_div,
            # pallas_stencil.py:842-883; xu is valid on H-iters_u >= 1
            # ghost rows/cols, all the face stencil needs)
            ou = H - lxu                           # xu row of global H
            u0w = xu[0, ou - 1:ou + blk + 1, cl, cn]  # rows lo-1..hi+1
            uf0e = 0.5 * (u0w[:-1] + u0w[1:])      # faces block_lo..hi+1
            fidx = (jax.lax.broadcasted_iota(jnp.int32, (blk + 1, 1, 1), 0)
                    + i * blk)
            # lo wall face is exactly 0 (no-slip); the hi wall face sits
            # above a REPLICATED (not BC) ghost row — mask both
            uf0e = jnp.where((fidx == 0) | (fidx == nr),
                             jnp.zeros_like(uf0e), uf0e)

            vol_c = vol[H:H + blk, cl]
            ar_e = M[10][H:H + blk + 1, cl][:, :, None]
            aq_r = ar_e * uf0e
            if GH == 0:
                u1c = xu[1, ou:ou + blk]
                # the zero-area pole face is zeroed below, so the
                # POLE_FLIP ghost never survives — a plain roll suffices
                uf1 = 0.5 * (jnp.roll(u1c, 1, axis=1) + u1c)
                uf1 = jnp.concatenate(
                    [jnp.zeros_like(uf1[:, :1, :]), uf1[:, 1:, :]],
                    axis=1)
                u2c = xu[2, ou:ou + blk]
                uf2 = 0.5 * (jnp.roll(u2c, 1, axis=2) + u2c)
                alat_lo = M[11][H:H + blk][:, :, None]
                alon = M[12][H:H + blk][:, :, None]
                aq_l = alat_lo * uf1
                aq_o = alon * uf2
                zrow = jnp.zeros_like(aq_l[:, :1, :])
                d_l = (jnp.concatenate([aq_l[:, 1:, :], zrow], axis=1)
                       - aq_l)
                d_o = jnp.roll(aq_o, -1, axis=2) - aq_o
            else:
                # operands mode: neighbor values come from the ghost
                # layers (slices, no closures); the beyond-pole flux
                # area in channel 11 is exactly 0 (build_shard_metrics)
                u1x = xu[1, ou:ou + blk, GH - 1:GH + nlat + 1, cn]
                uf1e = 0.5 * (u1x[:, :-1] + u1x[:, 1:])  # nlat+1 faces
                uf1 = uf1e[:, :nlat]
                u2x = xu[2, ou:ou + blk, cl, GH - 1:GH + nlon + 1]
                uf2e = 0.5 * (u2x[..., :-1] + u2x[..., 1:])
                uf2 = uf2e[..., :nlon]
                alat_e = M[11][H:H + blk, GH:GH + nlat + 1][:, :, None]
                alon = M[12][H:H + blk, cl][:, :, None]
                aq_l_e = alat_e * uf1e
                aq_o_e = alon * uf2e
                d_l = aq_l_e[:, 1:] - aq_l_e[:, :-1]
                d_o = aq_o_e[..., 1:] - aq_o_e[..., :-1]
            div = (aq_r[1:] - aq_r[:-1] + d_l + d_o) / vol_c
            rhs = -vol_c * div / dt
            f0_ref[:] = uf0e[:blk]
            f1_ref[:] = uf1
            f2_ref[:] = uf2
            rhs_ref[:] = rhs

            bc_u = vol_c[None] * ru_ref[:][:, :, cl, cn]
            bc_T = rT_ref[:][:, cl, cn]
            if self.track_residual:
                rc_u = ru_res[:, H - lru:H - lru + blk, cl, cn]
                rc_T = rT_res[0, H - lrT:H - lrT + blk, cl, cn]
                s_ru, s_rT = jnp.sum(rc_u * rc_u), jnp.sum(rc_T * rc_T)
            else:  # residuals not computed this call (interval mode)
                s_ru = s_rT = jnp.zeros((), dtype)
            p_ref[:] = jnp.stack([
                s_ru, jnp.sum(bc_u * bc_u),
                s_rT, jnp.sum(bc_T * bc_T),
                jnp.sum(rhs),
            ]).reshape(1, 1, 5)

        bspec = lambda shape, imap: pl.BlockSpec(shape, imap,
                                                 memory_space=pltpu.VMEM)
        fin = lambda: bspec((blk, eL, eO), lambda i: (i, 0, 0))
        fout = lambda: bspec((blk, nlat, nlon), lambda i: (i, 0, 0))
        grid_spec = pl.GridSpec(
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),        # dt
                bspec((3, blk, eL, eO), lambda i: (0, i, 0, 0)),
                fin(),                                        # rhs_T
                fin(),                                        # T0
                bspec((1, 4, 2 * H, eL, eO),
                      lambda i: (i, 0, 0, 0, 0)),             # x halos
                bspec((1, 1, 2 * H, eL, eO),
                      lambda i: (i, 0, 0, 0, 0)),             # bT halos
                bspec((1, K, ext, eL), lambda i: (i, 0, 0, 0)),
            ],
            out_specs=[
                bspec((3, blk, nlat, nlon), lambda i: (0, i, 0, 0)),
                fout(),                                       # T_new
                fout(), fout(), fout(),                       # faces
                fout(),                                       # rhs_raw
                bspec((1, 1, 5), lambda i: (i, 0, 0)),
            ],
        )

        def call(dt_arr, rhs_u, rhs_T, T0, Hx, HbT, M):
            shp = jax.ShapeDtypeStruct((nr, nlat, nlon), dtype)
            return pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=[
                    jax.ShapeDtypeStruct((3, nr, nlat, nlon), dtype),
                    shp, shp, shp, shp, shp,
                    jax.ShapeDtypeStruct((nb, 1, 5), dtype),
                ],
                compiler_params=pltpu.CompilerParams(
                    # larger working set than the forcing kernel (x/r
                    # ext arrays + 7 outputs); v5e has 128 MB VMEM and
                    # blk=16 measured 103 MB
                    vmem_limit_bytes=112 * 1024 * 1024),
                interpret=self.interpret,
            )(dt_arr, rhs_u, rhs_T, T0, Hx, HbT, M)

        return call


def make_richardson(geo: Geometry, model, *, interpret: bool = False,
                    use_pallas: Optional[bool] = None,
                    n_devices: Optional[int] = None,
                    track_residual: bool = True):
    """Factory gating the fused Richardson kernel; None -> jnp path.

    Engages only where it exactly reproduces the model's fast path:
    shell standard personality, projection momentum solver, iterative
    (non-direct) Helmholtz, fixed_solver_iters > 0. Multi-device runs
    return None here (GSPMD cannot partition a pallas_call);
    parallel/sharded_richardson.py keeps the kernel on sharded meshes."""
    if geo.kind != "shell":
        return None
    p = model.params
    if (model.momentum_solver == "coupled"
            or model.helmholtz_direct is not None
            or p.numerics.fixed_solver_iters <= 0):
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
    blk = next((b for b in (8, 16) if nr % b == 0), nr)
    iters_T = p.numerics.fixed_solver_iters
    iters_u = model.momentum_iters
    if max(iters_u + 1, iters_T + int(track_residual)) > blk:
        return None  # ghost depth must fit within one radial block
    return HelmholtzRichardsonPallas(
        geo, dtype=model.dtype,
        one_over_Re=model.one_over_Re,
        one_over_Pe=model.one_over_Pe,
        nse_interval=p.NSE_solver_interval,
        helm_diags=np.asarray(model.helm_diags),
        T_diag=np.asarray(model.T_diag),
        iters_u=iters_u, iters_T=iters_T,
        track_residual=track_residual,
        interpret=interpret,
    )
