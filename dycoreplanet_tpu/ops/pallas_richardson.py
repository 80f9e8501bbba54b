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
    pole closure (half-turn lon roll, tangential sign flip) and the
    periodic lon wrap are block-local rolls;
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
from dycoreplanet_tpu.ops.pallas_stencil import VMEM_LIMIT_MB, supports_pallas


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
                 interpret: bool = False):
        assert geo.kind == "shell"
        self.geo = geo
        nr, nlat, nlon = geo.cell_shape
        self.shape = (nr, nlat, nlon)
        if block_rows is None:
            block_rows = next((b for b in (8, 16) if nr % b == 0), nr)
        assert nr % block_rows == 0
        self.blk = block_rows
        self.nb = nr // block_rows
        self.iters_u = int(iters_u)
        self.iters_T = int(iters_T)
        self.H = max(self.iters_u, self.iters_T) + 1  # ghost depth/side
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

        chans = np.stack([
            vol,                         # 0
            area_r[:nr] / dist_r[:nr],   # 1 cr_lo
            area_r[1:] / dist_r[1:],     # 2 cr_hi
            area_l[:, :nlat] / dist_l[:, :nlat],   # 3 cl_lo
            area_l[:, 1:] / dist_l[:, 1:],         # 4 cl_hi
            area_o / dist_o,             # 5 co (periodic: same both faces)
            hd[0], hd[1], hd[2], td,     # 6..9 -weak_lap diagonals
            area_r[:nr],                 # 10 ar_lo (radial LEFT-face area)
            area_l[:, :nlat],            # 11 alat_lo (lat LEFT-face area)
            area_o,                      # 12 alon (lon face area)
        ])                               # (K, nr, nlat)
        self.K = chans.shape[0]
        # per-block extension to (nb, K, ext, nlat): rows i*blk-H ..
        # i*blk+blk+H, edge rows replicated past the walls (those rows
        # are masked out in-kernel)
        H, blk, nb = self.H, self.blk, self.nb
        idx = np.arange(-H, blk + H)
        self.M = np.stack([
            chans[:, np.clip(idx + i * blk, 0, nr - 1), :]
            for i in range(nb)
        ]).astype(self.dtype)            # (nb, K, ext, nlat)
        self._kernel_cache = {}

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
    def __call__(self, rhs_u, rhs_T, T0, dt):
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
        rnorm_u = jnp.sqrt(sums[0])
        bnorm_u = jnp.sqrt(sums[1])
        rnorm_T = jnp.sqrt(sums[2])
        bnorm_T = jnp.sqrt(sums[3])
        # compatibility: subtract the float drift of sum(rhs) (the
        # all-ones nullspace of the weak Laplacian; the caller's jnp
        # path does rhs - mean(rhs))
        rhs_phi = rhs_raw - sums[4] / float(self.geo.n_cells)
        return (u_star, T_new, (uf0, uf1, uf2, rhs_phi),
                (rnorm_u, bnorm_u, rnorm_T, bnorm_T))

    # ------------------------------------------------------------------
    def _build_call(self, dtype):
        nr, nlat, nlon = self.shape
        blk, nb, H, K = self.blk, self.nb, self.H, self.K
        ext = blk + 2 * H
        iters_u, iters_T = self.iters_u, self.iters_T
        k_common = min(iters_u, iters_T)
        iRe, iPe, itv = self.s_iRe, self.s_iPe, self.s_itv
        half = nlon // 2

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
            inv_diag = 1.0 / (vol[None] + coef4 * Ld)

            # global radial index of every extended row (valid-row masks
            # double as the wall-BC row selectors)
            ridx = (jax.lax.broadcasted_iota(jnp.int32, (1, ext, 1, 1), 1)
                    + i * blk - H)

            def apply_A(v, c0, coef):
                """(V - coef * weak_lap) v for channels [c0, c0+C) of
                the [u_r, u_lat, u_lon, T] stack."""
                C = v.shape[0]
                cidx = (jax.lax.broadcasted_iota(jnp.int32, (C, 1, 1, 1),
                                                 0) + c0)
                is_tan = (cidx == 1) | (cidx == 2)
                # radial ghosts: lo wall ANTISYM for every channel; hi
                # wall ANTISYM for u_r (cidx 0), NEUMANN (copy) for rest
                vm = jnp.roll(v, 1, axis=1)
                vm = jnp.where(ridx == 0, -v, vm)
                vp = jnp.roll(v, -1, axis=1)
                vp = jnp.where(ridx == nr - 1,
                               jnp.where(cidx == 0, -v, v), vp)
                lap = cr_hi * (vp - v) + cr_lo * (vm - v)
                # latitude: aligned roll + masked pole-ghost fill
                g_lo = jnp.where(is_tan, -1.0, 1.0) * jnp.roll(
                    v[:, :, 0:1, :], half, axis=-1)
                g_hi = jnp.where(is_tan, -1.0, 1.0) * jnp.roll(
                    v[:, :, -1:, :], half, axis=-1)
                jdx = jax.lax.broadcasted_iota(jnp.int32, v.shape, 2)
                vm_l = jnp.where(jdx == 0, g_lo,
                                 jnp.roll(v, 1, axis=2))
                vp_l = jnp.where(jdx == nlat - 1, g_hi,
                                 jnp.roll(v, -1, axis=2))
                lap = lap + cl_hi * (vp_l - v) + cl_lo * (vm_l - v)
                # longitude: periodic lane rolls
                lap = lap + co * (jnp.roll(v, -1, axis=3)
                                  + jnp.roll(v, 1, axis=3) - 2.0 * v)
                return vol[None] * v - coef * lap

            def apply_A4(v):
                return jnp.concatenate(
                    [apply_A(v[:3], 0, coef_u),
                     apply_A(v[3:], 3, coef_T)], axis=0)

            # extended iterate x0: [halo_lo | block | halo_hi]
            Hx = Hx_ref[0]                         # (4, 2H, nlat, nlon)
            x_blk = jnp.concatenate([ru_ref[:], T0_ref[:][None]], axis=0)
            x = jnp.concatenate([Hx[:, :H], x_blk, Hx[:, H:]], axis=1)

            # extended b: momentum b = vol * rhs_u (rhs_u IS x0);
            # temperature b arrives precomputed with its own halos
            HbT = HbT_ref[0]
            bT = jnp.concatenate([HbT[0, :H], rT_ref[:], HbT[0, H:]],
                                 axis=0)
            b = jnp.concatenate([vol[None] * x[:3], bT[None]], axis=0)

            r = b - apply_A4(x)
            for _ in range(k_common):
                dx = r * inv_diag
                x = x + dx
                r = r - apply_A4(dx)
            # surplus iterations on the lagging system only (1 channel
            # of 4 for temperature — 1/4 the apply cost)
            xu, xT = x[:3], x[3:]
            ru_res, rT_res = r[:3], r[3:]
            for _ in range(iters_T - k_common):
                dxT = rT_res * inv_diag[3:]
                xT = xT + dxT
                rT_res = rT_res - apply_A(dxT, 3, coef_T)
            for _ in range(iters_u - k_common):
                dxu = ru_res * inv_diag[:3]
                xu = xu + dxu
                ru_res = ru_res - apply_A(dxu, 0, coef_u)

            u_ref[:] = xu[:, H:H + blk]
            T_ref[:] = xT[0, H:H + blk]

            # ---- fused projection head: faces + div + Poisson RHS ----
            # (exactly ShellProjectionPallas.faces_div,
            # pallas_stencil.py:842-883; xu is valid on H-iters_u >= 1
            # ghost rows, all the face stencil needs)
            u0w = xu[0, H - 1:H + blk + 1]         # rows block_lo-1..hi+1
            uf0e = 0.5 * (u0w[:-1] + u0w[1:])      # faces block_lo..hi+1
            fidx = (jax.lax.broadcasted_iota(jnp.int32, (blk + 1, 1, 1), 0)
                    + i * blk)
            # lo wall face is exactly 0 (no-slip); the hi wall face sits
            # above a REPLICATED (not BC) ghost row — mask both
            uf0e = jnp.where((fidx == 0) | (fidx == nr),
                             jnp.zeros_like(uf0e), uf0e)

            u1c = xu[1, H:H + blk]
            g_lo = -jnp.roll(u1c[:, 0:1, :], half, axis=-1)  # POLE_FLIP
            p1 = jnp.concatenate([g_lo, u1c], axis=1)
            uf1 = 0.5 * (p1[:, :nlat, :] + p1[:, 1:nlat + 1, :])
            uf1 = jnp.concatenate(
                [jnp.zeros_like(uf1[:, :1, :]), uf1[:, 1:, :]], axis=1)

            u2c = xu[2, H:H + blk]
            uf2 = 0.5 * (jnp.roll(u2c, 1, axis=2) + u2c)

            vol_c = vol[H:H + blk]
            ar_e = M[10][H:H + blk + 1][:, :, None]
            alat_lo = M[11][H:H + blk][:, :, None]
            alon = M[12][H:H + blk][:, :, None]
            aq_r = ar_e * uf0e
            aq_l = alat_lo * uf1
            aq_o = alon * uf2
            zrow = jnp.zeros_like(aq_l[:, :1, :])
            div = (aq_r[1:] - aq_r[:-1]
                   + jnp.concatenate([aq_l[:, 1:, :], zrow], axis=1) - aq_l
                   + jnp.roll(aq_o, -1, axis=2) - aq_o) / vol_c
            rhs = -vol_c * div / dt
            f0_ref[:] = uf0e[:blk]
            f1_ref[:] = uf1
            f2_ref[:] = uf2
            rhs_ref[:] = rhs

            rc_u = ru_res[:, H:H + blk]
            rc_T = rT_res[0, H:H + blk]
            bc = b[:, H:H + blk]
            p_ref[:] = jnp.stack([
                jnp.sum(rc_u * rc_u), jnp.sum(bc[:3] * bc[:3]),
                jnp.sum(rc_T * rc_T), jnp.sum(bc[3] * bc[3]),
                jnp.sum(rhs),
            ]).reshape(1, 1, 5)

        bspec = lambda shape, imap: pl.BlockSpec(shape, imap,
                                                 memory_space=pltpu.VMEM)
        fld = lambda: bspec((blk, nlat, nlon), lambda i: (i, 0, 0))
        grid_spec = pl.GridSpec(
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),        # dt
                bspec((3, blk, nlat, nlon), lambda i: (0, i, 0, 0)),
                fld(),                                        # rhs_T
                fld(),                                        # T0
                bspec((1, 4, 2 * H, nlat, nlon),
                      lambda i: (i, 0, 0, 0, 0)),             # x halos
                bspec((1, 1, 2 * H, nlat, nlon),
                      lambda i: (i, 0, 0, 0, 0)),             # bT halos
                bspec((1, K, ext, nlat), lambda i: (i, 0, 0, 0)),
            ],
            out_specs=[
                bspec((3, blk, nlat, nlon), lambda i: (0, i, 0, 0)),
                fld(),                                        # T_new
                fld(), fld(), fld(),                          # faces
                fld(),                                        # rhs_raw
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
                    vmem_limit_bytes=VMEM_LIMIT_MB * 1024 * 1024),
                interpret=self.interpret,
            )(dt_arr, rhs_u, rhs_T, T0, Hx, HbT, M)

        return call


def make_richardson(geo: Geometry, model, *, interpret: bool = False,
                    use_pallas: Optional[bool] = None,
                    n_devices: Optional[int] = None):
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
    if max(iters_u, iters_T) + 1 > blk:
        return None  # ghost depth must fit within one radial block
    return HelmholtzRichardsonPallas(
        geo, dtype=model.dtype,
        one_over_Re=model.one_over_Re,
        one_over_Pe=model.one_over_Pe,
        nse_interval=p.NSE_solver_interval,
        helm_diags=np.asarray(model.helm_diags),
        T_diag=np.asarray(model.T_diag),
        iters_u=iters_u, iters_T=iters_T,
        interpret=interpret,
    )
