"""Time the stages the PRODUCTION step actually executes (the
fixed-iteration Richardson solves, the fused Pallas kernels, the jnp
correction chain, the fast-diag Poisson at each precision mode) —
perf_breakdown.py times the CG/jnp fallbacks, which is the wrong
accounting for the optimized path.

Usage: python scripts/probe_prod_stages.py [nr nlat nlon]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def chain_timer(fn, x0, n1, n2, reps=3, model=None):
    import contextlib

    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(x, cvals, n):
        ctx = (model._bound_consts(cvals) if model is not None
               else contextlib.nullcontext())
        with ctx:
            return jax.lax.fori_loop(0, n, lambda i, x: fn(x), x)

    cvals = model._const_values() if model is not None else None

    def run(n):
        t0 = time.perf_counter()
        out = chain(x0, cvals, n)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        return time.perf_counter() - t0

    run(n1)
    t1 = min(run(n1) for _ in range(reps))
    t2 = min(run(n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def main():
    import jax
    import jax.numpy as jnp

    from dycoreplanet_tpu.base.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import importlib.util

    spec = importlib.util.spec_from_file_location("graft", "__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    shape = tuple(int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 \
        else (32, 128, 256)
    # the SHIPPED bench configuration (see bench.py main): per-step
    # residual checking with the documented k=1/1 + bf16x3-Poisson
    # opt-ins
    model = graft._make_model("float32", shape=shape,
                              poisson_precision="high",
                              momentum_fixed_iters=1,
                              residual_check_interval=1,
                              fixed_solver_iters=1)
    geo = model.geo
    dim = geo.dim
    p = model.params
    dt = np.float32(0.002)

    import bench
    state = bench._seed_state(model, model.initial_state())
    for _ in range(5):
        state, _ = model._jit_step(state, dt, model._const_values())
    u, u_faces, pres, T = state.u, state.u_faces, state.p, state.T

    from dycoreplanet_tpu.ops import stencil as st
    from dycoreplanet_tpu.solvers.fixed import richardson_solve

    vol = model.vol
    coef = dt * model.one_over_Re
    dt_T = dt / p.NSE_solver_interval
    eps = np.float32(1e-6)
    stages = {}

    def full(s):
        ns, _ = model._step_impl(s, dt)
        return ns
    stages["full_step"] = chain_timer(full, state, 3, 23, model=model)

    # ---- fused forcing (+T transport) ---------------------------------
    fp = model._forcing_pallas
    if fp is not None:
        def forcing_pallas(x):
            out = fp(x, u_faces, T, pres, dt)
            if fp.advect_T:
                out = out[0]
            return x * (1 - eps) + eps * out
        stages["forcing_pallas"] = chain_timer(
            forcing_pallas, u, 10, 90, model=model)

    # ---- Richardson Helmholtz (the production solve) ------------------
    def helm_op(x):
        return vol[None] * x - coef * jnp.stack([
            st.weak_laplacian(geo, x[c], model.u_specs[c])
            for c in range(dim)])

    helm_diag = vol[None] + coef * model.helm_diags

    def helm_rich(x):
        res = richardson_solve(helm_op, vol[None] * x, x, diag=helm_diag,
                               iters=p.numerics.fixed_solver_iters,
                               rtol=p.numerics.helmholtz_tol)
        return x * (1 - eps) + eps * res.x
    stages["helm_richardson"] = chain_timer(helm_rich, u, 10, 90,
                                            model=model)

    # ---- Richardson temperature (solve only, advect is fused) ---------
    kT = dt_T * model.one_over_Pe

    def temp_op(x):
        return vol * x - kT * st.weak_laplacian(geo, x, model.T_specs_hom)

    diag_T = vol + kT * model.T_diag

    def temp_rich(Tx):
        rhs_T = vol * Tx + kT * model.T_lap_offset
        res = richardson_solve(temp_op, rhs_T, Tx, diag=diag_T,
                               iters=p.numerics.fixed_solver_iters,
                               rtol=p.numerics.temperature_tol)
        return res.x
    stages["temp_richardson"] = chain_timer(temp_rich, T, 10, 90,
                                            model=model)

    # ---- fused Richardson kernel (both solves in one pass) ------------
    if model._richardson_pallas is not None:
        rk = model._richardson_pallas

        def rich_fused(x):
            u_s, T_n, prefused, _ = rk(x[0], vol * x[1], x[1], dt)
            return (x[0] * (1 - eps) + eps * u_s + eps * prefused[3],
                    T_n)
        stages["richardson_pallas"] = chain_timer(
            rich_fused, (u, T), 10, 90, model=model)

    # ---- faces_div Pallas ---------------------------------------------
    if model._proj_pallas is not None:
        def fdiv(x):
            uf0, uf1, uf2, rhs_raw, psums = model._proj_pallas.faces_div(
                x[0], dt)
            return (x[0] + eps * jnp.stack([uf0, uf1, uf2]), x[1])
        stages["faces_div_pallas"] = chain_timer(
            fdiv, (u, pres), 10, 90, model=model)

    # ---- Poisson at each precision -------------------------------------
    rhs0 = pres - jnp.mean(pres)
    from dycoreplanet_tpu.solvers.spectral import ShellPoissonFastDiag

    op = lambda x: -st.weak_laplacian(geo, x, model.p_specs)
    for prec in ("highest", "high", "high-refine"):
        s = ShellPoissonFastDiag(geo, dtype=np.float32, precision=prec,
                                 refine_op=op)

        def pois(r, s=s):
            phi, _ = s.solve(r)
            return r * (1 - eps) + eps * phi
        stages[f"poisson_{prec}"] = chain_timer(pois, rhs0, 10, 90,
                                                model=model)

    # accuracy of each mode against an f64 solve
    s64 = ShellPoissonFastDiag(geo, dtype=np.float64)
    x64, _ = s64.solve(rhs0.astype(jnp.float64))
    x64 = x64 - jnp.mean(x64)
    for prec in ("highest", "high", "high-refine"):
        s = ShellPoissonFastDiag(geo, dtype=np.float32, precision=prec,
                                 refine_op=op)
        x, _ = s.solve(rhs0)
        x = x.astype(jnp.float64)
        x = x - jnp.mean(x)
        rel = float(jnp.linalg.norm(x - x64) / jnp.linalg.norm(x64))
        print(f"accuracy {prec:12s}: rel_l2={rel:.3e}")

    # ---- correction chain (jnp) ----------------------------------------
    def correct(args):
        u_star, phi = args
        phi = phi - st.volume_mean(geo, phi)
        new_faces = []
        for d in range(dim):
            gphi = st.grad_left_faces(geo, phi, d, model.p_specs[d])
            uf_new = u_faces[d] - dt * gphi
            new_faces.append(model._apply_wall_face_values(uf_new, d))
        gradphi_c = jnp.stack([
            st.centered_gradient(geo, phi, d, model.p_specs[d])
            for d in range(dim)])
        u_new = u_star - dt * gradphi_c
        return (u_new, phi + eps * jnp.sum(jnp.stack(
            [f.sum() for f in new_faces])))
    stages["correction_jnp"] = chain_timer(correct, (u, pres), 10, 90,
                                           model=model)

    # ---- diagnostics block ---------------------------------------------
    def diag(x):
        speed = st.cell_max_speed(geo, x)
        cfl = jnp.max(jnp.maximum(speed, 1e-10) / model.diameter)
        div_new = st.divergence(geo, u_faces)
        return x * (1 - eps) + eps * (cfl + jnp.max(jnp.abs(div_new)))
    stages["diagnostics"] = chain_timer(diag, u, 10, 90, model=model)

    total = stages["full_step"]
    print(f"\nshape={geo.cell_shape} dev={jax.devices()[0]}")
    print(f"{'stage':24s} {'ms':>9s} {'%':>6s}")
    acct = 0.0
    for k, v in stages.items():
        print(f"{k:24s} {v*1e3:9.3f} {100.0*v/total:6.1f}")
        if k not in ("full_step", "poisson_highest", "poisson_high"):
            acct += v
    print(f"{'sum(stages)':24s} {acct*1e3:9.3f} {100.0*acct/total:6.1f}")


if __name__ == "__main__":
    main()
