"""Per-stage wall-time breakdown of the 3D shell step on the real TPU.

Times each stage of BoussinesqModel._step_impl in isolation by chaining
N dependent applications inside one jit (lax.fori_loop with a feedback
term so nothing is DCE'd), then taking the slope between a short and a
long chain — the same tunnel-safe methodology as bench.py.

Usage: python scripts/perf_breakdown.py [nr nlat nlon]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def chain_timer(fn, x0, n1, n2, reps=1, model=None):
    """Per-application seconds of x -> fn(x) via slope timing.

    When ``model`` is given, its large numpy constants are passed to jit
    as device arguments (not HLO literals) via the model's constant
    registry — required above ~2M cells where embedded literals exceed
    the tunneled remote-compile upload limit."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(x, cvals, n):
        import contextlib
        ctx = (model._bound_consts(cvals) if model is not None
               else contextlib.nullcontext())
        with ctx:
            def body(i, x):
                return fn(x)
            return jax.lax.fori_loop(0, n, body, x)

    cvals = model._const_values() if model is not None else None

    def run(n):
        t0 = time.perf_counter()
        out = chain(x0, cvals, n)
        # force materialization with one scalar pull
        float(jnp.sum(jax.tree.leaves(out)[0]))
        return time.perf_counter() - t0

    run(n1)  # warmup/compile
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
    model = graft._make_model("float32", shape=shape)
    geo = model.geo
    dim = geo.dim
    p = model.params
    dt = np.float32(0.002)
    cells = int(np.prod(geo.cell_shape))

    import bench
    state = bench._seed_state(model, model.initial_state())
    # develop the flow so iteration counts are representative
    for _ in range(5):
        state, _ = model._jit_step(state, dt, model._const_values())
    u, u_faces, pres, T = state.u, state.u_faces, state.p, state.T

    from dycoreplanet_tpu.ops import stencil as st
    from dycoreplanet_tpu.ops import vector as vec
    from dycoreplanet_tpu.solvers.cg import cg
    from dycoreplanet_tpu.base import nondim

    vol = model.vol
    coef = dt * model.one_over_Re
    dt_T = dt / p.NSE_solver_interval
    eps = np.float32(1e-6)

    stages = {}

    # ---- full step --------------------------------------------------
    def full(s):
        ns, _ = model._step_impl(s, dt)
        return ns
    stages["full_step"] = chain_timer(full, state, 3, 23, model=model)

    # ---- explicit forcing (advection + coriolis + buoyancy + curv) --
    def forcing(u):
        rho = nondim.density_scaling(model.beta, T, model.T_ref)
        buoy = (rho - model.rho_background)[None] * model.gravity
        adv = jnp.stack([
            st.advect_scalar(geo, u_faces, u[c], model.u_specs[c],
                             scheme=model.advection_scheme, form="advective")
            for c in range(dim)
        ]) + vec.advection_curvature(geo, u)
        cor = vec.coriolis_acceleration(geo, u, model.omega_hat,
                                        model.coriolis_mode)
        visc = model.one_over_Re * vec.vector_laplacian_curvature(
            geo, u, model.u_specs)
        gradp = jnp.stack([
            st.centered_gradient(geo, pres, d, model.p_specs[d])
            for d in range(dim)])
        f = -adv + cor + buoy + visc - gradp
        return u + eps * f  # feedback keeps the chain alive
    stages["explicit_forcing"] = chain_timer(forcing, u, 5, 45, model=model)

    # fused Pallas forcing (the path the step actually takes on TPU)
    if model._forcing_pallas is not None:
        fp = model._forcing_pallas

        def forcing_pallas(x):
            out = fp(x, u_faces, T, pres, dt)
            if fp.advect_T:
                out = out[0]
            return x * (1 - eps) + eps * out
        stages["forcing_pallas"] = chain_timer(
            forcing_pallas, u, 10, 90, model=model)

    # ---- Helmholtz batched CG --------------------------------------
    def helm_op(x):
        return vol[None] * x - coef * jnp.stack([
            st.weak_laplacian(geo, x[c], model.u_specs[c])
            for c in range(dim)])

    helm_diag = vol[None] + coef * model.helm_diags

    def helm(x):
        res = cg(helm_op, vol[None] * x, x0=x,
                 rtol=p.numerics.helmholtz_tol,
                 maxiter=p.numerics.max_cg_iters,
                 preconditioner=lambda r: r / helm_diag)
        return x + eps * res.x
    stages["helmholtz_cg"] = chain_timer(helm, u, 5, 25, model=model)

    # one raw Helmholtz operator application (stencil cost unit)
    stages["helm_op_apply"] = chain_timer(
        lambda x: x + eps * helm_op(x), u, 10, 110, model=model)

    # ---- Poisson (spectral direct or CG) -----------------------------
    uf = [model._apply_wall_face_values(
        model._interp_component_to_faces(u[c], c), c) for c in range(dim)]
    div_star = st.divergence(geo, uf)
    rhs0 = -vol * div_star / dt
    rhs0 = rhs0 - jnp.mean(rhs0)

    if model.poisson_spectral is not None:
        def pois(r):
            phi, _ = model.poisson_spectral.solve(r)
            return r + eps * phi
        stages["poisson_spectral"] = chain_timer(pois, rhs0, 5, 45, model=model)

    # ---- temperature (advect + CG) -----------------------------------
    kT = dt_T * model.one_over_Pe

    def temp_op(x):
        return vol * x - kT * st.weak_laplacian(geo, x, model.T_specs_hom)

    diag_T = vol + kT * model.T_diag

    def temp(Tx):
        T_adv = model._advected_temperature(u, u_faces, Tx, dt_T)
        rhs_T = vol * T_adv + kT * model.T_lap_offset
        res = cg(temp_op, rhs_T, x0=Tx, rtol=p.numerics.temperature_tol,
                 maxiter=p.numerics.max_cg_iters,
                 preconditioner=lambda r: r / diag_T)
        return res.x
    stages["temperature_solve"] = chain_timer(temp, T, 5, 45, model=model)

    # ---- projection correction + diagnostics (the rest) --------------
    total = stages["full_step"]
    acct = (stages["explicit_forcing"] + stages["helmholtz_cg"]
            + stages.get("poisson_spectral", 0.0)
            + stages["temperature_solve"])
    stages["other(correction+diag)"] = total - acct

    print(f"\nshape={geo.cell_shape} cells={cells} dev={jax.devices()[0]}")
    print(f"{'stage':28s} {'ms':>9s} {'%':>6s} {'GB/s_eff':>9s}")
    for k, v in stages.items():
        frac = 100.0 * v / total
        # effective bandwidth if the stage were one read+write of state
        bw = cells * 8.0 / max(v, 1e-12) / 1e9
        print(f"{k:28s} {v*1e3:9.3f} {frac:6.1f} {bw:9.1f}")
    print(f"{'points/s (full)':28s} {cells/total:9.3e}")


if __name__ == "__main__":
    main()
