"""Decompose the fused-Richardson stage cost (VERDICT r4 item 1).

Times, as separate slope-chained jits at the bench config:
  a) the XLA-side operand assembly (_deep_halos of the 4-channel stack
     + rhs_T) alone;
  b) the pallas_call alone, operands precomputed;
  c) the full stage (assembly + kernel) — the production composition;
  d) kernel variants with iters=1 (ghost depth 2) for the accuracy/
     speed trade;
  e) the jnp oracle (3 weak_laplacian applies) for scale.

Usage: python scripts/probe_richardson_kernel.py [nr nlat nlon]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def chain_timer(fn, x0, n1=10, n2=90, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(x, n):
        return jax.lax.fori_loop(0, n, lambda i, x: fn(x), x)

    def run(n):
        t0 = time.perf_counter()
        out = chain(x0, n)
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
    model = graft._make_model("float32", shape=shape)
    rk = model._richardson_pallas
    assert rk is not None
    nr, nlat, nlon = shape
    dt = np.float32(0.002)
    eps = np.float32(1e-6)

    rng = np.random.RandomState(0)
    rhs_u = jnp.asarray(rng.randn(3, nr, nlat, nlon).astype(np.float32))
    rhs_T = jnp.asarray(rng.randn(nr, nlat, nlon).astype(np.float32))
    T0 = jnp.asarray(rng.randn(nr, nlat, nlon).astype(np.float32))

    x0 = (rhs_u, rhs_T, T0)

    # a) operand assembly alone
    def assembly(x):
        ru, rT, T = x
        st4 = jnp.concatenate([ru, T[None]], axis=0)
        Hx = rk._deep_halos(st4)
        HbT = rk._deep_halos(rT[None])
        s = jnp.sum(Hx) + jnp.sum(HbT)
        return (ru * (1 - eps) + eps * s, rT, T)

    # b) kernel alone (operands precomputed OUTSIDE the chain)
    st4 = jnp.concatenate([rhs_u, T0[None]], axis=0)
    Hx0 = rk._deep_halos(st4)
    HbT0 = rk._deep_halos(rhs_T[None])
    M0 = jnp.asarray(rk.M, jnp.float32)
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1, 1)
    call = rk._build_call(jnp.dtype(jnp.float32))

    def kernel_only(x):
        ru, rT, T = x
        u, Tn, f0, f1, f2, rhs, parts = call(
            dt_arr, ru, rT, T, Hx0, HbT0, M0)
        return (u, Tn, T + eps * (jnp.sum(parts) + rhs + f0 + f1 + f2))

    # c) full stage
    def full(x):
        ru, rT, T = x
        u, Tn, pre, (rn_u, bn_u, rn_T, bn_T) = rk(ru, rT, T, dt)
        return (u, Tn, T + eps * (rn_u + rn_T + pre[3]
                                  + pre[0] + pre[1] + pre[2]))

    # e) jnp oracle: the fallback Richardson path (momentum + T)
    from dycoreplanet_tpu.ops import stencil as st
    from dycoreplanet_tpu.solvers.fixed import richardson_solve

    geo = model.geo
    vol = jnp.asarray(model.vol)
    coef = dt * model.one_over_Re
    kT = dt * model.one_over_Pe
    helm_diag = vol[None] + coef * jnp.asarray(model.helm_diags)
    diag_T = vol + kT * jnp.asarray(model.T_diag)

    def helm_op(x):
        return vol[None] * x - coef * jnp.stack([
            st.weak_laplacian(geo, x[c], model.u_specs[c])
            for c in range(3)])

    def temp_op(x):
        return vol * x - kT * st.weak_laplacian(geo, x, model.T_specs_hom)

    def jnp_oracle(x):
        ru, rT, T = x
        res_u = richardson_solve(helm_op, vol[None] * ru, ru,
                                 diag=helm_diag, iters=rk.iters_u,
                                 rtol=1e-8)
        res_T = richardson_solve(temp_op, rT, T, diag=diag_T,
                                 iters=rk.iters_T, rtol=1e-12)
        return (res_u.x, res_T.x,
                T + eps * (res_u.residual_norm + res_T.residual_norm))

    rows = [("a assembly only", assembly),
            ("b kernel only", kernel_only),
            ("c full stage", full),
            ("e jnp oracle", jnp_oracle)]

    print(f"shape={shape} dev={jax.devices()[0]} iters={rk.iters_u}/{rk.iters_T} "
          f"blk={rk.blk} H={rk.H}")
    for name, fn in rows:
        ms = chain_timer(fn, x0) * 1e3
        print(f"{name:20s} {ms:8.3f} ms")

    # d) iters=1 variant
    from dycoreplanet_tpu.ops.pallas_richardson import (
        HelmholtzRichardsonPallas)

    rk1 = HelmholtzRichardsonPallas(
        geo, dtype=np.float32, one_over_Re=model.one_over_Re,
        one_over_Pe=model.one_over_Pe,
        nse_interval=model.params.NSE_solver_interval,
        helm_diags=np.asarray(model.helm_diags),
        T_diag=np.asarray(model.T_diag), iters_u=1, iters_T=2)

    def full1(x):
        ru, rT, T = x
        u, Tn, pre, (rn_u, bn_u, rn_T, bn_T) = rk1(ru, rT, T, dt)
        return (u, Tn, T + eps * (rn_u + rn_T + pre[3]
                                  + pre[0] + pre[1] + pre[2]))

    ms = chain_timer(full1, x0) * 1e3
    print(f"{'d full ku=1 kT=2':20s} {ms:8.3f} ms")

    # residual quality of iters=1 vs 2 on a developed-flow-like rhs
    import bench
    state = bench._seed_state(model, model.initial_state())
    for _ in range(5):
        state, _ = model._jit_step(state, dt, model._const_values())
    fp = model._forcing_pallas
    out = fp(state.u, state.u_faces, state.T, state.p, dt)
    rhs_u_r, T_adv = out
    rhs_T_r = (vol * T_adv
               + dt * model.one_over_Pe * jnp.asarray(model.T_lap_offset))
    for k, r in (("2/2", rk), ("1/2", rk1)):
        _, _, _, (rn_u, bn_u, rn_T, bn_T) = r(rhs_u_r, rhs_T_r, state.T, dt)
        print(f"iters={k}: helm r/b={float(rn_u / bn_u):.3e} "
              f"temp r/b={float(rn_T / bn_T):.3e}")


if __name__ == "__main__":
    main()
