"""Marginal cost of each stage of the PRODUCTION shell step, measured
as cumulative-prefix chains: prefix k runs stages 1..k of _step_impl's
fused-Richardson branch and feeds a state-shaped carry, so each
marginal difference includes the real inter-stage materialization that
isolated-stage probes (probe_prod_stages.py) miss.

Usage: python scripts/probe_step_cumulative.py [nr nlat nlon]
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

    from dycoreplanet_tpu.models.boussinesq import StepDiagnostics
    from dycoreplanet_tpu.ops import stencil as st

    vol = model.vol
    dt_T = dt / p.NSE_solver_interval
    eps = np.float32(1e-6)
    fp = model._forcing_pallas
    rk = model._richardson_pallas
    pj = model._proj_pallas
    assert fp is not None and rk is not None and fp.advect_T

    def feed(s, *arrays):
        """Fold stage outputs back into the carried state (keeps every
        stage live without changing shapes)."""
        du = sum(eps * a for a in arrays if a.shape == s.u.shape)
        dT = sum((eps * a for a in arrays if a.shape == s.T.shape),
                 start=jnp.zeros_like(s.T))
        return s._replace(u=s.u * (1 - eps) + du, T=s.T + dT)

    def p1(s):  # forcing kernel
        rhs_u, T_adv = fp(s.u, s.u_faces, s.T, s.p, dt)
        return feed(s, rhs_u, T_adv)

    def p2(s):  # + richardson kernel (incl. rhs_T assembly + fused
        #           projection head: faces + div + Poisson RHS)
        rhs_u, T_adv = fp(s.u, s.u_faces, s.T, s.p, dt)
        rhs_T = vol * T_adv + dt_T * model.one_over_Pe * model.T_lap_offset
        u_star, T_new, pre, (rn_u, bn_u, rn_T, bn_T) = rk(
            rhs_u, rhs_T, s.T, dt)
        return feed(s, u_star, T_new + rn_u + rn_T + pre[3]
                    + pre[0] + pre[1] + pre[2])

    def p4(s):  # + poisson
        rhs_u, T_adv = fp(s.u, s.u_faces, s.T, s.p, dt)
        rhs_T = vol * T_adv + dt_T * model.one_over_Pe * model.T_lap_offset
        u_star, T_new, pre, _ = rk(rhs_u, rhs_T, s.T, dt)
        phi, _, _, _ = model._solve_pressure_poisson(pre[3])
        return feed(s, u_star, T_new + phi)

    def p5(s):  # + correction (full projection) = everything but diag
        rhs_u, T_adv = fp(s.u, s.u_faces, s.T, s.p, dt)
        rhs_T = vol * T_adv + dt_T * model.one_over_Pe * model.T_lap_offset
        u_star, T_new, pre, _ = rk(rhs_u, rhs_T, s.T, dt)
        u_new, p_new, faces, _, _, _ = model._project_velocity(
            u_star, s.p, dt, prefused=pre)
        return s._replace(u=u_new, u_faces=tuple(faces), p=p_new, T=T_new)

    def p6(s):  # full step (state + diagnostics pack kept live)
        ns, packed = model._step_impl(s, dt)
        return ns._replace(T=ns.T + eps * packed[10])

    def p6b(s):  # full step, diagnostics DCE'd (scan collect=False mode)
        ns, _ = model._step_impl(s, dt)
        return ns

    stages = {}
    for name, fn in (("1 forcing", p1),
                     ("2 +richardson(+faces)", p2),
                     ("4 +poisson", p4),
                     ("5 +correction(state)", p5),
                     ("6 full(+diag pack)", p6),
                     ("6b full(diag DCEd)", p6b)):
        stages[name] = chain_timer(fn, state, 10, 90, model=model)

    print(f"\nshape={geo.cell_shape} dev={jax.devices()[0]}")
    print(f"{'prefix':24s} {'ms':>9s} {'marginal':>9s}")
    prev = 0.0
    for k, v in stages.items():
        print(f"{k:24s} {v*1e3:9.3f} {(v-prev)*1e3:9.3f}")
        prev = v


if __name__ == "__main__":
    main()
