"""Stage breakdown of the FEEC coupled 3x3 w-u-p solve (VERDICT r4
item 3): how much of the ms/step is the outer FGMRES machinery vs the
preconditioner sweep vs the operator apply, and how many outer
iterations the solve takes.

Times, as slope-chained jits at the bench FEEC-coupled grid (16x32x64):
  a) K_op apply alone;
  b) M_inv sweep alone (Mw^{-1} -> 2-step Richardson shifted -> exact
     fast-diag Poisson);
  c) one full step (the production number);
and prints the outer iteration count + residual from the step
diagnostics.

Usage: python scripts/probe_feec_coupled.py [nr nlat nlon]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def chain_timer(fn, x0, n1=5, n2=25, reps=3):
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
    from dycoreplanet_tpu.base.params import Parameters
    from dycoreplanet_tpu.models import make_model

    enable_compilation_cache()

    shape = tuple(int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 \
        else (16, 32, 64)
    prm = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data",
        "aqua_planet_shell_test_3d-feec.prm")
    p = Parameters.from_file(prm)
    p.numerics.dtype = "float32"
    p.numerics.feec_formulation = "coupled"
    p.adapt_time_step = False
    p.numerics.n_radial, p.numerics.n_lat, p.numerics.n_lon = shape
    model = make_model(p)
    geo = model.geo
    dt = np.float32(os.environ.get("FEEC_DT", p.time_step))

    import bench

    state = bench._seed_state(model, model.initial_state())
    state, diag = model.step(state, dt)
    state, diag = model.step(state, dt)
    print(f"shape={shape} dev={jax.devices()[0]}")
    print(f"outer iters={int(diag.poisson_iters)} "
          f"helm_res={float(diag.helmholtz_residual):.3e} "
          f"ok={bool(diag.solver_ok)}")

    # rebuild the solver's operator/preconditioner closures by calling
    # the model internals exactly as _solve_momentum_coupled_feec does
    import types

    cap = {}
    real_gmres = None
    from dycoreplanet_tpu.solvers import gmres as gmres_mod

    orig = gmres_mod.gmres

    def spy(op, b, *a, **kw):
        cap["op"] = op
        cap["M"] = kw.get("preconditioner")
        cap["b"] = b
        return orig(op, b, *a, **kw)

    import dycoreplanet_tpu.models.boussinesq as B

    B.gmres = spy
    rhs_u = jnp.asarray(np.random.RandomState(0)
                        .randn(3, *shape).astype(np.float32))
    model._solve_momentum_coupled_feec(rhs_u, dt)
    B.gmres = orig
    K_op, M_inv, b = cap["op"], cap["M"], cap["b"]

    eps = np.float32(1e-6)

    def k_chain(x):
        return x * (1 - eps) + eps * K_op(x)

    def m_chain(x):
        return x * (1 - eps) + eps * M_inv(x)

    def mk_chain(x):
        return x * (1 - eps) + eps * M_inv(K_op(x))

    for name, fn in (("K_op apply", k_chain), ("M_inv sweep", m_chain),
                     ("M_inv(K_op)", mk_chain)):
        ms = chain_timer(fn, b) * 1e3
        print(f"{name:12s} {ms:8.3f} ms")

    def solve_chain(r):
        out = model._solve_momentum_coupled_feec(r, dt)
        return r * (1 - eps) + eps * out[0].sum()

    ms = chain_timer(solve_chain, rhs_u, n1=2, n2=8, reps=2) * 1e3
    print(f"{'solve alone':12s} {ms:8.3f} ms  (random rhs — more outers than a step)")

    def step_chain(s):
        ns, _ = model._step_impl(s, dt)
        return ns

    ms = chain_timer(step_chain, state, n1=2, n2=8, reps=2) * 1e3
    print(f"{'full step':12s} {ms:8.3f} ms")


if __name__ == "__main__":
    main()
