"""A/B the fused Richardson kernel across block sizes / variants.

Times the pallas_call alone (operands precomputed) for each requested
(blk, iters_u, iters_T, track) combination at the bench config.

Usage: python scripts/probe_richardson_blk.py [nr nlat nlon]
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
    import importlib.util

    import jax
    import jax.numpy as jnp

    from dycoreplanet_tpu.base.jax_setup import enable_compilation_cache
    from dycoreplanet_tpu.ops.pallas_richardson import (
        HelmholtzRichardsonPallas)

    enable_compilation_cache()
    spec = importlib.util.spec_from_file_location("graft",
                                                  "__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    shape = tuple(int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 \
        else (32, 128, 256)
    model = graft._make_model("float32", shape=shape)
    geo = model.geo
    nr, nlat, nlon = shape
    dt = np.float32(0.002)
    eps = np.float32(1e-6)

    rng = np.random.RandomState(0)
    rhs_u = jnp.asarray(rng.randn(3, nr, nlat, nlon).astype(np.float32))
    rhs_T = jnp.asarray(rng.randn(nr, nlat, nlon).astype(np.float32))
    T0 = jnp.asarray(rng.randn(nr, nlat, nlon).astype(np.float32))
    x0 = (rhs_u, rhs_T, T0)

    p = model.params
    combos = [
        (8, 1, 2, True),
        (8, 1, 1, True),
        (8, 1, 1, False),
        (8, 1, 2, False),
        (8, 2, 2, True),
    ]
    print(f"shape={shape} dev={jax.devices()[0]}")
    for blk, iu, iT, track in combos:
        if nr % blk:
            continue
        try:
            rk = HelmholtzRichardsonPallas(
                geo, dtype=np.float32,
                one_over_Re=model.one_over_Re,
                one_over_Pe=model.one_over_Pe,
                nse_interval=p.NSE_solver_interval,
                helm_diags=np.asarray(model.helm_diags),
                T_diag=np.asarray(model.T_diag),
                iters_u=iu, iters_T=iT, block_rows=blk,
                track_residual=track)

            def full(x, rk=rk):
                ru, rT, T = x
                u, Tn, pre, (rn_u, bn_u, rn_T, bn_T) = rk(ru, rT, T, dt)
                return (u, Tn, T + eps * (bn_u + rn_T + pre[3]
                                          + pre[0] + pre[1] + pre[2]))

            ms = chain_timer(full, x0) * 1e3
            res = ""
            if track:
                import jax.numpy as jnp2
                u, Tn, pre, (rn_u, bn_u, rn_T, bn_T) = rk(*x0, dt)
                res = (f"  helm r/b={float(rn_u/bn_u):.3e}"
                       f" temp r/b={float(rn_T/bn_T):.3e}")
            print(f"blk={blk:3d} iters={iu}/{iT} track={int(track)} "
                  f"H={rk.H}  {ms:8.3f} ms{res}")
        except Exception as e:  # noqa: BLE001 — survey probe
            print(f"blk={blk:3d} iters={iu}/{iT} track={int(track)}  "
                  f"FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
