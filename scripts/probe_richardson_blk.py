"""A/B the fused Richardson kernel's radial block size (VERDICT r4 #1).

blk=8 (nb=4) gives more grid-step pipelining but 75% redundant-row
overhead at H=3 (ext 14 vs blk 8); blk=16 (nb=2) halves the redundancy
(ext 22 vs 16, 37.5%) at the cost of coarser DMA/compute overlap and
~2x the VMEM working set. Usage:

  python scripts/probe_richardson_blk.py [nr nlat nlon] [iters_u iters_T]
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
    from dycoreplanet_tpu.ops.pallas_richardson import (
        HelmholtzRichardsonPallas)

    enable_compilation_cache()
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft", "__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    args = [int(a) for a in sys.argv[1:]]
    shape = tuple(args[:3]) if len(args) >= 3 else (32, 128, 256)
    it_u, it_T = (args[3], args[4]) if len(args) >= 5 else (1, 2)
    model = graft._make_model("float32", shape=shape)
    geo = model.geo
    nr, nlat, nlon = shape
    dt = np.float32(0.002)
    eps = np.float32(1e-6)
    rng = np.random.RandomState(0)
    x0 = (jnp.asarray(rng.randn(3, nr, nlat, nlon).astype(np.float32)),
          jnp.asarray(rng.randn(nr, nlat, nlon).astype(np.float32)),
          jnp.asarray(rng.randn(nr, nlat, nlon).astype(np.float32)))

    print(f"shape={shape} iters={it_u}/{it_T} dev={jax.devices()[0]}")
    ref = None
    for blk in (8, 16, 32):
        if nr % blk or blk > nr:
            continue
        rk = HelmholtzRichardsonPallas(
            geo, dtype=np.float32, one_over_Re=model.one_over_Re,
            one_over_Pe=model.one_over_Pe,
            nse_interval=model.params.NSE_solver_interval,
            helm_diags=np.asarray(model.helm_diags),
            T_diag=np.asarray(model.T_diag),
            iters_u=it_u, iters_T=it_T, block_rows=blk)

        def full(x, rk=rk):
            ru, rT, T = x
            u, Tn, pre, (rn_u, bn_u, rn_T, bn_T) = rk(ru, rT, T, dt)
            return (u, Tn, T + eps * (rn_u + rn_T + pre[3]
                                      + pre[0] + pre[1] + pre[2]))

        u, Tn, pre, _ = rk(*x0, dt)
        if ref is None:
            ref = np.asarray(u)
        else:
            err = float(np.max(np.abs(np.asarray(u) - ref)))
            print(f"  blk={blk}: max|u - blk8 u| = {err:.2e}")
        ms = chain_timer(full, x0) * 1e3
        print(f"  blk={blk} nb={rk.nb} ext={rk.blk + 2 * rk.H}: "
              f"{ms:8.3f} ms")


if __name__ == "__main__":
    main()
