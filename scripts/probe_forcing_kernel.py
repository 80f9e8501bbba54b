"""One-off probe: forcing-kernel variants timed in one TPU process.

Times ShellForcingPallas alone (chained applications, slope timing) for
a matrix of block sizes and schemes, to locate the kernel's structural
floor. Traffic bound at 32x128x256 f32 with fused T transport:
12 fields x 4 MB / 819 GB/s ~ 0.059 ms.

Usage: python scripts/probe_forcing_kernel.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from dycoreplanet_tpu.base.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft", "__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)
    import bench

    model = graft._make_model("float32", shape=(32, 128, 256))
    state = bench._seed_state(model, model.initial_state())
    base = model._forcing_pallas
    assert base is not None
    geo = model.geo
    dt = np.float32(0.002)

    from dycoreplanet_tpu.ops.pallas_stencil import ShellForcingPallas

    def make(block_rows, scheme):
        return ShellForcingPallas(
            geo, dtype=np.float32, beta=base.s_beta, T_ref=base.s_Tref,
            rho_background=base.s_rho_bg,
            gravity_r=np.asarray(base.M[8], np.float64)[..., None],
            one_over_Re=base.s_iRe, omega_hat=base.s_omega,
            coriolis_mode=base.coriolis_mode, buoyancy=base.buoyancy,
            scheme=scheme, include_gradp=base.include_gradp,
            advect_T=base.advect_T,
            T_wall=base.T_wall if base.advect_T else None,
            dt_T_factor=base.dt_T_factor, block_rows=block_rows)

    u, uf, T, p = state.u, state.u_faces, state.T, state.p

    def timeit(tag, kern):
        @jax.jit
        def chain(u0, n):
            def body(i, carry):
                uu, TT = carry
                out = kern(uu, uf, TT, p, dt)
                if kern.advect_T:
                    rhs, Tn = out
                else:
                    rhs, Tn = out, TT
                return 0.999 * rhs + 1e-6, Tn
            return jax.lax.fori_loop(0, n, body, (u0, T))

        def run(n):
            t0 = time.perf_counter()
            out = chain(u, n)
            float(jnp.sum(out[0]))
            return time.perf_counter() - t0

        run(4)
        t1 = min(run(4) for _ in range(5))
        t2 = min(run(64) for _ in range(5))
        ms = (t2 - t1) / 60 * 1e3
        print(f"{tag:30s} {ms:.4f} ms")
        return ms

    import dycoreplanet_tpu.ops.pallas_stencil as ps
    ps.VMEM_LIMIT_MB = 120  # probe-only: let big blocks compile

    for blk in (8, 16, 32):
        for scheme in ("muscl", "upwind"):
            try:
                timeit(f"blk={blk} scheme={scheme}", make(blk, scheme))
            except Exception as e:
                print(f"blk={blk} scheme={scheme}: FAILED "
                      f"{str(e).splitlines()[0][:90]}")


if __name__ == "__main__":
    main()
