"""MG-vs-spectral sharded pressure-solve crossover (VERDICT r4 item 8).

Round-3 SCALING.md predicted an MG-CG crossover "beyond ~32 devices"
from static byte counts that tallied while_loop-body collectives ONCE
and assumed ~6-10 iterations. This script does the iteration-weighted
accounting properly on the virtual CPU mesh:

  * spectral: the canonical sharded fast-diag solve — comm is ONE psum
    of a global-sized spectral field per solve, zero iterations;
  * MG-CG: comm per ITERATION measured from a straight-line compiled
    CG iteration (V-cycle preconditioner + stencil apply + dots — no
    while_loop, so nothing is undercounted), times the MEASURED
    iteration count of the model's actual solve on a developed-flow
    right-hand side.

Prints a per-device-count table and the comm-time crossover under the
100 GB/s ICI model (ring all-reduce moves ~2x payload). Run:
  python scripts/mg_crossover.py
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=32")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dycoreplanet_tpu.parallel.comm_analysis import collective_bytes  # noqa: E402

ICI_BW = 100e9          # B/s per link (SCALING.md efficiency model)
PER_SHARD = (16, 32, 64)
MESHES = {8: (2, 4), 16: (4, 4), 32: (4, 8)}


def _models(shape):
    import __graft_entry__ as g
    from dycoreplanet_tpu.models import BoussinesqModel

    m_sp = g._make_model("float32", shape=shape)
    m_mg = g._make_model("float32", shape=shape)
    m_mg.params.numerics.poisson_solver = "mg"
    m_mg = BoussinesqModel(m_mg.params)
    return m_sp, m_mg


def _rhs(model, seed=0):
    """Developed-flow-like Poisson RHS: project a seeded velocity."""
    import bench

    st = bench._seed_state(model, model.initial_state())
    div = None
    from dycoreplanet_tpu.ops import stencil as stn

    div = stn.divergence(model.geo, list(st.u_faces))
    rhs = -jnp.asarray(model.vol) * div / np.float32(0.002)
    return rhs - jnp.mean(rhs)


def main():
    print(f"{'N':>3} {'spectral psum B/dev/solve':>26} "
          f"{'mg B/dev/iter':>14} {'mg iters':>9} "
          f"{'mg B/dev/solve':>15} {'winner (comm)':>14}")
    for n, (A, B) in MESHES.items():
        shape = (PER_SHARD[0], PER_SHARD[1] * A, PER_SHARD[2] * B)
        m_sp, m_mg = _models(shape)
        devices = np.asarray(jax.devices()[:n]).reshape(A, B)
        mesh = Mesh(devices, ("lat", "lon"))
        m_sp.prepare_sharded(mesh, pallas=False)
        m_mg._sharded_trace = True

        cell = NamedSharding(mesh, P(None, "lat", "lon"))
        rhs_sp = jax.device_put(_rhs(m_sp), cell)

        # --- spectral: whole solve, comm = one psum --------------------
        def solve_sp(r, cv):
            with m_sp._bound_consts(cv):
                return m_sp._solve_pressure_poisson(r)[0]

        txt = (jax.jit(solve_sp, in_shardings=(cell, None),
                       out_shardings=cell)
               .lower(rhs_sp, m_sp._const_values()).compile().as_text())
        sp = collective_bytes(txt)
        sp_bytes = sum(v["bytes"] for v in sp.values())
        assert sp["all-to-all"]["bytes"] == 0, sp

        # --- MG: one straight-line CG iteration ------------------------
        from dycoreplanet_tpu.ops import stencil as stn

        mg = m_mg.poisson_precond
        geo = m_mg.geo

        def one_iter(x, r, pvec):
            with stn.trace_sharded(True):
                z = mg(r)                                   # V-cycle
                rz = jnp.vdot(r.ravel(), z.ravel())
                Ap = -stn.weak_laplacian(geo, pvec, m_mg.p_specs)
                pAp = jnp.vdot(pvec.ravel(), Ap.ravel())
                alpha = rz / pAp
                return x + alpha * pvec, r - alpha * Ap, z

        rhs_mg = jax.device_put(_rhs(m_mg), cell)
        x0 = jnp.zeros_like(rhs_mg)
        txt = (jax.jit(one_iter,
                       in_shardings=(cell, cell, cell),
                       out_shardings=(cell, cell, cell))
               .lower(x0, rhs_mg, rhs_mg).compile().as_text())
        it = collective_bytes(txt)
        it_bytes = sum(v["bytes"] for v in it.values())
        assert it["all-to-all"]["bytes"] == 0, it

        # --- measured iteration count of the real solve ----------------
        def solve_mg(r, cv):
            with m_mg._bound_consts(cv):
                with stn.trace_sharded(True):
                    return m_mg._solve_pressure_poisson(r)[:2]

        _, iters = jax.jit(solve_mg, in_shardings=(cell, None))(
            rhs_mg, m_mg._const_values())
        iters = int(iters)

        mg_solve = it_bytes * iters
        # ring all-reduce moves ~2x its payload; permutes move 1x —
        # compare total moved bytes as the comm-time proxy
        sp_t = 2 * sp["all-reduce"]["bytes"] + sp["collective-permute"]["bytes"]
        mg_t = iters * (2 * it["all-reduce"]["bytes"]
                        + it["collective-permute"]["bytes"])
        win = "spectral" if sp_t < mg_t else "mg"
        print(f"{n:>3} {sp_bytes:>26,} {it_bytes:>14,} {iters:>9} "
              f"{mg_solve:>15,} {win:>14}  "
              f"(~{sp_t / ICI_BW * 1e6:.0f} vs {mg_t / ICI_BW * 1e6:.0f} us)")


if __name__ == "__main__":
    main()
