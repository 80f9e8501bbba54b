"""Halo/compute overlap evidence from the compiled schedule (VERDICT r4
item 9; SURVEY §5's "ppermute overlapped with interior stencil
compute", the TPU analogue of the reference's ghost-dof import,
boussinesq_model.tpp:244-251).

No multi-chip hardware exists in this environment, and the CPU backend
compiles collective-permutes synchronously (no -start/-done pairs), so
the evidence is DATAFLOW: in the compiled module, for every
collective-permute, count the instructions scheduled between it and its
first use that do NOT transitively depend on its result — exactly the
work the TPU backend's async scheduler (which lowers each permute to a
start/done pair by default) can execute while the permute is in flight.
A zero shadow would mean the halo is on the critical path with nothing
to hide behind; a large shadow means the schedule has independent local
work in every permute's window. Measured on (a) the sharded forcing
kernel path (shard_map: all ppermutes issued first by construction,
parallel/sharded_pallas.py _local_step) and (b) the full
prepare_sharded step (GSPMD halos).

Run: python scripts/overlap_evidence.py
"""

import os
import re
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_DEF = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=")
_USE = re.compile(r"%([\w.\-]+)")
_PERM = re.compile(r"collective-permute(?:-start)?\(")


def shadow_stats(hlo: str):
    """For each collective-permute: the number of instructions between
    it and its first (transitive) dependent that do NOT depend on its
    result — the independent work an async scheduler can hide the
    permute behind. Returns a list of shadow lengths."""
    out = []
    for comp in hlo.split("\n\n"):
        lines = [ln for ln in comp.splitlines() if "=" in ln]
        defs = []
        for ln in lines:
            md = _DEF.match(ln)
            defs.append(md.group(1) if md else None)
        for idx, ln in enumerate(lines):
            if not _PERM.search(ln) or defs[idx] is None:
                continue
            dep = {defs[idx]}
            indep = 0
            hit = False
            for j in range(idx + 1, len(lines)):
                ops = set(_USE.findall(lines[j])) - {defs[j]}
                if ops & dep:
                    if defs[j] is None:
                        break
                    dep.add(defs[j])
                    # first DIRECT consumer of the permute result ends
                    # the shadow window
                    if not hit:
                        hit = True
                        out.append(indep)
                        break
                else:
                    indep += 1
            if not hit:
                out.append(indep)
    return out


def report(tag, hlo):
    shadows = sorted(shadow_stats(hlo))
    n = len(shadows)
    if not n:
        print(f"{tag}: no collective-permutes found")
        return
    print(f"{tag}: {n} permutes; independent-work shadow "
          f"min={shadows[0]} median={shadows[n // 2]} "
          f"max={shadows[-1]} instructions "
          f"({sum(1 for s in shadows if s > 0)}/{n} with independent "
          f"work available before the first consumer)")


def main():
    import __graft_entry__ as g
    from dycoreplanet_tpu.parallel.mesh import (build_mesh, shard_state,
                                                state_sharding)

    model = g._make_model("float32", shape=(8, 32, 64))
    mesh = build_mesh(model.geo, jax.devices()[:8])

    # (a) the sharded forcing kernel alone: ppermutes issued first by
    # construction (parallel/sharded_pallas.py _local_step)
    m2 = g._make_model("float32", shape=(8, 32, 64))
    assert m2.enable_sharded_pallas(mesh, interpret=True)
    fp = m2._forcing_pallas
    cell = NamedSharding(mesh, P(None, "lat", "lon"))
    vec = NamedSharding(mesh, P(None, None, "lat", "lon"))
    s = shard_state(m2.initial_state(), m2.geo, mesh)

    def forcing(u, f0, f1, f2, T, p):
        return fp(u, (f0, f1, f2), T, p, np.float32(0.01))

    txt = (jax.jit(forcing,
                   in_shardings=(vec,) + (cell,) * 5)
           .lower(s.u, *s.u_faces, s.T, s.p).compile().as_text())
    report("sharded forcing kernel (shard_map ppermute halos)", txt)

    # (b) the full canonical sharded step (prepare_sharded)
    m3 = g._make_model("float32", shape=(8, 32, 64))
    m3.prepare_sharded(mesh, pallas=False)
    st3 = shard_state(m3.initial_state(), m3.geo, mesh)
    sh = state_sharding(m3.geo, mesh)
    rep = NamedSharding(mesh, P())
    txt = (jax.jit(m3._step_impl, in_shardings=(sh, rep),
                   out_shardings=(sh, rep))
           .lower(st3, np.float32(0.01)).compile().as_text())
    report("full prepare_sharded step (GSPMD halos)", txt)


if __name__ == "__main__":
    main()
