"""Communication-structure pin: compile the sharded 3D-shell step and
assert the collective mix in the HLO.

The BASELINE north star requires that the only GLOBAL collectives be
the solver/diagnostic reductions; halos must be nearest-neighbor
permutes. The spectral pressure solve additionally performs pencil
transposes (all-to-all) for its lon-FFT / lat-eigentransform along
sharded axes — the standard distributed-FFT decomposition.
(Generalizes the reference's communication structure: neighbor
exchange at stencils, Allreduce at Krylov dots — SURVEY.md section 5.)
"""

import re

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dycoreplanet_tpu.parallel.mesh import build_mesh, shard_state, \
    state_sharding


def _compiled_step_text():
    import __graft_entry__ as g

    model = g._make_model("float32", shape=(8, 16, 32))
    mesh = build_mesh(model.geo)
    state = shard_state(model.initial_state(), model.geo, mesh)
    sh = state_sharding(model.geo, mesh)
    rep = NamedSharding(mesh, P())
    step = jax.jit(model._step_impl,
                   in_shardings=(sh, rep), out_shardings=(sh, rep))
    return step.lower(state, np.float32(0.01)).compile().as_text()


def test_collective_structure_of_sharded_step():
    txt = _compiled_step_text()
    counts = {
        op: len(re.findall(rf"{op}(?:-start)?\.?\d*\s*=", txt))
        for op in ("all-reduce", "collective-permute", "all-gather",
                   "all-to-all", "reduce-scatter")
    }
    # global reductions only from Krylov dots + diagnostics: O(10)
    assert 0 < counts["all-reduce"] <= 60, counts
    # halo exchange exists and is permute-based
    assert counts["collective-permute"] > 0, counts
    # no accidental full-array gathers outside the spectral transposes
    assert counts["all-gather"] <= 10, counts


def test_collective_byte_volume_bounds():
    """Bound communication VOLUME, not just op counts (SCALING.md):
    an accidental replication/gather of a full field shows up here.

    Weak-scaling property under test at fixed per-shard work:
      * halo (collective-permute) payload per device stays O(shard
        surface) — bounded by a few field-equivalents;
      * all-reduce payload stays scalar-dominated;
      * all-gather payload stays ~zero (no full-field replication)."""
    import __graft_entry__ as g

    from dycoreplanet_tpu.parallel.comm_analysis import step_comm_summary

    per_shard = (8, 16, 32)
    results = {}
    for n, mul in ((2, (1, 1, 2)), (8, (1, 2, 4))):
        shape = tuple(s * m for s, m in zip(per_shard, mul))
        model = g._make_model("float32", shape=shape)
        results[n] = step_comm_summary(model, n)

    field_bytes = 4 * int(np.prod(per_shard))  # one per-shard f32 field
    for n, s in results.items():
        assert s["all-gather"]["bytes"] <= field_bytes, (n, s)
        # reductions: Krylov dots + diagnostics + per-mode solver
        # reductions — well under a handful of field-equivalents
        assert s["all-reduce"]["bytes"] <= 16 * field_bytes, (n, s)
        # halo: a width-1 ghost surface is ~ (2/min_dim) of a field per
        # exchanged axis; allow generous headroom for the solver bodies
        assert s["collective-permute"]["bytes"] <= 16 * field_bytes, (n, s)
    # per-device volumes must not grow with device count at fixed
    # per-shard work (weak-scaling cleanliness; headroom covers the
    # 1D->2D mesh transition adding the second halo direction).
    # Exception, pinned at its current growth: the spectral solver's
    # per-longitude-mode CG dots all-reduce (nr, modes)-shaped partial
    # sums, and the global mode count grows with the machine — O(8x)
    # from 2->8 devices but tiny in absolute terms (SCALING.md).
    grow = {"collective-permute": 3, "all-to-all": 3, "all-reduce": 8}
    for op, factor in grow.items():
        b2 = results[2][op]["bytes"]
        b8 = results[8][op]["bytes"]
        assert b8 <= max(factor * b2, field_bytes), (op, b2, b8)
