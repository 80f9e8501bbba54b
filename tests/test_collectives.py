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
