"""Communication-volume accounting from compiled (GSPMD-partitioned) HLO.

The reference's distributed cost model is implicit in its MPI usage
(neighbor exchange at assembly/vmult, Allreduce at every Krylov dot —
SURVEY.md §5); here the same accounting is extracted mechanically from
the XLA module the sharded step actually compiles to: every collective
op's result shape gives its payload bytes. Used by
scripts/comm_bytes.py (SCALING.md tables) and tests/test_collectives.py
(byte-volume growth bounds, not just op counts)."""

from __future__ import annotations

import re
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
    "s64": 8, "u64": 8, "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

COLLECTIVE_OPS = ("all-reduce", "all-gather", "collective-permute",
                  "all-to-all", "reduce-scatter")

# `%name = <shape> op-name(`; shape is either one typed array or a tuple
_LINE_RE = re.compile(
    r"=\s*(\([^=]*?\)|\S+?)\s+"
    r"(all-reduce|all-gather|collective-permute|all-to-all|reduce-scatter)"
    r"(?:-start)?\(")
_ARRAY_RE = re.compile(r"(\w+)\[([0-9,]*)\]")


def _shape_bytes(shape_text: str) -> int:
    total = 0
    for dtype, dims in _ARRAY_RE.findall(shape_text):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_bytes(hlo_text: str) -> Dict[str, Dict[str, int]]:
    """Per-collective-op {count, bytes} from compiled HLO text.

    Bytes = sum of result-shape payloads per executed instruction (the
    per-device receive volume; ring algorithms move ~2x for all-reduce
    but the payload is the scale-relevant quantity). `-start/-done`
    async pairs are counted once (on the start)."""
    out = {op: {"count": 0, "bytes": 0} for op in COLLECTIVE_OPS}
    for m in _LINE_RE.finditer(hlo_text):
        shape_text, op = m.group(1), m.group(2)
        out[op]["count"] += 1
        out[op]["bytes"] += _shape_bytes(shape_text)
    return out


def sharded_step_hlo(model, n_devices: int,
                     devices: Optional[Sequence] = None) -> str:
    """Compile the full time step over an n-device mesh (host-CPU
    virtual devices by default) and return the partitioned HLO text."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dycoreplanet_tpu.parallel.mesh import (build_mesh, shard_state,
                                                state_sharding)

    if devices is None:
        devices = jax.devices("cpu")[:n_devices]
    mesh = build_mesh(model.geo, devices)
    if getattr(model, "_comm_prepare_sharded", False):
        model.prepare_sharded(mesh, pallas=False)
    state = shard_state(model.initial_state(), model.geo, mesh)
    sh = state_sharding(model.geo, mesh)
    rep = NamedSharding(mesh, P())
    step = jax.jit(model._step_impl,
                   in_shardings=(sh, rep), out_shardings=(sh, rep))
    return step.lower(state, np.float32(0.01)).compile().as_text()


def step_comm_summary(model, n_devices: int,
                      prepare: bool = False) -> Dict[str, Dict[str, int]]:
    """Collective {count, bytes} of the compiled sharded step.
    ``prepare=True`` measures the canonical multi-device configuration
    (BoussinesqModel.prepare_sharded: sharded fast-diag Poisson +
    roll-based stencil lowering) instead of the GSPMD default."""
    model._comm_prepare_sharded = prepare
    try:
        return collective_bytes(sharded_step_hlo(model, n_devices))
    finally:
        model._comm_prepare_sharded = False
