"""Checkpoint / restore of model state.

NEW capability relative to the reference, which has no checkpointing at
all (SURVEY.md §5: output is write-only visualization; state cannot be
restored). Long TPU runs need restartability, so we snapshot the full
State pytree plus run metadata.

Format: a single .npz (host-gathered arrays) + JSON metadata — simple,
dependency-free, and bitwise round-trippable. Orbax-style async
checkpointing can layer on top later for multi-host runs.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import numpy as np

from dycoreplanet_tpu.models.boussinesq import State


def save_checkpoint(path: str, state: State, metadata: Optional[dict] = None) -> str:
    """Write state to ``path`` (.npz) with sidecar .json metadata."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # one fused device->host transfer (per-leaf pulls cost seconds of
    # flat latency each on tunneled TPU platforms)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    # widest float dtype among the leaves (f64 only when x64 is on);
    # int leaves (step_number) round-trip exactly below 2^mantissa
    wide = np.result_type(*([l.dtype for l in leaves
                             if np.issubdtype(l.dtype, np.floating)]
                            or [np.float32]))
    flat = np.asarray(jax.numpy.concatenate(
        [jax.numpy.ravel(l).astype(wide) for l in leaves]))
    host_leaves = []
    off = 0
    for l in leaves:
        n = int(np.prod(l.shape)) if l.shape else 1
        host_leaves.append(
            flat[off:off + n].reshape(l.shape).astype(l.dtype))
        off += n
    host_state = jax.tree_util.tree_unflatten(treedef, host_leaves)
    arrays = {
        "u": host_state.u,
        "p": host_state.p,
        "T": host_state.T,
        "time": host_state.time,
        "step_number": host_state.step_number,
    }
    for d, uf in enumerate(host_state.u_faces):
        arrays[f"u_face_{d}"] = uf
    np.savez(path, **arrays)
    meta = dict(metadata or {})
    meta["n_face_arrays"] = len(state.u_faces)
    with open(path + ".json", "w") as f:
        json.dump(meta, f)
    return path


def load_checkpoint(path: str) -> Tuple[State, dict]:
    """Read a checkpoint written by save_checkpoint."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    with open(path.replace(".npz", ".npz.json")) as f:
        meta = json.load(f)
    n_faces = meta["n_face_arrays"]
    state = State(
        u=jax.numpy.asarray(data["u"]),
        u_faces=tuple(jax.numpy.asarray(data[f"u_face_{d}"]) for d in range(n_faces)),
        p=jax.numpy.asarray(data["p"]),
        T=jax.numpy.asarray(data["T"]),
        time=jax.numpy.asarray(data["time"]),
        step_number=jax.numpy.asarray(data["step_number"]),
    )
    return state, meta
