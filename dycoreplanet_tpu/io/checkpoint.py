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
    arrays = {
        "u": np.asarray(state.u),
        "p": np.asarray(state.p),
        "T": np.asarray(state.T),
        "time": np.asarray(state.time),
        "step_number": np.asarray(state.step_number),
    }
    for d, uf in enumerate(state.u_faces):
        arrays[f"u_face_{d}"] = np.asarray(uf)
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
