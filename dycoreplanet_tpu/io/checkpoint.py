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


def _leaf_names(state: State):
    names = ["u", "p", "T", "time", "step_number"]
    names += [f"u_face_{d}" for d in range(len(state.u_faces))]
    return names


def _leaf_arrays(state: State):
    arrs = [state.u, state.p, state.T, state.time, state.step_number]
    arrs += list(state.u_faces)
    return arrs


def save_checkpoint_sharded(path: str, state: State,
                            metadata: Optional[dict] = None) -> str:
    """Distributed checkpoint: one .npz per addressable shard holding
    that shard's blocks of every state leaf (+ global shapes and index
    ranges in the master .json) — the global array is NEVER
    materialized on one process (the reference analogue is per-rank
    output, boussinesq_model.tpp:1661-1691; checkpointing itself is a
    capability the reference lacks). On a multi-host pod each process
    writes only its own shards; restore re-places the blocks under any
    sharding of the same global shape."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    names = _leaf_names(state)
    arrs = _leaf_arrays(state)
    ref = state.p  # canonical cell-array sharding
    n_shards = len(ref.addressable_shards)
    index_meta = {}
    for k in range(n_shards):
        blocks = {}
        for name, a in zip(names, arrs):
            # replicated leaves (time, step_number) also expose one
            # shard per device — full-extent index, duplicated blocks
            sh = a.addressable_shards[min(k, len(a.addressable_shards) - 1)]
            blocks[name] = np.asarray(sh.data)
            index_meta.setdefault(name, []).append(
                [[s.start or 0,
                  s.stop if s.stop is not None else dim]
                 for s, dim in zip(
                     (sh.index if sh.index else
                      tuple(slice(0, d) for d in a.shape)),
                     a.shape)])
        np.savez(f"{path}.shard{k:03d}.npz", **blocks)
    meta = dict(metadata or {})
    meta["n_face_arrays"] = len(state.u_faces)
    meta["n_shards"] = n_shards
    meta["global_shapes"] = {n: list(a.shape)
                             for n, a in zip(names, arrs)}
    meta["dtypes"] = {n: str(np.dtype(a.dtype)) for n, a in zip(names, arrs)}
    meta["shard_indices"] = index_meta
    with open(path + ".json", "w") as f:
        json.dump(meta, f)
    return path


def load_checkpoint_sharded(path: str, sharding=None) -> Tuple[State, dict]:
    """Restore a sharded checkpoint. ``sharding``: optional State of
    NamedShardings (parallel.mesh.state_sharding) to place the arrays
    under — defaults to single-device placement."""
    import jax.numpy as jnp

    with open(path + ".json") as f:
        meta = json.load(f)
    n_faces = meta["n_face_arrays"]
    arrays = {}
    for name, shape in meta["global_shapes"].items():
        arrays[name] = np.zeros(shape, dtype=np.dtype(meta["dtypes"][name]))
    for k in range(meta["n_shards"]):
        data = np.load(f"{path}.shard{k:03d}.npz")
        for name in arrays:
            rngs = meta["shard_indices"][name][k]
            sl = tuple(slice(a, b) for a, b in rngs)
            arrays[name][sl] = data[name]
    state = State(
        u=jnp.asarray(arrays["u"]),
        u_faces=tuple(jnp.asarray(arrays[f"u_face_{d}"])
                      for d in range(n_faces)),
        p=jnp.asarray(arrays["p"]),
        T=jnp.asarray(arrays["T"]),
        time=jnp.asarray(arrays["time"]),
        step_number=jnp.asarray(arrays["step_number"]),
    )
    if sharding is not None:
        import jax

        state = jax.tree.map(jax.device_put, state, sharding)
    return state, meta


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
