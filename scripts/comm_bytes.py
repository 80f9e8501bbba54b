"""Weak/strong-scaling communication accounting on the virtual CPU mesh.

Measures the CANONICAL multi-device configuration
(BoussinesqModel.prepare_sharded: shard_map fast-diag Poisson with one
psum per solve + roll-based stencil lowering).

For 1, 2, 4, 8 shards, compiles the FULL sharded 3D-shell time step and
extracts every collective's payload bytes from the partitioned HLO
(parallel/comm_analysis.py), for
  * weak scaling  — per-shard grid fixed (global grid grows with N);
  * strong scaling — global grid fixed.
Then models the weak-scaling efficiency against the v5e ICI link
bandwidth. Results are committed to SCALING.md.

Usage: python scripts/comm_bytes.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from dycoreplanet_tpu.parallel.comm_analysis import (  # noqa: E402
    COLLECTIVE_OPS, step_comm_summary)
from dycoreplanet_tpu.parallel.mesh import mesh_shape_for  # noqa: E402


def _model(shape):
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft", "__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)
    return graft._make_model("float32", shape=shape)


def table(rows, header):
    print("| " + " | ".join(header) + " |")
    print("|" + "|".join("---" for _ in header) + "|")
    for r in rows:
        print("| " + " | ".join(str(x) for x in r) + " |")


def main():
    from dycoreplanet_tpu.ops import pallas_kernels

    pallas_kernels.set_use_pallas(False)  # CPU mesh: no Mosaic lowering

    per_shard = (16, 32, 64)   # fixed per-shard work for weak scaling
    base = (16, 32, 64)        # fixed global grid for strong scaling
    ns = (1, 2, 4, 8)

    print("## Weak scaling (per-shard grid fixed at "
          f"{per_shard[0]}x{per_shard[1]}x{per_shard[2]})\n")
    weak_rows = []
    for n in ns:
        _, a, b = mesh_shape_for_model(n)
        shape = (per_shard[0], per_shard[1] * a, per_shard[2] * b)
        m = _model(shape)
        s = step_comm_summary(m, n, prepare=True)
        row = [n, f"{shape[0]}x{shape[1]}x{shape[2]}"]
        for op in COLLECTIVE_OPS:
            row.append(f"{s[op]['count']} / {s[op]['bytes']/1e6:.3f} MB")
        weak_rows.append(row)
    table(weak_rows, ["devices", "global grid"] + list(COLLECTIVE_OPS))

    print("\n## Strong scaling (global grid fixed at "
          f"{base[0]}x{base[1]}x{base[2]})\n")
    strong_rows = []
    for n in ns:
        m = _model(base)
        s = step_comm_summary(m, n, prepare=True)
        row = [n, f"{base[0]}x{base[1]}x{base[2]}"]
        for op in COLLECTIVE_OPS:
            row.append(f"{s[op]['count']} / {s[op]['bytes']/1e6:.3f} MB")
        strong_rows.append(row)
    table(strong_rows, ["devices", "global grid"] + list(COLLECTIVE_OPS))


def mesh_shape_for_model(n):
    """(1, a, b) shard layout the shell mesh builder would choose."""
    import math

    best = (1, n)
    for a in range(1, int(math.isqrt(n)) + 1):
        if n % a == 0:
            best = (a, n // a)
    return (1,) + best


if __name__ == "__main__":
    main()
