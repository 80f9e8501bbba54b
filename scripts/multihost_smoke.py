"""Multi-host smoke test for TPU pod slices.

Run the same command on every host of a pod slice (e.g. via
`gcloud compute tpus tpu-vm ssh --worker=all`):

    python scripts/multihost_smoke.py

It initializes `jax.distributed`, builds the global device mesh over
all hosts, runs one sharded 3D-shell step, and prints per-host
confirmation — the pod-scale generalization of the single-host
8-device tests (tests/test_sharding.py) and of the driver's
`dryrun_multichip` contract. The sharded step's communication pattern
(nearest-neighbor collective-permutes + solver psums; see
tests/test_collectives.py) rides ICI within the slice.
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax

    if int(os.environ.get("DYCOREPLANET_SKIP_DIST_INIT", "0")) == 0:
        try:
            jax.distributed.initialize()
        except Exception as e:  # single-host fallback
            print(f"jax.distributed.initialize skipped: {e}")

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as graft
    from dycoreplanet_tpu.models.boussinesq import StepDiagnostics
    from dycoreplanet_tpu.parallel.mesh import (
        build_mesh, shard_state, state_sharding)

    n = len(jax.devices())
    pid = jax.process_index()
    # shell sized so every plausible mesh factorization divides it
    model = graft._make_model("float32", shape=(8, 32, 64))
    mesh = build_mesh(model.geo)
    state = shard_state(model.initial_state(), model.geo, mesh)
    sh = state_sharding(model.geo, mesh)
    rep = NamedSharding(mesh, P())
    step = jax.jit(model._step_impl,
                   in_shardings=(sh, rep), out_shardings=(sh, rep))
    new_state, packed = step(state, np.float32(0.01))
    diag = StepDiagnostics(packed, model.geo.dim)
    print(f"[host {pid}/{jax.process_count()}] {n} global devices, "
          f"mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}, "
          f"max|u|={diag.max_velocity:.3e} div={diag.div_norm:.3e}")
    assert np.isfinite(diag.max_velocity)


if __name__ == "__main__":
    main()
