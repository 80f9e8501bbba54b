"""Driver benchmark: grid-points/s/chip on the 3D spherical-shell step.

Prints ONE JSON line:
  {"metric": "shell_grid_points_per_sec", "value": N, "unit": "points/s",
   "vs_baseline": R}

The reference publishes no performance numbers (BASELINE.md), so
``vs_baseline`` reports the fraction of the HBM-bandwidth speed-of-light
for an idealized single-sweep time step (the BASELINE.json north star):
  SOL = HBM_BW / bytes_per_point_ideal
with bytes_per_point_ideal = 96 B (read+write the 8 state arrays plus
metrics once, f32). Values < 1 quantify how far the iterative pressure
solve keeps us from a one-sweep step; rounds improve it via multigrid /
Pallas fusion.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax

    sys.path.insert(0, ".")
    from dycoreplanet_tpu.base.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    on_tpu = dev.platform not in ("cpu",)

    import importlib.util

    spec = importlib.util.spec_from_file_location("graft", "__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    # production-ish shell on TPU; small on CPU fallback
    shape = (32, 128, 256) if on_tpu else (8, 16, 32)
    model = graft._make_model("float32", shape=shape)
    cells = int(np.prod(model.geo.cell_shape))
    dt = np.float32(0.002)

    state = model.initial_state()
    # warmup: compile + spin up a nontrivial flow so CG iteration counts
    # are representative
    state, diag = model.step(state, dt)
    jax.block_until_ready(state.u)
    for _ in range(3):
        state, diag = model.step(state, dt)
    jax.block_until_ready(state.u)

    n_steps = 20 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, diag = model.step(state, dt)
    jax.block_until_ready(state.u)
    elapsed = time.perf_counter() - t0

    pps = cells * n_steps / elapsed
    # HBM speed-of-light model (see module docstring)
    hbm_bw = 819e9 if on_tpu else 50e9  # v5e ~819 GB/s
    sol_pps = hbm_bw / 96.0
    print(
        f"bench: {model.geo.kind} {model.geo.cell_shape} on {dev}, "
        f"{elapsed / n_steps * 1e3:.2f} ms/step, poisson_iters="
        f"{int(diag.poisson_iters)}, div={float(diag.div_norm):.2e}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "shell_grid_points_per_sec",
                "value": float(f"{pps:.4g}"),
                "unit": "points/s",
                "vs_baseline": float(f"{pps / sol_pps:.4g}"),
            }
        )
    )


if __name__ == "__main__":
    main()
