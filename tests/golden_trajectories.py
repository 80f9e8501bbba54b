"""Golden-trajectory definitions + generator.

The framework's analogue of the reference's golden-output testing
(test/test_dummy.mpirun={1,2}.output diffs stdout against stored
files): for each config of the data/*.prm matrix we record, from a
short f64 CPU run at fixed small resolution,
  * per-step scalar diagnostics (CFL, max|u|, T range, div norm), and
  * downsampled FIELD snapshots of u, p, T at steps SNAP_STEPS —
    scalar trajectories alone can miss sign/phase errors that leave
    extrema unchanged (e.g. a longitude-phase error or a symmetric-term
    sign flip); the field values cannot.
test_golden.py replays and compares. Regenerate after INTENDED physics
changes with:

    python tests/golden_trajectories.py
"""

import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN_PATH = os.path.join(HERE, "golden", "trajectories.json")
N_STEPS = 8
SNAP_STEPS = (4, 8)

CASES = {
    "annulus_2d": dict(prm="aqua_planet_test_2d.prm",
                       over=dict(n_radial=8, n_lon=48)),
    "cube_3d_feec": dict(prm="aqua_planet_cube_test_3d.prm",
                         over=dict(nx=8, ny=8, nz=8)),
    # the mimetic C-grid realization of the same FEEC config
    # (models/mimetic.py; `feec formulation = staggered`)
    "cube_3d_feec_staggered": dict(
        prm="aqua_planet_cube_test_3d.prm",
        over=dict(nx=8, ny=8, nz=8, feec_formulation="staggered")),
    "shell_3d_classic": dict(prm="aqua_planet_shell_test_3d-classic.prm",
                             over=dict(n_radial=4, n_lat=8, n_lon=16)),
    "shell_3d_feec": dict(prm="aqua_planet_shell_test_3d-feec.prm",
                          over=dict(n_radial=4, n_lat=8, n_lon=16)),
    # the mimetic C-grid realization on the SHELL (pole closure for
    # edge quantities; reference FEEC shell constraints tpp:372-420)
    "shell_3d_feec_staggered": dict(
        prm="aqua_planet_shell_test_3d-feec.prm",
        over=dict(n_radial=4, n_lat=8, n_lon=16,
                  feec_formulation="staggered")),
    "annulus_2d_coupled": dict(prm="aqua_planet_test_2d.prm",
                               over=dict(n_radial=8, n_lon=48,
                                         momentum_solver="coupled")),
    # the production config (full Earth physical constants; documented
    # IC deviation in PARITY.md "Known quirks") at test resolution.
    # NOTE: the IC Gaussians are ~0.5 nondim units wide on a ~4000-unit
    # circumference, so at any test resolution T underflows to exactly 0
    # (faithful to the reference, which samples the same near-delta
    # bumps at quadrature points); this golden pins the Earth-constants
    # pipeline and that the dynamics stay at round-off from rest.
    "aqua_planet_production": dict(prm="aqua_planet.prm",
                                   over=dict(n_radial=8, n_lon=48)),
    # the production constants WITH real dynamics: `ic width scale`
    # widens the Gaussian bumps (peak-preserving; documented deviation,
    # PARITY.md) so the IC is resolved at test resolution — this golden
    # pins an Earth-constants trajectory where the flow actually moves
    # (max|u| grows 0.07 -> 0.19 over the 8 steps)
    "aqua_planet_production_dynamic": dict(
        prm="aqua_planet.prm",
        over=dict(n_radial=8, n_lon=48, ic_width_scale=100.0)),
}


def _snapshot(state):
    """Downsampled field values (strided to <=5 points per axis)."""
    def ds(a, skip_leading=0):
        a = np.asarray(a)
        sl = (slice(None),) * skip_leading + tuple(
            slice(None, None, max(1, s // 4))
            for s in a.shape[skip_leading:])
        return a[sl].ravel().tolist()

    return {"u": ds(state.u, skip_leading=1), "p": ds(state.p),
            "T": ds(state.T)}


def run_case(name, with_fields=True):
    from dycoreplanet_tpu.base.params import Parameters
    from dycoreplanet_tpu.models import make_model

    case = CASES[name]
    path = os.path.join(HERE, "..", "data", case["prm"])
    p = Parameters.from_file(path)
    p.numerics.dtype = "float64"
    p.adapt_time_step = False           # fixed dt for reproducibility
    for k, v in case["over"].items():
        setattr(p.numerics, k, v)
    m = make_model(p)
    s = m.initial_state()
    rows = []
    snaps = {}
    for k in range(N_STEPS):
        s, d = m.step(s, p.time_step)
        rows.append({
            "cfl": d.cfl, "max_velocity": d.max_velocity,
            "T_min": d.T_min, "T_max": d.T_max, "div_norm": d.div_norm,
        })
        if with_fields and (k + 1) in SNAP_STEPS:
            snaps[str(k + 1)] = _snapshot(s)
    return {"rows": rows, "fields": snaps}


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    golden = {name: run_case(name) for name in CASES}
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(golden, f, indent=1)
    print("wrote", GOLDEN_PATH)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.join(HERE, ".."))
    main()
