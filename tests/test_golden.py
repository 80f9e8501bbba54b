"""Golden-trajectory + field-snapshot regression tests (the reference's
stored-output diff mechanism generalized; see golden_trajectories.py)."""

import json

import numpy as np
import pytest

from tests.golden_trajectories import CASES, GOLDEN_PATH, run_case


def _golden():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.mark.parametrize("name", sorted(CASES))
def test_trajectory_matches_golden(name):
    golden = _golden()[name]
    got = run_case(name)
    rows, want_rows = got["rows"], golden["rows"]
    assert len(rows) == len(want_rows)
    for i, (g, w) in enumerate(zip(rows, want_rows)):
        for key in ("cfl", "max_velocity", "T_min", "T_max"):
            np.testing.assert_allclose(
                g[key], w[key], rtol=1e-8, atol=1e-12,
                err_msg=f"{name} step {i} field {key}")
        # div_norm is a near-zero residual; bound it instead of diffing
        # 1e-9 floor: the exact-solver family (Thomas vs eigentransform)
        # shifts this f64 residual by a few 1e-10 without any physical
        # difference; a real projection regression shows up at >=1e-6
        assert g["div_norm"] < max(2 * w["div_norm"], 1e-9), \
            f"{name} step {i} divergence regressed"

    # field snapshots: catch sign/phase errors invisible to extrema.
    # atol floor = 1e-10 * field scale (near-zero entries of u/p carry
    # solver-tolerance noise, not physics)
    for step, want in golden["fields"].items():
        snap = got["fields"][step]
        for key in ("u", "p", "T"):
            w = np.asarray(want[key])
            scale = max(float(np.max(np.abs(w))), 1e-30)
            np.testing.assert_allclose(
                np.asarray(snap[key]), w, rtol=1e-7, atol=1e-10 * scale,
                err_msg=f"{name} step {step} snapshot {key}")


def test_production_dynamic_golden_has_real_motion():
    """The Earth-constants dynamic golden must show genuine flow —
    nonzero, GROWING max|u| (VERDICT r2: a physics-free golden pins the
    constants pipeline but cannot catch dynamics regressions)."""
    import json

    from tests.golden_trajectories import GOLDEN_PATH

    with open(GOLDEN_PATH) as f:
        rows = json.load(f)["aqua_planet_production_dynamic"]["rows"]
    u = [r["max_velocity"] for r in rows]
    assert u[0] > 1e-3, u
    assert u[-1] > 1.5 * u[0], u
