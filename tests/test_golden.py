"""Golden-trajectory regression tests (the reference's stored-output
diff mechanism generalized; see golden_trajectories.py)."""

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
    rows = run_case(name)
    assert len(rows) == len(golden)
    for i, (got, want) in enumerate(zip(rows, golden)):
        for key in ("cfl", "max_velocity", "T_min", "T_max"):
            np.testing.assert_allclose(
                got[key], want[key], rtol=1e-8, atol=1e-12,
                err_msg=f"{name} step {i} field {key}")
        # div_norm is a near-zero residual; bound it instead of diffing
        # 1e-9 floor: the exact-solver family (Thomas vs eigentransform)
        # shifts this f64 residual by a few 1e-10 without any physical
        # difference; a real projection regression shows up at >=1e-6
        assert got["div_norm"] < max(2 * want["div_norm"], 1e-9), \
            f"{name} step {i} divergence regressed"
