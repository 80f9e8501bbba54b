"""Unit tests for the base layer: dimensionless numbers, prm parsing,
parameter structs (reference parity: source/model_data/*)."""

import math
import os

import pytest

from dycoreplanet_tpu.base import nondim
from dycoreplanet_tpu.base.params import Parameters
from dycoreplanet_tpu.base.prm import ParameterFileError, parse_prm


def test_reynolds_peclet_rossby():
    # formulas from core_model_data.cc:7-31
    assert nondim.reynolds_number(10.0, 1e4, 1.82e-5 / 1.29) == pytest.approx(
        10.0 * 1e4 / (1.82e-5 / 1.29)
    )
    assert nondim.peclet_number(2.0, 3.0, 0.5) == pytest.approx(12.0)
    assert nondim.rossby_number(4.0, 0.5, 10.0) == pytest.approx(10.0 / 2.0)
    assert nondim.reference_acceleration(2.0, 6.0) == pytest.approx(18.0)


def test_grashoff_rayleigh_reference_formulas():
    # The reference's own formulas (non-textbook): Gr = g b dT L^d / nu,
    # Ra = g b dT L^d * Pr  (core_model_data.cc:42-74)
    gr = nondim.grashoff_number(3, 9.81, 0.003661, 5.0, 2.0, 1.5e-5)
    assert gr == pytest.approx(9.81 * 0.003661 * 5.0 * 8.0 / 1.5e-5)
    ra = nondim.rayleigh_number(2, 1.0, 0.2, 0.5, 3.0, 2.0, 4.0)
    assert ra == pytest.approx(1.0 * 0.2 * 0.5 * 9.0 * 0.5)


def test_density_scaling():
    assert nondim.density_scaling(0.2, 3.0, 2.0) == pytest.approx(0.8)
    assert nondim.density(1.29, 0.003661, 283.15, 273.15) == pytest.approx(
        1.29 * (1 - 0.003661 * 10.0)
    )


def test_parse_prm_grammar():
    text = """
    # a comment
    subsection A
      set x = 1.5  # trailing
      subsection B
        set two words = hello
      end
    end
    """
    out = parse_prm(text)
    assert out[("A",)]["x"] == "1.5"
    assert out[("A", "B")]["two words"] == "hello"


def test_parse_prm_errors():
    with pytest.raises(ParameterFileError):
        parse_prm("end")
    with pytest.raises(ParameterFileError):
        parse_prm("subsection A\nset x 1\nend")
    with pytest.raises(ParameterFileError):
        parse_prm("subsection A\n")


def test_defaults_match_reference():
    p = Parameters.from_text("")
    # defaults from boussinesq_model_parameters.cc declare_parameters
    assert p.initial_global_refinement == 3
    assert p.space_dimension == 2
    assert p.time_step == 0.1
    assert p.nse_velocity_degree == 2
    assert p.use_FEEC_solver is False
    assert p.filename_output == "dycore"
    # physical constants defaults + derived (physical_constants.cc:150-164)
    pc = p.physical_constants
    assert pc.kinematic_viscosity == pytest.approx(1.82e-5 / 1.29)
    assert pc.thermal_diffusivity == pytest.approx(2.62e-2 / (1.005 * 1.01325e5))
    assert pc.R1 == pytest.approx(6.371e6 + 1e5)
    # reference quantities derived (reference_quantities.cc:87)
    assert p.reference_quantities.time == pytest.approx(1e4 / 10.0)


@pytest.mark.parametrize(
    "name,expect",
    [
        ("aqua_planet_test_2d.prm",
         dict(space_dimension=2, cuboid_geometry=False, use_FEEC_solver=False,
              initial_global_refinement=4, time_step=0.01, final_time=1.0)),
        ("aqua_planet_cube_test_3d.prm",
         dict(space_dimension=3, cuboid_geometry=True, use_FEEC_solver=True,
              initial_global_refinement=4, time_step=0.01, final_time=2.0)),
        ("aqua_planet_shell_test_3d-classic.prm",
         dict(space_dimension=3, cuboid_geometry=False, use_FEEC_solver=False,
              initial_global_refinement=2, adapt_time_step=True)),
        ("aqua_planet_shell_test_3d-feec.prm",
         dict(space_dimension=3, cuboid_geometry=False, use_FEEC_solver=True,
              initial_global_refinement=3, adapt_time_step=True)),
    ],
)
def test_shipped_configs_parse(name, expect):
    path = os.path.join(os.path.dirname(__file__), "..", "data", name)
    p = Parameters.from_file(path)
    for k, v in expect.items():
        assert getattr(p, k) == v, k


def test_shell_test_3d_constants():
    path = os.path.join(
        os.path.dirname(__file__), "..", "data", "aqua_planet_shell_test_3d-classic.prm"
    )
    p = Parameters.from_file(path)
    pc = p.physical_constants
    assert pc.R0 == 1.0 and pc.atm_height == 2.0 and pc.R1 == 3.0
    assert pc.expansion_coefficient == 0.2
    assert pc.kinematic_viscosity == pytest.approx(1e-2)
    assert p.reference_quantities.temperature_ref == 2.0


def test_missing_file_writes_template(tmp_path):
    target = tmp_path / "new.prm"
    with pytest.raises(ParameterFileError):
        Parameters.from_file(str(target))
    assert target.exists()
    # the template itself must round-trip through the parser
    p = Parameters.from_file(str(target))
    assert p.space_dimension == 2


REFERENCE_DATA = "/root/reference/data"


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DATA),
                    reason="reference checkout not present (CI)")
@pytest.mark.parametrize("name", [
    "aqua_planet.prm",
    "aqua_planet_test_2d.prm",
    "aqua_planet_cube_test_3d.prm",
    "aqua_planet_shell_test_3d-classic.prm",
    "aqua_planet_shell_test_3d-feec.prm",
])
def test_reference_prm_files_parse_verbatim(name):
    """The UNMODIFIED reference .prm files parse through the deal.II-
    grammar reader with the expected dispatch flags — the bit-level
    config-compatibility claim of PARITY.md component 18 (reference:
    boussinesq_model_parameters.cc:52-239)."""
    p = Parameters.from_file(os.path.join(REFERENCE_DATA, name))
    assert p.space_dimension in (2, 3)
    assert p.final_time > 0
    assert p.physical_constants.R1 > p.physical_constants.R0
    if name == "aqua_planet_test_2d.prm":
        assert p.space_dimension == 2 and p.use_schur_complement_solver
    if name == "aqua_planet_cube_test_3d.prm":
        assert p.cuboid_geometry and p.use_FEEC_solver
    if name == "aqua_planet_shell_test_3d-classic.prm":
        assert (p.space_dimension == 3 and not p.cuboid_geometry
                and not p.use_FEEC_solver)
    if name == "aqua_planet_shell_test_3d-feec.prm":
        assert p.use_FEEC_solver and not p.use_schur_complement_solver


def test_momentum_fixed_iters_knob():
    """`momentum fixed iters` (r4): 0 defaults to `fixed solver iters`;
    a nonzero value drives the momentum Richardson count only."""
    from dycoreplanet_tpu.base.params import Parameters
    from dycoreplanet_tpu.models import BoussinesqModel

    p = Parameters.from_text("""
subsection Numerics
  set fixed solver iters = 3
  set momentum fixed iters = 1
end
subsection Boussinesq Model
  set space dimension = 3
end
""")
    p.numerics.n_radial, p.numerics.n_lat, p.numerics.n_lon = 4, 8, 16
    m = BoussinesqModel(p)
    assert p.numerics.fixed_solver_iters == 3
    assert p.numerics.momentum_fixed_iters == 1
    assert m.momentum_iters == 1
    p2 = Parameters.from_text("")
    p2.space_dimension = 3
    p2.numerics.n_radial, p2.numerics.n_lat, p2.numerics.n_lon = 4, 8, 16
    m2 = BoussinesqModel(p2)
    assert m2.momentum_iters == p2.numerics.fixed_solver_iters


def test_bench_robust_slope():
    """bench._robust_slope: min-of-rounds slope, consistency-loop exit,
    and immunity to a transiently inflated short-chain timing (the
    round-3 artifact failure mode)."""
    import bench

    per_step, overhead = 0.5e-3, 2e-3
    calls = {"n": 0}

    def run(n):
        calls["n"] += 1
        # first round contended: +50% on everything
        scale = 1.5 if calls["n"] <= 2 else 1.0
        return scale * (overhead + per_step * n)

    got = bench._robust_slope(run, 20, 120, reps=1, max_rounds=4)
    assert abs(got - per_step) / per_step < 1e-9
    # the consistency loop stops once two best slopes agree
    assert calls["n"] <= 8
