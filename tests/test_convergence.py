"""Self-convergence of the full model under grid refinement, plus the
checkpoint/restart round trip through the CLI surface."""

import os

import numpy as np
import pytest

from dycoreplanet_tpu.base.params import Parameters
from dycoreplanet_tpu.models import BoussinesqModel


def _annulus(nr, nphi):
    p = Parameters.from_text("")
    p.space_dimension = 2
    p.numerics.dtype = "float64"
    p.numerics.n_radial, p.numerics.n_lon = nr, nphi
    p.physical_constants.R0 = 1.0
    p.physical_constants.atm_height = 2.0
    p.physical_constants.expansion_coefficient = 0.3
    p.physical_constants.__post_init__()
    p.reference_quantities.velocity = 1.0
    p.reference_quantities.length = 1.0
    p.reference_quantities.temperature_ref = 2.0
    p.reference_quantities.__post_init__()
    p.time_step = 0.005
    return p


def _sample_T(model, state, n=8):
    """T at a fixed set of physical probe points (Cartesian), via the
    cell containing each probe — resolution-independent observation."""
    geo = model.geo
    rs = np.linspace(1.2, 2.8, n)
    phis = np.linspace(0.3, 5.9, n)
    T = np.asarray(state.T)
    out = []
    r_faces = np.asarray(geo.axes[0].faces)
    p_faces = np.asarray(geo.axes[1].faces)
    for r, ph in zip(rs, phis):
        i = np.searchsorted(r_faces, r) - 1
        j = np.searchsorted(p_faces, ph) - 1
        out.append(T[i, j])
    return np.asarray(out)


def test_model_self_convergence_under_refinement():
    """Probe-point temperature after t=0.05 converges as the grid
    refines: |T_h - T_{h/2}| shrinks by >~1.5x per refinement."""
    vals = {}
    for nr, nphi in [(8, 48), (16, 96), (32, 192)]:
        p = _annulus(nr, nphi)
        m = BoussinesqModel(p)
        s = m.initial_state()
        for _ in range(10):
            s, _ = m.step(s, p.time_step)
        vals[(nr, nphi)] = _sample_T(m, s)
    d1 = np.max(np.abs(vals[(16, 96)] - vals[(8, 48)]))
    d2 = np.max(np.abs(vals[(32, 192)] - vals[(16, 96)]))
    assert d2 < d1 / 1.5, (d1, d2)


def test_cli_checkpoint_restart_roundtrip(tmp_path):
    """Run 4 steps with a checkpoint at step 2, restart from it, run 2
    more, and require the identical final state — through the CLI."""
    from dycoreplanet_tpu.cli.main import main

    prm = tmp_path / "cfg.prm"
    prm.write_text(
        open(os.path.join(os.path.dirname(__file__), "..",
                          "data", "aqua_planet_test_2d.prm")).read()
        .replace("data-output-2d", str(tmp_path / "out"))
        + "\nsubsection Numerics\n  set dtype = float64\n"
        "  set n radial = 8\n  set n lon = 48\nend\n")

    rc = main(["-p", str(prm), "--max-steps", "4", "--no-output",
               "--checkpoint-every", "2"])
    assert rc == 0
    ckdir = str(tmp_path / "out")
    cks = sorted(f for f in os.listdir(ckdir) if f.endswith(".npz"))
    assert len(cks) >= 2
    # full-run final checkpoint vs restart-continued run
    from dycoreplanet_tpu.io.checkpoint import load_checkpoint

    final_full, _ = load_checkpoint(os.path.join(ckdir, cks[-1]))
    rc = main(["-p", str(prm), "--max-steps", "2", "--no-output",
               "--restart", os.path.join(ckdir, cks[0]),
               "--checkpoint-every", "2"])
    assert rc == 0
    cks2 = sorted(f for f in os.listdir(ckdir) if f.endswith(".npz"))
    final_restart, _ = load_checkpoint(os.path.join(ckdir, cks2[-1]))
    assert int(final_restart.step_number) == int(final_full.step_number)
    np.testing.assert_allclose(np.asarray(final_restart.T),
                               np.asarray(final_full.T), rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(final_restart.u),
                               np.asarray(final_full.u), rtol=0, atol=1e-13)
