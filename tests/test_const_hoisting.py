"""Constant-hoisting equivalence: the jitted step must produce the
same answer whether model constants are embedded as HLO literals
(small grids) or passed as device arguments (large grids, where
embedded literals exceed remote-compile limits)."""

import numpy as np
import pytest

from dycoreplanet_tpu.base.params import Parameters
from dycoreplanet_tpu.models import BoussinesqModel


def _params():
    p = Parameters.from_text("")
    p.space_dimension = 3
    p.cuboid_geometry = False
    p.initial_global_refinement = 3
    p.time_step = 0.01
    p.numerics.dtype = "float64"
    p.physical_constants.R0 = 1.0
    p.physical_constants.atm_height = 2.0
    p.physical_constants.__post_init__()
    p.reference_quantities.velocity = 1.0
    p.reference_quantities.length = 1.0
    p.reference_quantities.__post_init__()
    return p


def test_hoisted_consts_match_literals(monkeypatch):
    m_lit = BoussinesqModel(_params())
    assert not m_lit._const_registry  # small model: literal path

    # force the hoisted path on an identical model
    monkeypatch.setattr(BoussinesqModel, "_CONST_HOIST_BYTES", 0)
    m_arg = BoussinesqModel(_params())
    assert m_arg._const_registry  # hoisting active
    names = {k for _, k in m_arg._const_registry}
    assert "vol" in names and "gravity" in names

    s_lit = m_lit.initial_state()
    s_arg = m_arg.initial_state()
    dt = 0.01
    # embedded literals can change XLA constant folding/fusion, so the
    # two paths need not be bit-identical on every backend — compare at
    # a tight f64 tolerance instead of exact equality
    tol = dict(rtol=1e-13, atol=1e-15)
    for _ in range(2):
        s_lit, _ = m_lit.step(s_lit, dt)
        s_arg, _ = m_arg.step(s_arg, dt)
    np.testing.assert_allclose(np.asarray(s_lit.u), np.asarray(s_arg.u), **tol)
    np.testing.assert_allclose(np.asarray(s_lit.T), np.asarray(s_arg.T), **tol)
    np.testing.assert_allclose(np.asarray(s_lit.p), np.asarray(s_arg.p), **tol)

    # binding must restore the numpy constants after tracing
    assert isinstance(m_arg.vol, np.ndarray)

    # multi_step path too
    r_lit, _, _ = m_lit.multi_step(s_lit, dt, 2, collect_diagnostics=False)
    r_arg, _, _ = m_arg.multi_step(s_arg, dt, 2, collect_diagnostics=False)
    np.testing.assert_allclose(np.asarray(r_lit.u), np.asarray(r_arg.u), **tol)
