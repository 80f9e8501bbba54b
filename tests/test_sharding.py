"""Distributed-equivalence tests on the virtual 8-device CPU mesh.

Generalizes the reference's mpirun=1 vs mpirun=2 golden-output testing
(reference: test/test_dummy.mpirun={1,2}.output): the same step on one
device and sharded over 8 devices must agree to floating-point
reduction-order tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dycoreplanet_tpu.base.params import Parameters
from dycoreplanet_tpu.models import BoussinesqModel
from dycoreplanet_tpu.parallel import build_mesh, shard_state, state_sharding


def _model(kind: str) -> BoussinesqModel:
    p = Parameters.from_text("")
    p.numerics.dtype = "float64"
    if kind == "cuboid":
        p.space_dimension = 3
        p.cuboid_geometry = True
        p.use_FEEC_solver = True
        p.numerics.nx = p.numerics.ny = p.numerics.nz = 8
        p.physical_constants.expansion_coefficient = 0.2
        p.reference_quantities.velocity = 1.0
        p.reference_quantities.length = 1.0
        p.reference_quantities.temperature_ref = 3.0
    elif kind == "shell":
        p.space_dimension = 3
        p.cuboid_geometry = False
        p.numerics.n_radial, p.numerics.n_lat, p.numerics.n_lon = 4, 8, 16
        p.physical_constants.R0 = 1.0
        p.physical_constants.atm_height = 2.0
        p.reference_quantities.velocity = 1.0
        p.reference_quantities.length = 1.0
        p.reference_quantities.temperature_ref = 2.0
    else:  # annulus
        p.space_dimension = 2
        p.numerics.n_radial, p.numerics.n_lon = 8, 48
        p.physical_constants.R0 = 1.0
        p.physical_constants.atm_height = 2.0
        p.reference_quantities.velocity = 1.0
        p.reference_quantities.length = 1.0
        p.reference_quantities.temperature_ref = 2.0
    p.physical_constants.__post_init__()
    p.reference_quantities.__post_init__()
    p.time_step = 0.01
    return BoussinesqModel(p)


@pytest.mark.parametrize("kind", ["cuboid", "shell", "annulus"])
def test_single_vs_eight_devices(kind):
    m = _model(kind)
    dt = m.params.time_step

    # single-device run
    s1 = m.initial_state()
    for _ in range(3):
        s1, d1 = m.step(s1, dt)

    # sharded run over all 8 devices
    mesh = build_mesh(m.geo)
    assert int(np.prod(mesh.devices.shape)) == 8
    s8 = shard_state(m.initial_state(), m.geo, mesh)
    sh = state_sharding(m.geo, mesh)
    rep = NamedSharding(mesh, P())
    step8 = jax.jit(
        m._step_impl, in_shardings=(sh, rep), out_shardings=(sh, rep),
    )
    for _ in range(3):
        s8, d8_packed = step8(s8, dt)
    from dycoreplanet_tpu.models.boussinesq import StepDiagnostics
    d8 = StepDiagnostics(d8_packed, m.geo.dim)

    np.testing.assert_allclose(np.asarray(s8.u), np.asarray(s1.u),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(s8.T), np.asarray(s1.T),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(s8.p), np.asarray(s1.p),
                               rtol=1e-7, atol=1e-9)
    assert float(d8.div_norm) < 1e-6


def test_sharded_state_layout():
    m = _model("shell")
    mesh = build_mesh(m.geo)
    s = shard_state(m.initial_state(), m.geo, mesh)
    # T sharded over (lat, lon); vertical replicated
    spec = s.T.sharding.spec
    assert spec == P(None, "lat", "lon")
    assert s.u.sharding.spec == P(None, None, "lat", "lon")


def test_mimetic_single_vs_eight_devices():
    """The staggered mimetic step is GSPMD-clean: 1-device vs 8-device
    sharded runs agree to reduction-order tolerance (the staggered ops
    are rolls/pads/slices, so the partitioner inserts halo permutes
    exactly as for the collocated stencils)."""
    from dycoreplanet_tpu.models.mimetic import MimeticBoussinesqModel

    p = _model("cuboid").params
    p.numerics.feec_formulation = "staggered"
    m = MimeticBoussinesqModel(p)

    def fn(d, mesh_c):
        z, y, x = mesh_c
        if d == 0:
            return 0.1 * np.sin(2 * np.pi * x) * np.sin(np.pi * z)
        return 0.1 * np.cos(2 * np.pi * x)

    dt = p.time_step
    s1 = m.state_from_faces(m.faces_from_velocity(fn))
    s1_0 = s1
    for _ in range(3):
        s1, d1 = m.step(s1, dt)

    mesh = build_mesh(m.geo)
    s8 = shard_state(s1_0, m.geo, mesh)
    sh = state_sharding(m.geo, mesh)
    rep = NamedSharding(mesh, P())
    step8 = jax.jit(
        m._step_impl, in_shardings=(sh, rep), out_shardings=(sh, rep),
    )
    for _ in range(3):
        s8, _ = step8(s8, dt)

    np.testing.assert_allclose(np.asarray(s8.u), np.asarray(s1.u),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(s8.T), np.asarray(s1.T),
                               rtol=1e-9, atol=1e-11)
    for a, b in zip(s8.u_faces, s1.u_faces):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-11)
