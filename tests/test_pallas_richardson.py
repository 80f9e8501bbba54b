"""Equivalence of the fused Richardson Pallas kernel
(ops/pallas_richardson.py) against the jnp fast path it replaces:
solvers/fixed.richardson_solve over st.weak_laplacian plus the
faces_div projection head, exactly as
BoussinesqModel._solve_momentum_projection / _solve_temperature_system
/ _project_velocity call them. Interpret mode (runs on CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from dycoreplanet_tpu.base.params import Parameters  # noqa: E402
from dycoreplanet_tpu.models import BoussinesqModel  # noqa: E402
from dycoreplanet_tpu.ops import stencil as st  # noqa: E402
from dycoreplanet_tpu.ops.pallas_richardson import (  # noqa: E402
    HelmholtzRichardsonPallas, make_richardson)
from dycoreplanet_tpu.solvers.fixed import richardson_solve  # noqa: E402


def _shell_model(nr=8, nlat=16, nlon=32, iters=2, iters_u=0):
    p = Parameters.from_text("")
    p.space_dimension = 3
    p.numerics.dtype = "float32"
    p.numerics.n_radial, p.numerics.n_lat, p.numerics.n_lon = nr, nlat, nlon
    p.numerics.fixed_solver_iters = iters
    p.numerics.momentum_fixed_iters = iters_u
    return BoussinesqModel(p)


def _rand_state(model, seed=3):
    rng = np.random.RandomState(seed)
    shp = model.geo.cell_shape
    rhs_u = jnp.asarray(rng.randn(3, *shp), jnp.float32)
    rhs_T = jnp.asarray(rng.randn(*shp), jnp.float32)
    T0 = jnp.asarray(rng.randn(*shp), jnp.float32)
    return rhs_u, rhs_T, T0


def _oracle(model, rhs_u, rhs_T, T0, dt):
    """The jnp fast path: both Richardson solves + the faces_div /
    Poisson-RHS block of _project_velocity."""
    geo = model.geo
    p = model.params
    vol = jnp.asarray(model.vol, rhs_u.dtype)
    coef = dt * model.one_over_Re
    kT = (dt / p.NSE_solver_interval) * model.one_over_Pe

    def helm_op(x):
        return vol[None] * x - coef * jnp.stack([
            st.weak_laplacian(geo, x[c], model.u_specs[c])
            for c in range(3)])

    helm_diag = vol[None] + coef * jnp.asarray(model.helm_diags,
                                               rhs_u.dtype)
    res_u = richardson_solve(helm_op, vol[None] * rhs_u, rhs_u,
                             diag=helm_diag,
                             iters=model.momentum_iters,
                             rtol=p.numerics.helmholtz_tol)

    def temp_op(x):
        return vol * x - kT * st.weak_laplacian(geo, x, model.T_specs_hom)

    diag_T = vol + kT * jnp.asarray(model.T_diag, rhs_T.dtype)
    res_T = richardson_solve(temp_op, rhs_T, T0, diag=diag_T,
                             iters=p.numerics.fixed_solver_iters,
                             rtol=p.numerics.temperature_tol)
    # projection head (the non-prefused block of _project_velocity)
    uf_star = [
        model._apply_wall_face_values(
            model._interp_component_to_faces(res_u.x[c], c), c)
        for c in range(3)
    ]
    div_star = st.divergence(geo, uf_star)
    rhs_phi = -vol * div_star / dt
    rhs_phi = rhs_phi - jnp.mean(rhs_phi)
    return res_u, res_T, uf_star, rhs_phi


def _check_all(model, kern, seed=3, dt=np.float32(0.004),
               rtol=2e-6, atol=2e-6):
    rhs_u, rhs_T, T0 = _rand_state(model, seed=seed)
    u_star, T_new, pre, (rn_u, bn_u, rn_T, bn_T) = kern(
        rhs_u, rhs_T, T0, dt)
    res_u, res_T, uf_star, rhs_phi = _oracle(model, rhs_u, rhs_T, T0, dt)
    np.testing.assert_allclose(np.asarray(u_star), np.asarray(res_u.x),
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(T_new), np.asarray(res_T.x),
                               rtol=rtol, atol=atol)
    for d in range(3):
        np.testing.assert_allclose(np.asarray(pre[d]),
                                   np.asarray(uf_star[d]),
                                   rtol=rtol, atol=atol)
    # rhs = -vol*div/dt amplifies the u* difference by vol/(h*dt); use
    # an atol scaled to the field
    scale = float(jnp.max(jnp.abs(rhs_phi))) + 1e-30
    np.testing.assert_allclose(np.asarray(pre[3]), np.asarray(rhs_phi),
                               rtol=1e-4, atol=2e-5 * scale)
    return (rn_u, bn_u, rn_T, bn_T), (res_u, res_T)


@pytest.mark.parametrize("iters", [1, 2, 3])
def test_matches_jnp_richardson(iters):
    model = _shell_model(iters=iters)
    kern = make_richardson(model.geo, model, interpret=True, use_pallas=True)
    assert kern is not None
    assert kern.iters_u == iters and kern.iters_T == iters
    (rn_u, bn_u, rn_T, bn_T), (res_u, res_T) = _check_all(model, kern)
    # tracked residuals: near convergence these sit at (or below, for
    # the exactly-tracked recurrence) the f32 noise floor eps*||b||, and
    # reassociated arithmetic shifts them by the same order — the jnp
    # oracle's own tracked value drifts from the recomputed true
    # residual by MORE than the kernel's. Symmetric 2x-or-noise bound.
    for rn, oracle_rn, bn in ((rn_u, res_u.residual_norm, bn_u),
                              (rn_T, res_T.residual_norm, bn_T)):
        rn, oracle_rn, bn = float(rn), float(oracle_rn), float(bn)
        noise = 3e-6 * bn
        assert rn <= max(2.0 * oracle_rn, noise)
        assert oracle_rn <= max(2.0 * rn, noise)


def test_mixed_iteration_counts():
    """iters_u=1 / iters_T=2 — the production opt-in (momentum fixed
    iters = 1): common iteration jointly, surplus on T alone."""
    model = _shell_model(iters=2, iters_u=1)
    assert model.momentum_iters == 1
    kern = make_richardson(model.geo, model, interpret=True, use_pallas=True)
    assert kern is not None
    assert kern.iters_u == 1 and kern.iters_T == 2
    _check_all(model, kern, seed=7)


def test_mixed_iteration_counts_u_heavy():
    """iters_u > iters_T exercises the momentum-only surplus branch."""
    model = _shell_model(iters=1, iters_u=3)
    kern = make_richardson(model.geo, model, interpret=True, use_pallas=True)
    assert kern is not None
    assert kern.iters_u == 3 and kern.iters_T == 1
    _check_all(model, kern, seed=9)


def test_blocked_grid_matches_single_block():
    """nr=16 with blk=8 exercises the deep radial halos across a real
    block seam; the answer must match the jnp oracle there too."""
    model = _shell_model(nr=16, nlat=8, nlon=16)
    kern = make_richardson(model.geo, model, interpret=True, use_pallas=True)
    assert kern is not None and kern.nb == 2
    _check_all(model, kern, seed=11, dt=np.float32(0.002))


def test_factory_gates():
    model = _shell_model()
    # multi-device -> None (GSPMD cannot partition a pallas_call)
    assert make_richardson(model.geo, model, n_devices=2,
                           use_pallas=True) is None
    # CG-only config -> None
    model.params.numerics.fixed_solver_iters = 0
    assert make_richardson(model.geo, model, interpret=True,
                           use_pallas=True) is None


def test_model_step_uses_kernel_and_matches():
    """Full _step_impl with the fused Richardson kernel vs without:
    trajectories must agree to f32 roundoff."""
    model = _shell_model(nr=8, nlat=16, nlon=32)
    model_k = _shell_model(nr=8, nlat=16, nlon=32)
    model_k.enable_pallas_richardson(interpret=True)
    assert model_k._richardson_pallas is not None
    dt = np.float32(0.002)
    s0 = model.initial_state()
    rng = np.random.RandomState(5)
    u = jnp.asarray(0.05 * rng.randn(3, *model.geo.cell_shape), jnp.float32)
    faces = tuple(model._apply_wall_face_values(
        model._interp_component_to_faces(u[c], c), c) for c in range(3))
    s0 = s0._replace(u=u, u_faces=faces)
    sa, sb = s0, s0
    for _ in range(3):
        sa, da = model.step(sa, dt)
        sb, db = model_k.step(sb, dt)
    np.testing.assert_allclose(np.asarray(sb.u), np.asarray(sa.u),
                               rtol=5e-5, atol=5e-6)
    np.testing.assert_allclose(np.asarray(sb.T), np.asarray(sa.T),
                               rtol=5e-5, atol=5e-6)
    assert bool(da.solver_ok) == bool(db.solver_ok)


def test_residual_free_variant_bitwise_identical():
    """track_residual=False (the `residual check interval` fast
    variant): iterates, faces, and Poisson RHS equal the tracking
    kernel's (same math; only the residual applies are skipped and the
    ghost depth drops by one); norms return the -1 sentinel."""
    model = _shell_model(iters=2, iters_u=1)
    k_trk = make_richardson(model.geo, model, interpret=True,
                            use_pallas=True)
    k_fst = make_richardson(model.geo, model, interpret=True,
                            use_pallas=True, track_residual=False)
    assert k_fst.H == k_trk.H - 1
    rhs_u, rhs_T, T0 = _rand_state(model)
    dt = np.float32(0.004)
    a = k_trk(rhs_u, rhs_T, T0, dt)
    b = k_fst(rhs_u, rhs_T, T0, dt)
    # identical math; XLA may fuse/reassociate differently for the two
    # ghost shapes, so pin at f32-reassociation tightness
    for x, y in zip((a[0], a[1]) + tuple(a[2]), (b[0], b[1]) + tuple(b[2])):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-6)
    rn_u, bn_u, rn_T, bn_T = b[3]
    assert float(rn_u) == -1.0 and float(rn_T) == -1.0  # sentinel
    assert float(bn_u) == float(a[3][1]) and float(bn_T) == float(a[3][3])


def test_residual_check_interval_step_semantics():
    """`residual check interval = 4`: trajectory bitwise equal to
    interval=1 to f32 reassociation; residual diagnostics carry the real tracked value on
    check steps and the -1 sentinel (with solver_ok=True) in between."""
    m1 = _shell_model(iters=2, iters_u=1)
    m4 = _shell_model(iters=2, iters_u=1)
    m4.params.numerics.residual_check_interval = 4
    m1.enable_pallas_richardson(interpret=True)
    m4.enable_pallas_richardson(interpret=True)
    assert m1._richardson_fast is None
    assert m4._richardson_fast is not None
    dt = np.float32(0.002)
    s0 = m1.initial_state()
    rng = np.random.RandomState(5)
    u = jnp.asarray(0.05 * rng.randn(3, *m1.geo.cell_shape), jnp.float32)
    faces = tuple(m1._apply_wall_face_values(
        m1._interp_component_to_faces(u[c], c), c) for c in range(3))
    s0 = s0._replace(u=u, u_faces=faces)
    sa, sb = s0, s0
    for i in range(5):
        sa, da = m1.step(sa, dt)
        sb, db = m4.step(sb, dt)
        np.testing.assert_allclose(np.asarray(sb.u), np.asarray(sa.u),
                                   rtol=5e-5, atol=5e-6)
        np.testing.assert_allclose(np.asarray(sb.T), np.asarray(sa.T),
                                   rtol=5e-5, atol=5e-6)
        assert bool(db.solver_ok)
        if i % 4 == 0:  # step_number 0, 4: checked
            assert float(db.helmholtz_residual) >= 0.0
            assert float(db.temperature_residual) >= 0.0
            # both values sit at the f32 reassociation floor (~1e-16
            # relative), where kernel-variant rounding differences
            # show up at the percent level
            np.testing.assert_allclose(
                float(db.helmholtz_residual),
                float(da.helmholtz_residual), rtol=5e-2)
        else:           # in between: the "unchecked" sentinel
            assert float(db.helmholtz_residual) == -1.0
            assert float(db.temperature_residual) == -1.0
