"""Unit tests for the matrix-free linear_algebra compositions
(reference: include/linear_algebra/*.hpp, SURVEY.md section 2)."""

import jax.numpy as jnp
import numpy as np

from dycoreplanet_tpu import linear_algebra as la


def _spd(rng, n, shift=2.0):
    A = rng.randn(n, n) / np.sqrt(n)
    return jnp.asarray(A @ A.T + shift * np.eye(n))


def test_inverse_operator_full_solve():
    rng = np.random.RandomState(0)
    A = _spd(rng, 24)
    b = jnp.asarray(rng.randn(24))
    A_inv = la.inverse_operator(lambda x: A @ x, rtol=1e-12, maxiter=200)
    np.testing.assert_allclose(np.asarray(A_inv(b)),
                               np.linalg.solve(np.asarray(A), np.asarray(b)),
                               rtol=1e-8)


def test_approximate_inverse_truncates():
    rng = np.random.RandomState(1)
    A = _spd(rng, 24)
    b = jnp.asarray(rng.randn(24))
    A_apx = la.approximate_inverse(lambda x: A @ x, n_iter=3)
    x = np.asarray(A_apx(b))
    exact = np.linalg.solve(np.asarray(A), np.asarray(b))
    # not converged, but a genuine Krylov improvement over zero
    assert 0 < np.linalg.norm(x - exact) < np.linalg.norm(exact)


def test_schur_complement_matches_dense():
    rng = np.random.RandomState(2)
    n, m = 20, 8
    A = _spd(rng, n)
    Bm = jnp.asarray(rng.randn(m, n))
    A_inv = la.inverse_operator(lambda x: A @ x, rtol=1e-13, maxiter=200)
    S = la.schur_complement(lambda v: Bm @ v, A_inv, lambda p: Bm.T @ p)
    p = jnp.asarray(rng.randn(m))
    expect = np.asarray(Bm) @ np.linalg.solve(
        np.asarray(A), np.asarray(Bm.T) @ np.asarray(p))
    np.testing.assert_allclose(np.asarray(S(p)), expect, rtol=1e-7)


def test_shifted_schur_complement():
    rng = np.random.RandomState(3)
    n = 16
    M11 = _spd(rng, n)
    Mw = _spd(rng, n)
    B10 = jnp.asarray(rng.randn(n, n) / 4)
    B01 = jnp.asarray(rng.randn(n, n) / 4)
    Mw_inv = la.inverse_operator(lambda x: Mw @ x, rtol=1e-13, maxiter=200)
    S = la.shifted_schur_complement(
        lambda x: M11 @ x, lambda x: B10 @ x, Mw_inv, lambda x: B01 @ x)
    x = jnp.asarray(rng.randn(n))
    expect = (np.asarray(M11) @ np.asarray(x)
              - np.asarray(B10) @ np.linalg.solve(
                  np.asarray(Mw), np.asarray(B01) @ np.asarray(x)))
    np.testing.assert_allclose(np.asarray(S(x)), expect, rtol=1e-7)


def test_zero_mean_projection():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(12))
    w = jnp.asarray(rng.rand(12) + 0.5)
    plain = la.zero_mean()(x)
    assert abs(float(jnp.mean(plain))) < 1e-14
    weighted = la.zero_mean(w)(x)
    assert abs(float((weighted * w).sum())) < 1e-12
    # projection is idempotent
    np.testing.assert_allclose(np.asarray(la.zero_mean(w)(weighted)),
                               np.asarray(weighted))


def test_nested_schur_projects_nullspace():
    rng = np.random.RandomState(5)
    n, m = 18, 6
    Sw = _spd(rng, n)
    Bm = jnp.asarray(rng.randn(m, n))
    Sw_inv = la.inverse_operator(lambda x: Sw @ x, rtol=1e-13, maxiter=200)
    N = la.nested_schur_complement(lambda v: Bm @ v, Sw_inv,
                                   lambda p: Bm.T @ p)
    p = jnp.asarray(rng.randn(m))
    out = np.asarray(N(p))
    assert abs(out.mean()) < 1e-12
