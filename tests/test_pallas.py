"""Pallas kernel tests (interpret mode on CPU) against the jnp
reference implementations — the kernel-vs-reference strategy of
SURVEY.md §7.2 item 3."""

import jax.numpy as jnp
import numpy as np
import pytest

from dycoreplanet_tpu.ops.pallas_kernels import tridiag_pallas
from dycoreplanet_tpu.solvers.tridiag import thomas_solve


def _random_spd_tridiag(rng, n, batch):
    lower = -rng.rand(n, *batch)
    upper = -rng.rand(n, *batch)
    lower[0] = 0.0
    upper[-1] = 0.0
    diag = -(lower + upper) + 1.0 + rng.rand(n, *batch)
    return (jnp.asarray(lower), jnp.asarray(diag), jnp.asarray(upper))


@pytest.mark.parametrize("n,batch", [(8, (4,)), (32, (16, 10)), (5, (1,)), (16, (130,))])
def test_pallas_matches_thomas(n, batch):
    rng = np.random.RandomState(0)
    lower, diag, upper = _random_spd_tridiag(rng, n, batch)
    rhs = jnp.asarray(rng.randn(n, *batch))
    x_ref = thomas_solve(lower, diag, upper, rhs)
    x_pl = tridiag_pallas(lower, diag, upper, rhs, interpret=True)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_ref),
                               rtol=1e-12, atol=1e-12)


def test_thomas_against_dense():
    rng = np.random.RandomState(1)
    n = 12
    lower, diag, upper = _random_spd_tridiag(rng, n, (1,))
    rhs = jnp.asarray(rng.randn(n, 1))
    x = thomas_solve(lower, diag, upper, rhs)
    A = np.zeros((n, n))
    for i in range(n):
        A[i, i] = float(diag[i, 0])
        if i > 0:
            A[i, i - 1] = float(lower[i, 0])
        if i < n - 1:
            A[i, i + 1] = float(upper[i, 0])
    expect = np.linalg.solve(A, np.asarray(rhs)[:, 0])
    np.testing.assert_allclose(np.asarray(x)[:, 0], expect, rtol=1e-10)
