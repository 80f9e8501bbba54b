"""Exact discrete de Rham identities (ops/mimetic.py) — the
structure-preservation property the reference's FEEC elements provide
(SURVEY.md section 7.1 item 4: exact discrete div/curl identities)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dycoreplanet_tpu.grid import factory
from dycoreplanet_tpu.ops.mimetic import curl_faces, div_cells, grad_edges


@pytest.fixture(params=["cuboid", "annulus", "shell"])
def geo(request):
    if request.param == "cuboid":
        return factory.make_cuboid(8, 8, 8, length_ref=1.0)
    if request.param == "annulus":
        return factory.make_annulus(8, 16, 1.0, 2.0)
    return factory.make_shell(4, 8, 16, 1.0, 3.0)


def test_curl_grad_vanishes_to_roundoff(geo):
    """Exact in exact arithmetic; in floats the two difference paths
    associate differently, leaving pure roundoff (~eps * |f|)."""
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.randn(*geo.cell_shape))
    e = grad_edges(geo, f)
    c = curl_faces(geo, e)
    comps = (c,) if geo.dim == 2 else c
    tol = 16 * np.finfo(np.asarray(f).dtype).eps * float(jnp.max(jnp.abs(f)))
    for comp in comps:
        assert float(jnp.max(jnp.abs(comp))) <= tol


def test_curl_grad_bitwise_zero_on_integers(geo):
    """With integer-valued node data every difference is exact, so the
    identity really is bitwise zero — the combinatorial exactness."""
    rng = np.random.RandomState(3)
    f = jnp.asarray(rng.randint(-100, 100, geo.cell_shape).astype(float))
    c = curl_faces(geo, grad_edges(geo, f))
    comps = (c,) if geo.dim == 2 else c
    for comp in comps:
        assert float(jnp.max(jnp.abs(comp))) == 0.0


def test_div_curl_vanishes(geo):
    if geo.dim == 2:
        pytest.skip("div(curl) needs 3 dimensions")
    rng = np.random.RandomState(1)
    e = tuple(jnp.asarray(rng.randn(*geo.cell_shape)) for _ in range(3))
    F = curl_faces(geo, e)
    d = div_cells(geo, F)
    tol = 64 * np.finfo(np.asarray(d).dtype).eps * max(
        float(jnp.max(jnp.abs(Fi))) for Fi in F)
    assert float(jnp.max(jnp.abs(d))) <= tol
    # and bitwise on integers
    ei = tuple(jnp.asarray(rng.randint(-50, 50, geo.cell_shape).astype(float))
               for _ in range(3))
    di = div_cells(geo, curl_faces(geo, ei))
    assert float(jnp.max(jnp.abs(di))) == 0.0


def test_adjoint_div_of_gradient_is_7point_laplacian():
    """grad (coboundary 0->1) composed with the ADJOINT divergence
    (backward difference, the codifferential) gives the classic 7-point
    Laplacian — the div*grad = Delta structure the solvers rely on.
    (div_cells itself is the coboundary 2->3; composing two coboundaries
    directly is only meaningful through a Hodge star.)"""
    geo = factory.make_cuboid(8, 8, 8, length_ref=1.0)
    rng = np.random.RandomState(2)
    fn = rng.randn(*geo.cell_shape)
    e = [np.asarray(x) for x in grad_edges(geo, jnp.asarray(fn))]
    lap = sum(ed - np.roll(ed, 1, axis=d) for d, ed in enumerate(e))
    i, j, k = 4, 4, 4
    expect = (fn[i + 1, j, k] + fn[i - 1, j, k] + fn[i, j + 1, k]
              + fn[i, j - 1, k] + fn[i, j, k + 1] + fn[i, j, k - 1]
              - 6 * fn[i, j, k])
    np.testing.assert_allclose(lap[i, j, k], expect, rtol=1e-12)
