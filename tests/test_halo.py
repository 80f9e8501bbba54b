"""Explicit shard_map halo exchange vs the global (roll/pad) reference
on the 8-device CPU mesh — the manual-collective counterpart of the
GSPMD sharding tests (generalizes the reference's ghost-dof exchange,
boussinesq_model.tpp:244-251, 736-737)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from dycoreplanet_tpu.parallel.halo import exchange_ghosts, halo_pad, \
    shard_interior_then_halo


def _mesh_1d():
    return Mesh(np.array(jax.devices()[:8]), ("x",))


def test_halo_pad_periodic_matches_roll():
    mesh = _mesh_1d()
    x = jnp.arange(64.0).reshape(64, 1) * jnp.ones((64, 3))

    f = shard_map(
        lambda s: halo_pad(s, "x", 0, width=1, periodic=True),
        mesh=mesh, in_specs=P("x", None), out_specs=P("x", None))
    padded = np.asarray(f(x)).reshape(8, 10, 3)  # 8 shards of 8+2 rows

    xs = np.asarray(x).reshape(8, 8, 3)
    for s in range(8):
        np.testing.assert_array_equal(padded[s, 0], xs[(s - 1) % 8, -1])
        np.testing.assert_array_equal(padded[s, 1:9], xs[s])
        np.testing.assert_array_equal(padded[s, 9], xs[(s + 1) % 8, 0])


def test_halo_nonperiodic_boundary_zeros():
    mesh = _mesh_1d()
    x = jnp.ones((32, 2))

    def body(s):
        lo, hi = exchange_ghosts(s, "x", 0, width=1, periodic=False)
        return jnp.concatenate([lo, hi], axis=0)

    f = shard_map(body, mesh=mesh, in_specs=P("x", None),
                  out_specs=P("x", None))
    out = np.asarray(f(x)).reshape(8, 2, 2)
    np.testing.assert_array_equal(out[0, 0], 0.0)   # no left neighbor
    np.testing.assert_array_equal(out[-1, 1], 0.0)  # no right neighbor
    assert np.all(out[1:, 0] == 1.0)
    assert np.all(out[:-1, 1] == 1.0)


def test_sharded_stencil_matches_global():
    """Periodic [1, -2, 1] stencil computed (a) globally with jnp.roll
    and (b) via shard_map + explicit halo exchange: identical."""
    mesh = _mesh_1d()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 5))

    expect = np.asarray(jnp.roll(x, 1, 0) - 2 * x + jnp.roll(x, -1, 0))

    def body(s):
        p = halo_pad(s, "x", 0, width=1, periodic=True)
        return p[:-2] - 2 * p[1:-1] + p[2:]

    f = jax.jit(shard_map(body, mesh=mesh, in_specs=P("x", None),
                          out_specs=P("x", None)))
    np.testing.assert_allclose(np.asarray(f(x)), expect, rtol=0, atol=0)


def test_overlap_pattern_equivalence():
    """interior+boundary split equals the monolithic stencil."""
    mesh = _mesh_1d()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(64, 4))

    def interior(s):
        out = jnp.zeros_like(s)
        return out.at[1:-1].set(s[:-2] - 2 * s[1:-1] + s[2:])

    def boundary(p):
        # contributions only for the first and last owned rows
        core = p[1:-1]
        out = jnp.zeros_like(core)
        out = out.at[0].set(p[0] - 2 * p[1] + p[2])
        out = out.at[-1].set(p[-3] - 2 * p[-2] + p[-1])
        return out

    def body(s):
        return shard_interior_then_halo(s, "x", 0, interior, boundary,
                                        width=1, periodic=True)

    f = jax.jit(shard_map(body, mesh=mesh, in_specs=P("x", None),
                          out_specs=P("x", None)))
    expect = np.asarray(jnp.roll(x, 1, 0) - 2 * x + jnp.roll(x, -1, 0))
    np.testing.assert_allclose(np.asarray(f(x)), expect, rtol=0, atol=1e-12)
