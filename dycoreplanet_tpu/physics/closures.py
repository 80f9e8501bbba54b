"""Pointwise physics closures: gravity, Coriolis, rotation matrices.

JAX re-expression of the reference's TensorFunction closures
(reference: include/model_data/core_model_data.tpp:86-118 and
source/model_data/core_model_data.cc). All functions operate on
coordinate arrays of shape (..., dim) or on per-component arrays and are
jit/vmap-friendly (pure, shape-static).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp


def vertical_gravity_vector(p: jnp.ndarray, gravity_constant: float) -> jnp.ndarray:
    """-g * e_z for the cuboid geometry
    (reference: core_model_data.tpp:86-95). ``p``: (..., dim)."""
    g = jnp.zeros_like(p)
    return g.at[..., -1].set(-gravity_constant)


def gravity_vector(p: jnp.ndarray, gravity_constant: float) -> jnp.ndarray:
    """Radial gravity of the shell geometry
    (reference: core_model_data.tpp:97-106):
        r > 1:  -g * p / r
        r <= 1: -g * p / sqrt(r)
    ``p``: (..., dim) nondimensional coordinates (mesh prescaled by 1/L_ref)."""
    r = jnp.linalg.norm(p, axis=-1, keepdims=True)
    safe_r = jnp.where(r > 0, r, 1.0)
    scale = jnp.where(r > 1.0, 1.0 / safe_r, 1.0 / jnp.sqrt(safe_r))
    return -gravity_constant * p * scale


def radial_gravity_scalar(r: jnp.ndarray, gravity_constant: float) -> jnp.ndarray:
    """Signed magnitude of the radial gravity (component along +e_r):
    g_r(r) = -g for r>1, -g*sqrt(r) ... precisely -g*r/r = -g (r>1) and
    -g*r/sqrt(r) = -g*sqrt(r) (r<=1). Used on staggered radial faces where
    only the radial component is needed."""
    return jnp.where(r > 1.0, -gravity_constant, -gravity_constant * jnp.sqrt(r))


def coriolis_vector(dim: int, omega: float) -> jnp.ndarray:
    """Omega * e_z (constant; reference: core_model_data.tpp:109-118)."""
    z = [0.0] * dim
    z[-1] = omega
    return jnp.asarray(z)


def euler_rotation_matrix(alpha: float, beta: float, gamma: float) -> jnp.ndarray:
    """3x3 Euler-angle rotation used by the reference's tangential
    boundary function and (optionally) the 3D temperature IC
    (reference: core_model_data.tpp:9-32, boussinesq_model_data.tpp:75-90)."""
    ca, sa = math.cos(alpha), math.sin(alpha)
    cb, sb = math.cos(beta), math.sin(beta)
    cg, sg = math.cos(gamma), math.sin(gamma)
    return jnp.asarray(
        [
            [ca * cg - sa * cb * sg, -ca * sg - sa * cb * cg, sa * sb],
            [sa * cg + ca * cb * sg, -sa * sg + ca * cb * cg, -ca * sb],
            [sb * sg, sb * cg, cb],
        ]
    )


def rotation_matrix_2d(alpha: float) -> jnp.ndarray:
    """2D rotation (reference: boussinesq_model_data.tpp:26-32)."""
    c, s = math.cos(alpha), math.sin(alpha)
    return jnp.asarray([[c, -s], [s, c]])


def tangential_function(p: jnp.ndarray, scale_factor: float,
                        rotation: jnp.ndarray) -> jnp.ndarray:
    """scale * (R @ p) — reference TangentialFunction
    (core_model_data.tpp:34-41)."""
    return scale_factor * jnp.einsum("ij,...j->...i", rotation, p)


def radial_function(p: jnp.ndarray, scale_factor: float) -> jnp.ndarray:
    """scale * p — reference RadialFunction (core_model_data.tpp:60-72)."""
    return scale_factor * p


def cross_product_2d(v: jnp.ndarray) -> jnp.ndarray:
    """deal.II cross_product_2d: v -> (v_y, -v_x). Used in the 2D Coriolis
    term (reference: boussinesq_model.tpp:663-667)."""
    return jnp.stack([v[..., 1], -v[..., 0]], axis=-1)


def coriolis_acceleration_2d(u: jnp.ndarray) -> jnp.ndarray:
    """The reference's 2D "Coriolis" RHS contribution per unit dt:
    +2 * cross_product_2d(u_old) (sign folded from
    boussinesq_model.tpp:660-667: rhs -= dt * (-2 phi·cross2d(u))).
    Note the reference applies no Omega factor in 2D (SURVEY.md §7.5);
    we reproduce it under the 'reference' coriolis mode."""
    return 2.0 * cross_product_2d(u)


def coriolis_acceleration_3d(u: jnp.ndarray, omega_hat: Tuple[float, float, float]) -> jnp.ndarray:
    """-2 Omega x u with Omega the *nondimensional* rotation vector
    (reference folds (L/u_ref) into it: boussinesq_model.tpp:616-621).
    Returns the acceleration to ADD to du/dt."""
    om = jnp.asarray(omega_hat)
    return -2.0 * jnp.cross(jnp.broadcast_to(om, u.shape), u)
