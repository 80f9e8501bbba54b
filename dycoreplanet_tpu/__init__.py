"""dycoreplanet_tpu — a TPU-native 3D dynamical-core framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the
deal.II/Trilinos/MPI reference "3D-DyCorePlanet" (AquaPlanet): a rotating
buoyancy Boussinesq system (incompressible Navier-Stokes + Coriolis +
temperature-driven buoyancy) on a spherical shell or periodic cuboid,
advanced with a semi-implicit (IMEX) Euler scheme.

Design (TPU-first, not a port):
  * structured staggered finite-volume grids (polar annulus, Cartesian
    cuboid, spherical shell) instead of unstructured FEM meshes
    (reference: include/core/planet_geometry.tpp).
  * pressure projection with matrix-free CG / FFT-diagonalized direct
    solvers instead of Schur-complement saddle-point Krylov onions
    (reference: include/linear_algebra/*.hpp).
  * SPMD domain decomposition over a jax.sharding.Mesh with XLA
    collectives instead of MPI/p4est/Trilinos
    (reference: MPI usage documented in SURVEY.md §5).

Layers (mirrors SURVEY.md §7.2):
  base/        config dataclasses + .prm parser + dimensionless numbers
  physics/     closures (density, gravity, Coriolis) and initial data
  grid/        structured grids, metrics, staggering
  ops/         stencil operators (jnp reference + Pallas kernels)
  solvers/     matrix-free CG / Chebyshev / multigrid / direct spectral
  models/      BoussinesqModel time steppers (standard + mimetic)
  parallel/    device mesh, shardings, halo exchange
  io/          VTK output, checkpointing
  diagnostics/ timers, per-step scalar diagnostics
  cli/         `python -m dycoreplanet_tpu -p file.prm`
"""

__version__ = "0.1.0"

from dycoreplanet_tpu.base.params import Parameters  # noqa: F401
