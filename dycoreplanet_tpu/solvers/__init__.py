from dycoreplanet_tpu.solvers.cg import cg, CGResult  # noqa: F401
