from dycoreplanet_tpu.solvers.cg import cg, CGResult  # noqa: F401
from dycoreplanet_tpu.solvers.fixed import richardson_solve  # noqa: F401
