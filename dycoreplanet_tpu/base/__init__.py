from dycoreplanet_tpu.base import nondim, params, prm  # noqa: F401
