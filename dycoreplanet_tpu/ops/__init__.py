from dycoreplanet_tpu.ops.bc import BC, BCSpec  # noqa: F401
from dycoreplanet_tpu.ops import stencil  # noqa: F401
