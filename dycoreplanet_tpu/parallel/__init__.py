from dycoreplanet_tpu.parallel.mesh import (  # noqa: F401
    build_mesh,
    shard_state,
    state_sharding,
)
