from dycoreplanet_tpu.physics import closures, initial_data  # noqa: F401
