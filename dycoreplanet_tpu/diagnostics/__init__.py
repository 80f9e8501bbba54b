from dycoreplanet_tpu.diagnostics.timers import Timer, TimerRegistry  # noqa: F401
