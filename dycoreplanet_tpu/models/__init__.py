from dycoreplanet_tpu.models.boussinesq import BoussinesqModel, State, StepDiagnostics  # noqa: F401
