from dycoreplanet_tpu.models.boussinesq import BoussinesqModel, State, StepDiagnostics  # noqa: F401


def make_model(params, geometry=None):
    """Model dispatch (the reference's dim x use_FEEC_solver dispatch,
    source/main.cxx:92-125, extended by the `feec formulation` knob):
    FEEC + staggered -> the mimetic C-grid model (models/mimetic.py),
    everything else -> BoussinesqModel (whose FEEC personality runs the
    rotational form + coupled 3x3 solve)."""
    if (params.use_FEEC_solver
            and params.numerics.feec_formulation == "staggered"):
        from dycoreplanet_tpu.models.mimetic import MimeticBoussinesqModel

        return MimeticBoussinesqModel(params, geometry)
    return BoussinesqModel(params, geometry)
