from nafwebsod_tpu.solver.sgd import (  # noqa: F401
    SGDHyperParams,
    freeze_mults,
    init_state,
    momentum_correction_factor,
    param_multipliers,
    scale_momentum,
    update,
)
