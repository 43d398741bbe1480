from gb25_tpu.models.config import (  # noqa: F401
    HydrostaticConfig,
    ExplicitFreeSurface,
    SplitExplicitFreeSurface,
    VerticalScalarDiffusivity,
    HorizontalScalarDiffusivity,
    EARTH_ROTATION_RATE,
)
from gb25_tpu.models.state import HydrostaticState, initial_state  # noqa: F401
from gb25_tpu.models.hydrostatic import time_step, loop, compute_tendencies  # noqa: F401
from gb25_tpu.models.baroclinic import (  # noqa: F401
    baroclinic_instability_model,
    baroclinic_instability_config,
    baroclinic_instability_state,
)
