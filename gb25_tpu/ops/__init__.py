from gb25_tpu.ops import stencils  # noqa: F401
from gb25_tpu.ops.halos import extend_field, extend_field_xy, extend_axis, ghost_blocks  # noqa: F401
from gb25_tpu.ops.weno import weno5, weno5_upwind, centered2, upwind1  # noqa: F401
from gb25_tpu.ops.eos import (  # noqa: F401
    TEOS10EquationOfState,
    LinearEquationOfState,
    rho_teos10,
    rho_anomaly_teos10,
    rho_vertical_reference,
)
from gb25_tpu.ops.operators import (  # noqa: F401
    horizontal_divergence,
    vertical_vorticity,
    kinetic_energy,
    diagnose_w,
    hydrostatic_pressure,
    barotropic_transport,
    coriolis_ff,
)
