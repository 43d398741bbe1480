from gb25_tpu.data.datasets import (  # noqa: F401
    regrid_bathymetry,
    climatology_restoring,
    initial_state_from_climatology,
    linearly_tapered_polar_mask,
    file_prescribed_atmosphere,
)
